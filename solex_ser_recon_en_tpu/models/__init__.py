"""End-to-end jitted "models": the SHG reconstruction step and analyser."""

from .shg import shg_forward, example_inputs  # noqa: F401
