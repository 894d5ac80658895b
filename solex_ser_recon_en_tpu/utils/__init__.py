"""Utilities: run logs, timers, profiling hooks."""

from .log import RunLog  # noqa: F401
from .timer import StageTimer  # noqa: F401
