"""Command-line front end (reference: SHG_MAIN.py + CLI_handler.py)."""

from .flags import parse_cli, usage, parse_shift_spec  # noqa: F401
from .main import main, handle_files  # noqa: F401
