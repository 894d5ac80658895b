"""GUI front end (reference: UI_handler.py / SHG_MAIN.py GUI loop).

Self-sufficient down to the display server: the windows run on an
installed FreeSimpleGUI when present, else the in-repo tkinter backend
(`fsg_tk`), and machines with no display server can use the in-repo
pure-Python X11 server (`microx.MicroXServer`) — including headless
screenshots (`MicroXServer.snapshot`, `examples/gui_screenshot.py`) and
wire-level input injection (`microx.XWire`).  The form-validation logic
is framework-agnostic and tested.
"""

from .form import interpret_form_values, default_form_values  # noqa: F401
from .microx import MicroXServer, XWire  # noqa: F401
