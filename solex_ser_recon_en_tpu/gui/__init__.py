"""GUI front end (reference: UI_handler.py / SHG_MAIN.py GUI loop).

The window layer needs FreeSimpleGUI (gated import — absent in headless
installs); the form-validation logic is framework-agnostic and tested.
"""

from .form import interpret_form_values, default_form_values  # noqa: F401
