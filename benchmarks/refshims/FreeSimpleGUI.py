"""FreeSimpleGUI shim: the repo's FreeSimpleGUI-compatible tkinter backend
(solex_ser_recon_en_tpu/gui/fsg_tk.py), loaded jax-free by file path."""
from _load import load

_fsg = load("solex_ser_recon_en_tpu/gui/fsg_tk.py", "_repo_fsg_tk")

globals().update({k: v for k, v in vars(_fsg).items()
                  if not k.startswith("__")})


def __getattr__(name):
    return getattr(_fsg, name)
