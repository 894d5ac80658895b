"""Per-run text log.

reference: solex_util.py:29-54 (clearlog / logme / write_complete) — a
``<base>_log.txt`` next to the outputs recording start/end time and the
scientifically meaningful diagnostics (shifts, dims, y-limits, polynomial
fit, Y/X ratio, tilt, correction matrix, disk position/radius, settings).
"""

from __future__ import annotations

import datetime
import traceback

from ..config import Options, output_path


class RunLog:
    def __init__(self, base: str, options: Options):
        self.path = output_path(base + "_log.txt", options)
        self.enabled = not options._nolog

    def clear(self) -> None:
        if not self.enabled:
            return
        try:
            with open(self.path, "w") as f:
                f.write("start time: " + str(datetime.datetime.now()) + "\n")
        except Exception:
            traceback.print_exc()
            print("ERROR: failed to log file: " + self.path)

    def __call__(self, s: str) -> None:
        if not self.enabled:
            return
        try:
            with open(self.path, "a") as f:
                f.write(s + "\n")
        except Exception:
            traceback.print_exc()
            print("ERROR: failed to log file: " + self.path)

    def complete(self) -> None:
        self("end time: " + str(datetime.datetime.now()))
