"""GUI form-value validation (framework-agnostic, fully testable).

reference: UI_handler.py:20-90 (interpret_UI_values) — the mapping from
window widget values to pipeline options, with the same error messages.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from ..config import Options
from ..cli.flags import parse_shift_spec


def default_form_values(options: Options) -> Dict[str, object]:
    """Widget values representing ``options`` (window construction)."""
    return {
        "_pixel_offset": ",".join(str(s) for s in options.shift),
        "Show graphics": options.flag_display,
        "_y/x_ratio": "" if options.ratio_fixe is None else str(options.ratio_fixe),
        "_tilt": "" if options.slant_fix is None else str(options.slant_fix),
        "_fixed_width": "" if options.fixed_width is None else str(options.fixed_width),
        "_protus_adjustment": str(options.delta_radius),
        "ellipse_fit_shift": str(options.ellipse_fit_shift),
        "Save fits files": options.save_fit,
        "Save clahe.png only": options.clahe_only,
        "Save protus.png only": options.protus_only,
        "Crop square": options.crop_width_square,
        "Correct transversalium lines": options.transversalium,
        "Stubborn transversalium": options.stubborn_transversalium,
        "-trans_strength-": (options.trans_strength - 1) / 100,
        # "deliberately not remembered" (reference README.md:76-77): the
        # window always starts unchecked regardless of the config file
        "Mirror X": False,
        "img_rotate": options.img_rotate,
        "-FILE-": "",
        "output_dir": options.output_dir,
        "input_dir": options.input_dir,
        "Continuous detect mode": options.continuous_detect_mode,
        "de-vignette": options.de_vignette,
    }


def interpret_form_values(
    options: Options, values: Dict[str, object], no_file: bool = False
) -> Optional[List[str]]:
    """Validate widget values into ``options``; returns the input files.

    Raises ValueError with reference-compatible messages on bad input
    (reference: UI_handler.py:20-90).
    """
    try:
        options.shift = parse_shift_spec(str(values["_pixel_offset"]))
        if len(options.shift) == 0:
            raise ValueError(
                "Error: pixel offset input lower bound greater than upper bound!"
            )
    except ValueError as e:
        if "lower bound" in str(e):
            raise
        raise ValueError("invalid pixel offset value!")
    options.flag_display = bool(values["Show graphics"])
    try:
        options.ratio_fixe = (
            float(values["_y/x_ratio"]) if values["_y/x_ratio"] else None
        )
    except ValueError:
        raise ValueError("invalid Y/X ratio value")
    try:
        options.slant_fix = float(values["_tilt"]) if values["_tilt"] else None
    except ValueError:
        raise ValueError("invalid tilt angle value!")
    try:
        options.fixed_width = (
            int(values["_fixed_width"]) if values["_fixed_width"] else None
        )
    except ValueError:
        raise ValueError("invalid fixed width value!")
    try:
        options.delta_radius = int(values["_protus_adjustment"])
        options.disk_display = True
    except ValueError:
        raise ValueError("invalid protus_radius_adjustment")
    try:
        options.ellipse_fit_shift = (
            int(values["ellipse_fit_shift"]) if values["ellipse_fit_shift"] else 10
        )
    except ValueError:
        raise ValueError("invalid ellipse_fit_shift!")
    options.save_fit = bool(values["Save fits files"])
    options.clahe_only = bool(values["Save clahe.png only"])
    options.protus_only = bool(values["Save protus.png only"])
    options.crop_width_square = bool(values["Crop square"])
    options.transversalium = bool(values["Correct transversalium lines"])
    options.stubborn_transversalium = bool(values["Stubborn transversalium"])
    options.trans_strength = int(float(values["-trans_strength-"]) * 100) + 1
    options.flip_x = bool(values["Mirror X"])
    options.img_rotate = int(values["img_rotate"])
    files = str(values["-FILE-"]).split(";")
    options.output_dir = str(values["output_dir"])
    if options.output_dir and not os.path.isdir(options.output_dir):
        raise ValueError("ERROR opening output folder :" + options.output_dir)
    if options.selected_mode == "Folder input mode":
        options.input_dir = str(values["input_dir"])
    options.continuous_detect_mode = bool(values["Continuous detect mode"])
    options.de_vignette = bool(values["de-vignette"])
    if no_file:
        return None
    if options.selected_mode == "File input mode":
        for f in files:
            try:
                with open(f, "rb"):
                    pass
            except Exception:
                raise ValueError("ERROR opening file :" + f + "!")
        return files
    if options.selected_mode == "Folder input mode":
        if not os.path.isdir(options.input_dir):
            raise ValueError("ERROR opening folder :" + options.input_dir)
        return []
    raise ValueError("ERROR: Invalid mode selection: " + options.selected_mode)
