"""Language dictionaries for the front ends.

reference: UI_handler.py:93-166 (read_langs/change_langs) — JSON dicts named
``dict_lang_*.txt`` in a ``language_data`` directory, keys are the English
UI strings plus ``_lang_name``/``_flag_icon`` and popup-message keys.

We ship English and French dictionaries in ``data/language/`` and also load
any reference-format dicts the user drops there (or points
``SOLEX_LANGUAGE_DATA`` at), so the reference's 13 translations work
unchanged.
"""

from __future__ import annotations

import json
import os
import traceback
from typing import Dict, List, Tuple

_BUILTIN = os.path.join(os.path.dirname(__file__), "data", "language")


def language_dirs() -> List[str]:
    dirs = [_BUILTIN]
    env = os.environ.get("SOLEX_LANGUAGE_DATA")
    if env:
        dirs.append(env)
    return [d for d in dirs if os.path.isdir(d)]


def read_langs() -> Tuple[List[str], List[Dict[str, str]]]:
    """All available language dicts (reference: UI_handler.py:93-112)."""
    langs: List[str] = []
    dicts: List[Dict[str, str]] = []
    for d in language_dirs():
        for filename in sorted(os.listdir(d)):
            if not (filename.startswith("dict_lang") and filename.endswith(".txt")):
                continue
            try:
                with open(os.path.join(d, filename), encoding="utf-8") as fp:
                    lang = json.load(fp)
            except Exception:
                traceback.print_exc()
                continue
            name = lang.get("_lang_name", filename)
            if name not in langs:
                langs.append(name)
                dicts.append(lang)
    return langs, dicts


def get_lang(name: str = "English") -> Dict[str, str]:
    langs, dicts = read_langs()
    if name in langs:
        return dicts[langs.index(name)]
    return dicts[langs.index("English")] if "English" in langs else {}


def tr(lang_dict: Dict[str, str], key: str) -> str:
    """Translate a UI string, falling back to the key itself."""
    return lang_dict.get(key, key)
