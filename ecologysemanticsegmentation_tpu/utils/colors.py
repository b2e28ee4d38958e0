"""Overlay color table.

The reference ships a 1124-line static RGB name table and filters/shuffles
it at import (``dataset/__init__.py:1-7``,
``dataset/resources/color_constants.py``).  That table now travels with this
package as DATA (``resources/color_constants.json`` — the executed module's
``colors`` dict, 551 entries in source order), so overlay colors come from
the reference's actual palette.  Two deliberate deviations, both documented:

* The reference's filter is a no-op quirk — it tests literal strings
  (``"blue" in colors``: true for every k, and ``str(1..4) in colors``:
  false for every k), so ALL 551 colors survive.  We reproduce the outcome
  (keep everything) without reproducing the dead expression.
* The reference shuffles with an UNSEEDED ``random.shuffle`` at import —
  overlay colors differ per process.  We shuffle with a fixed seed so runs
  are reproducible; set ``COLOR_SHUFFLE_SEED`` to any int to re-roll, or
  ``COLOR_SHUFFLE_SEED=none`` for the reference's nondeterminism.

The golden-ratio generator remains as the fallback if the resource file is
missing (e.g. a trimmed install).
"""

from __future__ import annotations

import colorsys
import json
import os
import random


def _make_colors(n: int = 64) -> list[tuple[int, int, int]]:
    out = []
    for i in range(n):
        # golden-ratio hue stepping for max separation
        h = (i * 0.61803398875) % 1.0
        s = 0.85 if i % 2 == 0 else 0.6
        v = 1.0 if i % 3 else 0.8
        r, g, b = colorsys.hsv_to_rgb(h, s, v)
        out.append((int(r * 255), int(g * 255), int(b * 255)))
    return out


def _load_reference_table() -> dict[str, tuple[int, int, int]] | None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "resources", "color_constants.json")
    try:
        with open(path) as f:
            table = json.load(f)
    except (OSError, ValueError):
        return None
    return {k: tuple(int(c) for c in v) for k, v in table.items()}


COLOR_NAMES: dict[str, tuple[int, int, int]] = _load_reference_table() or {}
if COLOR_NAMES:
    COLORS: list[tuple[int, int, int]] = list(COLOR_NAMES.values())
    _seed = os.environ.get("COLOR_SHUFFLE_SEED", "0")
    random.Random(None if _seed.lower() == "none" else int(_seed)).shuffle(COLORS)
else:  # pragma: no cover - trimmed-install fallback
    COLORS = _make_colors()
