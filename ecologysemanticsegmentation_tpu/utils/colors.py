"""Overlay color table.

The reference ships a 1124-line static RGB name table and filters/shuffles it
at import (``dataset/__init__.py:1-7``, ``dataset/resources/color_constants.py``).
Capability equivalent: a deterministic, maximally-distinct color list generated
from evenly spaced hues — same role (organ overlay colors), no 1k-line data
blob, and deterministic instead of shuffle-at-import.
"""

from __future__ import annotations

import colorsys


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


COLORS: list[tuple[int, int, int]] = _make_colors()
