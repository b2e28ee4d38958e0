"""Interactive HSV picker: prints the HSV of clicked pixels.

Rebuild of reference ``dataset/utils/hsv_picker.py:1-17``.  Run as
``python -m ecologysemanticsegmentation_tpu.utils.hsv_picker <image>``.
Also provides the headless :func:`hsv_at` used by tests.
"""

from __future__ import annotations

import os
import sys

from ..data.imops import cv2_or_stub as cv2
import numpy as np

# The reference opens its packaged ``resources/palette.png`` by default
# (``dataset/utils/hsv_picker.py:4``); ours is generated from
# utils.color_distribution.make_palette_image (an HSV sweep chart).
DEFAULT_PALETTE_PNG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "palette.png",
)


def hsv_at(image_bgr: np.ndarray, x: int, y: int) -> tuple[int, int, int]:
    hsv = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2HSV)
    return tuple(int(v) for v in hsv[y, x])


def main(path: str) -> None:  # pragma: no cover - interactive
    img = cv2.imread(path)
    if img is None:
        raise SystemExit(f"cannot read {path}")

    def on_click(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            print("HSV:", hsv_at(img, x, y))

    cv2.namedWindow("palette")
    cv2.setMouseCallback("palette", on_click)
    cv2.imshow("palette", img)
    cv2.waitKey()


if __name__ == "__main__":  # pragma: no cover
    main(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_PALETTE_PNG)
