"""Segment color-distribution analyzer.

Rebuild of reference ``dataset/color_distribution_dataset.py:6-115``
(``SegmentColorDistribution``): maps the pixels inside a segmentation mask to
a small named HSV palette by nearest hue and reports per-color pixel counts.
The reference reads a 24-color palette from ``resources/color_palette.txt`` +
``palette.png``; here the palette is an explicit constructor argument with a
sensible default."""

from __future__ import annotations

import colorsys

import numpy as np

# name -> hue degree (0-360). Default 12-hue wheel + neutrals.
DEFAULT_PALETTE = {
    "red": 0, "orange": 30, "yellow": 60, "chartreuse": 90, "green": 120,
    "spring_green": 150, "cyan": 180, "azure": 210, "blue": 240,
    "violet": 270, "magenta": 300, "rose": 330,
}


class SegmentColorDistribution:
    def __init__(self, palette: dict[str, float] | None = None):
        self.palette = dict(palette or DEFAULT_PALETTE)
        self.names = list(self.palette.keys())
        self.hues = np.array([self.palette[n] for n in self.names], np.float32)

    def __call__(self, image: np.ndarray, mask: np.ndarray) -> dict[str, int]:
        """image: HWC RGB in [0,1] or uint8; mask: HW binary.  Returns
        {color_name: pixel_count} over masked pixels (plus black/white/gray
        buckets for low-saturation/low-value pixels)."""
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        sel = img[mask > 0]
        counts = {n: 0 for n in self.names}
        counts.update({"black": 0, "white": 0, "gray": 0})
        if sel.size == 0:
            return counts
        mx = sel.max(axis=-1)
        mn = sel.min(axis=-1)
        d = mx - mn
        sat = np.where(mx == 0, 0, d / np.maximum(mx, 1e-6))

        achromatic = sat < 0.15
        counts["black"] = int(np.sum(achromatic & (mx < 0.2)))
        counts["white"] = int(np.sum(achromatic & (mx > 0.8)))
        counts["gray"] = int(np.sum(achromatic & (mx >= 0.2) & (mx <= 0.8)))

        chrom = sel[~achromatic]
        if len(chrom):
            hues = np.array(
                [colorsys.rgb_to_hsv(*px)[0] * 360.0 for px in chrom], np.float32
            )
            # circular nearest-hue assignment
            diff = np.abs(hues[:, None] - self.hues[None, :])
            diff = np.minimum(diff, 360.0 - diff)
            nearest = diff.argmin(axis=1)
            for i, n in enumerate(self.names):
                counts[n] += int(np.sum(nearest == i))
        return counts
