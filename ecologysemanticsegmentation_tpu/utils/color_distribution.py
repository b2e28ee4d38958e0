"""Segment color-distribution analyzer.

Rebuild of reference ``dataset/color_distribution_dataset.py:6-115``
(``SegmentColorDistribution``): maps the pixels inside a segmentation mask to
a named HSV palette by nearest hue and reports per-color pixel counts.

Two palettes are supported:

* the reference's 24-color HSV-range table, shipped verbatim as
  ``resources/color_palette.txt`` (a data resource that DEFINES the output
  semantics, like the SUIM HSV thresholds) and counted with the reference's
  exact algorithm (:meth:`SegmentColorDistribution.find_color_distribution`
  — hue-only distance to each range's mean, argmin over colors,
  ``color_distribution_dataset.py:69-97``), and
* a simple 12-hue wheel for quick RGB analyses (:meth:`__call__`).
"""

from __future__ import annotations

import colorsys
import os
import re

import numpy as np

REFERENCE_PALETTE_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "color_palette.txt",
)


def load_reference_palette(path: str = REFERENCE_PALETTE_FILE):
    """Parse the reference palette format: lines of
    ``(name, ((h,s,v), (h,s,v)[, ...]))`` — pairs of HSV range bounds in cv2
    convention (H 0-180).  Returns [{"color_name", "color_range"}] sorted by
    name, exactly like the reference loader
    (``color_distribution_dataset.py:25-45``)."""
    palette = []
    with open(path) as f:
        for line in f:
            if "(" not in line:
                continue
            name = line.split("(")[1].split(",")[0].replace(")", "").strip()
            nums = [int(x) for x in re.findall(r"-?\d+", line.split(",", 1)[1])]
            arr = np.array(nums).reshape(-1, 3)
            ranges = [arr[i : i + 2] for i in range(0, len(arr), 2)]
            palette.append({"color_name": name, "color_range": ranges or None})
    return sorted(palette, key=lambda x: x["color_name"])

def make_palette_image(size: int = 256) -> np.ndarray:
    """Procedural stand-in for the reference's ``palette.png`` (used by the
    HSV picker and show-colors displays): an HSV sweep — hue across x,
    saturation down the top half, value down the bottom half.  Returns BGR
    uint8 (cv2 convention; cv2-optional via data.imops)."""
    from ..data import imops

    h = np.linspace(0, 179, size, dtype=np.float32)[None, :].repeat(size, 0)
    ramp = np.linspace(0, 255, size // 2, dtype=np.float32)
    s = np.concatenate([ramp[:, None].repeat(size, 1),
                        np.full((size - size // 2, size), 255, np.float32)])
    v = np.concatenate([np.full((size // 2, size), 255, np.float32),
                        ramp[::-1][:, None].repeat(size, 1)])
    hsv = np.stack([h, s, v], axis=-1).astype(np.uint8)
    return imops.hsv2bgr_u8(hsv)


# name -> hue degree (0-360). Default 12-hue wheel + neutrals.
DEFAULT_PALETTE = {
    "red": 0, "orange": 30, "yellow": 60, "chartreuse": 90, "green": 120,
    "spring_green": 150, "cyan": 180, "azure": 210, "blue": 240,
    "violet": 270, "magenta": 300, "rose": 330,
}


class SegmentColorDistribution:
    BACKGROUND_CLASS = "background"

    def __init__(self, palette: dict[str, float] | None = None,
                 palette_file: str | None = REFERENCE_PALETTE_FILE):
        self.palette = dict(palette or DEFAULT_PALETTE)
        self.names = list(self.palette.keys())
        self.hues = np.array([self.palette[n] for n in self.names], np.float32)
        # reference 24-color table (None if the resource is absent)
        self.color_palette = (
            load_reference_palette(palette_file)
            if palette_file and os.path.exists(palette_file) else None
        )
        if self.color_palette:
            # one filtered list drives BOTH the name order and the per-color
            # lookups below — indexing the unfiltered palette with filtered
            # indices would misalign every color after a 'background' entry
            self._fg_palette = [x for x in self.color_palette
                                if x["color_name"] != self.BACKGROUND_CLASS]
            self.colors = [x["color_name"] for x in self._fg_palette]
            # mean hue per range pair, per color (hue-only distance as in
            # pixel_inrange_boolean, color_distribution_dataset.py:69-78)
            self._mean_hues = [
                np.array([np.mean(r, axis=0)[0] for r in x["color_range"]],
                         np.float32)
                if x["color_range"] is not None else None
                for x in self._fg_palette
            ]

    def find_color_distribution(self, image_hsv: np.ndarray, mask: np.ndarray):
        """Reference-exact per-color pixel counts over masked pixels.

        ``image_hsv``: HWC uint8 in cv2 HSV (H 0-180); ``mask``: HW (or HWC —
        channel 0 is used, as the reference does).  Returns
        ({color_name: count}, multi_color_mask) where the mask paints each
        counted pixel with its winning color's first-range mean
        (``color_distribution_dataset.py:80-97``), vectorized.
        """
        assert self.color_palette is not None, "reference palette unavailable"
        if mask.ndim == 3:
            mask = mask[:, :, 0]
        sel = mask > 0
        pix_h = image_hsv[sel][:, 0].astype(np.float32)  # (P,)
        n_colors = len(self.colors)
        distances = np.full((pix_h.shape[0], n_colors), 1e5, np.float32)
        for idx in range(n_colors):
            means = self._mean_hues[idx]
            if means is None:
                continue
            d = np.abs(means[None, :] - pix_h[:, None]).min(axis=1)
            distances[:, idx] = d
        winner = distances.argmin(axis=1) if len(pix_h) else np.zeros(0, np.int64)
        counts = {c: int((winner == i).sum()) for i, c in enumerate(self.colors)}
        multi = np.zeros(image_hsv.shape, np.uint8)
        if len(pix_h):
            first_means = np.stack([
                np.mean(self._fg_palette[i]["color_range"][0], axis=0)
                if self._fg_palette[i]["color_range"] is not None
                else np.zeros(3)
                for i in range(n_colors)
            ]).astype(np.uint8)
            multi[sel] = first_means[winner]
        return counts, multi

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
