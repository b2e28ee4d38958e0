"""Composite-label visualizer.

Behavioral rebuild of ``display_composite_annotations``
(reference ``dataset/visualize_composite_labels.py:7-107``): alpha-blends
(0.75) each organ mask in a distinct color over the image, groups by CPARTS,
warns about −1 ignore labels ("will not be learnt"), and supports the
``return_image`` mode the eval harness uses to emit PNG overlays
(reference ``test_multiclass.py:94-102``).

Input convention here is NHWC-style HWC uint8 (image) and HWC uint8 masks —
the framework's native layout (the reference takes CHW).
"""

from __future__ import annotations

import numpy as np

from ..config import CPARTS
from .colors import COLORS


def display_composite_annotations(
    image: np.ndarray,
    labels_map: np.ndarray,
    composite_labels,
    verbose: bool = True,
    min_positivity_ratio: float = 0.009,
    hide_whole_body_segment: bool = False,
    show_composite_parts: bool = True,
    return_image: bool = True,
    show: bool = False,
):
    """Overlay organ masks; returns a list of {name: image} dicts.

    ``show=True`` additionally pops cv2 windows (the reference's interactive
    default); headless callers keep the pure return path (cv2-optional via
    data.imops).
    """
    from ..data import imops

    alpha = 0.75
    image = np.ascontiguousarray(image).astype(np.uint8)
    labels_map = np.ascontiguousarray(labels_map).astype(np.int16)

    if hide_whole_body_segment:
        largest = int(np.argmax(labels_map.clip(0).sum(axis=(0, 1))))
        if composite_labels[largest] == "whole_body":
            if verbose:
                print(f"\nIgnoring largest segment {composite_labels[largest]}!")
        else:
            if verbose:
                print("\nCannot find whole body segment!")

    outer_loop_times = (
        len(CPARTS)
        if not return_image
        and show_composite_parts
        and any(x in composite_labels for grp in CPARTS for x in grp)
        else 1
    )

    return_images = []
    base = image.copy()
    for outer_idx in range(outer_loop_times):
        canvas = base.copy()
        visited = []
        for seg_id in range(labels_map.shape[-1]):
            chan = labels_map[..., seg_id]
            if (chan < 0).any():
                print(
                    "Label %s will not be learnt by gradient descent algorithm!"
                    % composite_labels[seg_id]
                )
                continue
            if outer_loop_times > 1:
                if composite_labels[seg_id] not in CPARTS[outer_idx]:
                    continue
                ratio = chan.sum() / (255.0 * np.prod(chan.shape))
                if verbose:
                    print(f"{composite_labels[seg_id]} mask ratio wrt image: {ratio:f}")
                if ratio > min_positivity_ratio:
                    visited.append(CPARTS[outer_idx].index(composite_labels[seg_id]))
                else:
                    continue
            color = np.array(COLORS[seg_id % len(COLORS)], np.uint8)
            seg_img = (chan.clip(0, 255).astype(np.uint8)[..., None] // 255) * color
            canvas = imops.add_weighted(canvas, 1 - alpha, seg_img, alpha, 1.0)
            if show:
                import cv2

                cv2.imshow(f"fish_{composite_labels[seg_id]}", chan.clip(0, 255).astype(np.uint8))
            if return_image:
                return_images.append({composite_labels[seg_id]: canvas.copy()})

        ann_type = "all_parts" if outer_loop_times == 1 else ", ".join(CPARTS[outer_idx])
        if show:
            import cv2

            cv2.imshow(f"fish_{ann_type}", canvas)
            cv2.waitKey()
        return_images.append({ann_type: canvas})
    return return_images
