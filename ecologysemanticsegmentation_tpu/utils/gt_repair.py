"""Ground-truth repair utilities.

Rebuilds of the reference GT-repair scripts as callable functions:

* :func:`remove_islands_in_segment_gt`, :func:`shoelace_algorithm`,
  :func:`get_bounding_box_from_mask`, :func:`find_bbox_mask_problems` —
  reference ``dataset/utils/bbox_masks_problem.py:10-68`` (drops contours with
  shoelace area ≤ 1000; flags masks whose bbox ≈ the full image).
* :func:`realign_cropped_mask` — reference
  ``dataset/utils/manual_bbox_identification.py:16-119``: slides a cropped
  mask over the full image minimizing masked MSE to recover the crop offset.
  The reference runs at import with hardcoded home paths; here it is a pure
  function (and the O(offsets · pixels) search is done with cv2.matchTemplate
  instead of a Python double loop).
"""

from __future__ import annotations

import glob
import os
import shutil

from ..data.imops import cv2_or_stub as cv2
import numpy as np


def shoelace_algorithm(poly: np.ndarray) -> float:
    """Polygon area via the shoelace formula; poly is (N, 2) xy."""
    x, y = poly[:, 0].astype(np.float64), poly[:, 1].astype(np.float64)
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def remove_islands_in_segment_gt(segment: np.ndarray, min_area: float = 1000.0) -> np.ndarray:
    """Drop connected components whose contour area is ≤ ``min_area``."""
    seg8 = (segment > 0).astype(np.uint8) * 255
    contours, _ = cv2.findContours(seg8, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    out = np.zeros_like(seg8)
    for cnt in contours:
        if shoelace_algorithm(cnt.reshape(-1, 2)) > min_area:
            cv2.drawContours(out, [cnt], -1, 255, -1)
    return out


def get_bounding_box_from_mask(mask: np.ndarray) -> tuple[int, int, int, int] | None:
    """(x, y, w, h) bbox of the positive region, or None if empty."""
    ys, xs = np.where(mask > 0)
    if len(ys) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)


def find_bbox_mask_problems(
    mask_dir: str, full_image_ratio: float = 0.95
) -> list[str]:
    """Flag mask files whose bbox covers ≈ the whole image — the reference's
    "bbox masks problem" detector (``bbox_masks_problem.py`` __main__)."""
    flagged = []
    for path in sorted(glob.glob(os.path.join(mask_dir, "*"))):
        mask = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if mask is None:
            continue
        bbox = get_bounding_box_from_mask(mask)
        if bbox is None:
            continue
        _, _, w, h = bbox
        if w >= full_image_ratio * mask.shape[1] and h >= full_image_ratio * mask.shape[0]:
            flagged.append(path)
    return flagged


def realign_cropped_mask(
    full_image: np.ndarray, cropped_mask: np.ndarray, cropped_image: np.ndarray
) -> tuple[int, int]:
    """Recover the (x, y) offset of a cropped annotation inside the full image
    by minimizing masked squared error — template matching over the crop.

    Returns the top-left offset of the best match.
    """
    full = cv2.cvtColor(full_image, cv2.COLOR_BGR2GRAY).astype(np.float32)
    crop = cv2.cvtColor(cropped_image, cv2.COLOR_BGR2GRAY).astype(np.float32)
    mask8 = (cropped_mask > 0).astype(np.uint8)
    res = cv2.matchTemplate(full, crop, cv2.TM_SQDIFF, mask=mask8)
    _, _, min_loc, _ = cv2.minMaxLoc(res)
    return int(min_loc[0]), int(min_loc[1])


def rebuild_bbox_dataset(
    full_images_dir: str, crops_dir: str, out_dir: str, organ: str = "whole body"
) -> list[tuple[str, int, int]]:
    """Re-align every cropped mask in ``crops_dir`` against its full image and
    write a loader-consumable ``bbox_to_segmentation_gt/`` dataset to
    ``out_dir`` (reference ``manual_bbox_identification.py:57-104`` writes the
    same ml_training_set folder layout: ``original image/`` + ``<part>/``).

    Masks are written in the ml_training_set convention — white (255)
    background, dark foreground — so ``get_ml_training_set_data`` can load the
    result directly via its ``bbox_dir`` argument.  Crop files are paired as
    ``<stem>_mask.*`` / ``<stem>_crop.*``.
    """
    orig_dir = os.path.join(out_dir, "original image")
    organ_dir = os.path.join(out_dir, organ)
    os.makedirs(orig_dir, exist_ok=True)
    os.makedirs(organ_dir, exist_ok=True)
    results = []
    for crop_path in sorted(glob.glob(os.path.join(crops_dir, "*_mask.*"))):
        stem = os.path.basename(crop_path).split("_mask")[0]
        img_matches = glob.glob(os.path.join(full_images_dir, stem + ".*"))
        crop_img_matches = glob.glob(os.path.join(crops_dir, stem + "_crop.*"))
        if not img_matches or not crop_img_matches:
            continue
        full = cv2.imread(img_matches[0])
        crop_mask = cv2.imread(crop_path, cv2.IMREAD_GRAYSCALE)
        crop_img = cv2.imread(crop_img_matches[0])
        if full is None or crop_mask is None or crop_img is None:
            continue
        x, y = realign_cropped_mask(full, crop_mask, crop_img)
        out = np.full(full.shape[:2], 255, np.uint8)  # white = background
        h, w = crop_mask.shape[:2]
        out[y : y + h, x : x + w] = crop_mask
        out_path = os.path.join(organ_dir, stem + ".png")
        cv2.imwrite(out_path, out)
        shutil.copyfile(
            img_matches[0], os.path.join(orig_dir, os.path.basename(img_matches[0]))
        )
        results.append((out_path, x, y))
    return results


def find_bbox_problems_in_dataset(dataset, threshold: int = 5) -> list[str]:
    """Flag dataset items whose (island-cleaned) first-channel mask bbox
    spans ≈ the full image — the reference's
    ``python -m ...dataset.bbox_masks_problem`` __main__
    (``bbox_masks_problem.py:54-68``: binarize, bbox, flag when the side
    deltas sum under ``2*threshold``; its H/W cross-compare is equivalent
    on the square post-resize masks both frameworks produce)."""
    flagged = []
    for _, mask, path in dataset:
        chan = (np.asarray(mask)[..., 0] > 0).astype(np.uint8)
        cleaned = remove_islands_in_segment_gt(chan)
        bbox = get_bounding_box_from_mask(cleaned)
        if bbox is None:
            continue
        _, _, w, h = bbox
        if abs(w - chan.shape[1]) + abs(h - chan.shape[0]) < 2 * threshold:
            flagged.append(path)
    return flagged


def main(argv=None):
    """Dataset-tools CLI (reference README "Dataset Tools" section):
    ``scan`` = the bbox-masks-problem detector over a dataset split,
    ``flag`` = the same detector over a directory of mask files,
    ``rebuild`` = the manual-bbox re-alignment writer
    (``manual_bbox_identification.py`` as a runnable tool instead of
    import-time hardcoded paths)."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m ecologysemanticsegmentation_tpu.utils.gt_repair")
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("scan", help="print dataset items whose GT mask bbox "
                       "spans ~the full image (mis-cropped annotations)")
    s.add_argument("--split", default="test",
                   choices=["train", "val", "test"])
    s.add_argument("--dataset", default=None,
                   help="'synthetic' for the fixture dataset")
    s.add_argument("--threshold", type=int, default=5)
    f = sub.add_parser("flag", help="print mask FILES whose bbox covers "
                       "~the whole image")
    f.add_argument("--mask_dir", required=True)
    f.add_argument("--ratio", type=float, default=0.95)
    r = sub.add_parser("rebuild", help="re-align cropped masks against full "
                       "images; writes a bbox_to_segmentation_gt dataset "
                       "consumable via BBOX_DIR")
    r.add_argument("--full_images", required=True)
    r.add_argument("--crops", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--organ", default="whole body")
    args = ap.parse_args(argv)

    if args.cmd == "scan":
        from ..data import get_split_datasets

        splits = get_split_datasets(
            synthetic=(args.dataset == "synthetic"))
        ds = splits[("train", "val", "test").index(args.split)]
        flagged = find_bbox_problems_in_dataset(ds, threshold=args.threshold)
        for path in flagged:
            print(path)
        print(f"flagged {len(flagged)}/{len(ds)} items")
    elif args.cmd == "flag":
        flagged = find_bbox_mask_problems(args.mask_dir,
                                          full_image_ratio=args.ratio)
        for path in flagged:
            print(path)
        print(f"flagged {len(flagged)} files")
    else:
        results = rebuild_bbox_dataset(args.full_images, args.crops,
                                       args.out, organ=args.organ)
        for out_path, x, y in results:
            print(f"{out_path}: offset ({x}, {y})")
        print(f"rebuilt {len(results)} masks -> {args.out}")


def reference_bbox_images(data_root: str) -> list[str]:
    """Absolute paths of the alvaradolab images named by the reference's
    bbox-annotation table (``dataset/resources/composite_bboxes.py``,
    consumed at ``manual_bbox_identification.py:50`` as
    ``os.path.join(ORIGINAL_DATA, x)``) — the images whose ground truth
    needs :func:`rebuild_bbox_dataset`'s re-alignment.  The table ships as
    a data resource (``resources/bbox_annotation_files.txt``, same
    treatment as ``color_palette.txt``).  Missing files are kept in the
    list (the reference would fail on imread the same way); callers filter
    with ``os.path.exists`` as needed."""
    import os

    table = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources", "bbox_annotation_files.txt",
    )
    paths = []
    with open(table) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                paths.append(os.path.join(data_root, line))
    return paths


if __name__ == "__main__":
    main()
