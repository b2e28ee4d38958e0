"""Utils layer tests: visualizer, edges, GT repair, color distribution, saliency."""

import numpy as np
import pytest

from ecologysemanticsegmentation_tpu import utils

ORGANS3 = ["whole_body", "ventral_side", "dorsal_side"]


def _fish(size=96):
    import cv2

    img = np.full((size, size, 3), 40, np.uint8)
    cv2.ellipse(img, (48, 48), (30, 14), 0, 0, 360, (200, 120, 60), -1)
    chans = []
    for axes in [(30, 14), (20, 9), (12, 5)]:
        c = np.zeros((size, size), np.uint8)
        cv2.ellipse(c, (48, 48), axes, 0, 0, 360, 255, -1)
        chans.append(c)
    return img, np.stack(chans, axis=-1)


def test_display_composite_annotations_return_image():
    img, mask = _fish()
    out = utils.display_composite_annotations(img, mask, ORGANS3, verbose=False)
    assert len(out) == 4  # 3 organ overlays + all_parts
    assert "all_parts" in out[-1]
    blended = out[-1]["all_parts"]
    assert blended.shape == img.shape
    assert not np.array_equal(blended, img)  # something was overlaid


def test_display_warns_on_ignore_labels(capsys):
    img, mask = _fish()
    m = mask.astype(np.int16)
    m[..., 1] = -1
    utils.display_composite_annotations(img, m, ORGANS3, verbose=False)
    assert "will not be learnt" in capsys.readouterr().out


def test_detect_edges_methods():
    img, _ = _fish()
    for method in ("sobel", "canny", "DoG"):
        edges = utils.detect_edges(img, method=method)
        assert edges.shape == (96, 96)
        assert edges.sum() > 0


def test_detect_inner_edges_membership():
    _, mask = _fish()
    gt = (mask / 255.0).astype(np.float32)[None]
    pred = gt.copy()
    # predict organ0 slightly dilated -> over-expressed edge pixels exist
    import cv2

    pred[0, ..., 0] = cv2.dilate(pred[0, ..., 0], np.ones((5, 5)))
    results = utils.detect_inner_edges(pred, gt)
    assert len(results) == 2  # organ pairs (0,1), (1,2)
    assert results[0]["pred_sub_gt_edges"].sum() > 0


def test_remove_islands_and_shoelace():
    import cv2

    seg = np.zeros((128, 128), np.uint8)
    cv2.rectangle(seg, (10, 10), (80, 80), 255, -1)  # big: area ~4900
    cv2.rectangle(seg, (100, 100), (110, 110), 255, -1)  # small island: area 100
    out = utils.remove_islands_in_segment_gt(seg)
    assert out[40, 40] == 255
    assert out[105, 105] == 0
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    assert utils.shoelace_algorithm(square) == 100.0


def test_bbox_helpers(tmp_path):
    import cv2

    mask = np.zeros((64, 64), np.uint8)
    mask[8:40, 16:48] = 255
    assert utils.get_bounding_box_from_mask(mask) == (16, 8, 32, 32)
    assert utils.get_bounding_box_from_mask(np.zeros((8, 8))) is None

    # full-image bbox -> flagged
    cv2.imwrite(str(tmp_path / "bad.png"), np.full((64, 64), 255, np.uint8))
    cv2.imwrite(str(tmp_path / "good.png"), mask)
    flagged = utils.find_bbox_mask_problems(str(tmp_path))
    assert [f.endswith("bad.png") for f in flagged] == [True]


def test_find_bbox_problems_in_dataset_and_cli(tmp_path, capsys, monkeypatch):
    """The dataset-scan detector (reference bbox_masks_problem __main__)
    flags items whose island-cleaned mask bbox spans ~the full image, and
    the gt_repair CLI drives it over the synthetic dataset."""
    from ecologysemanticsegmentation_tpu.utils import gt_repair

    full = np.zeros((128, 128, 1), np.float32)
    full[1:127, 2:126, 0] = 1.0  # bbox ~ whole image -> flagged
    small = np.zeros((128, 128, 1), np.float32)
    small[20:80, 20:80, 0] = 1.0  # area 3600 survives island removal
    ds = [(None, full, "bad.png"), (None, small, "good.png")]
    assert gt_repair.find_bbox_problems_in_dataset(ds) == ["bad.png"]

    monkeypatch.setenv("ORGANS", "whole_body")
    monkeypatch.setenv("IMGSIZE", "64")
    monkeypatch.setenv("SAMPLE", "1")
    gt_repair.main(["scan", "--dataset", "synthetic", "--split", "test"])
    out = capsys.readouterr().out
    assert "items" in out.splitlines()[-1]


def test_realign_cropped_mask():
    img, mask = _fish()
    crop = img[20:70, 10:80]
    crop_mask = mask[20:70, 10:80, 0]
    x, y = utils.realign_cropped_mask(img, crop_mask, crop)
    assert (x, y) == (10, 20)


def test_color_distribution():
    img = np.zeros((10, 10, 3), np.float32)
    img[:5] = (1.0, 0.0, 0.0)  # red
    img[5:] = (0.0, 0.0, 1.0)  # blue
    mask = np.ones((10, 10))
    counts = utils.SegmentColorDistribution()(img, mask)
    assert counts["red"] == 50 and counts["blue"] == 50


def test_reference_palette_loads_24_colors():
    from ecologysemanticsegmentation_tpu.utils.color_distribution import (
        load_reference_palette,
    )

    palette = load_reference_palette()
    names = [p["color_name"] for p in palette]
    assert len(names) == 24
    assert "brown" in names and "graphite_grey" in names and "black" in names
    by_name = {p["color_name"]: p for p in palette}
    # brown: ranges (2,99,95)-(10,151,138) -> one pair, mean hue 6
    brown = by_name["brown"]["color_range"]
    assert len(brown) == 1 and np.mean(brown[0], axis=0)[0] == 6.0
    # graphite_grey: 4 bound rows -> 2 range pairs
    assert len(by_name["graphite_grey"]["color_range"]) == 2
    assert names == sorted(names)  # reference sorts by color_name


def test_find_color_distribution_matches_reference_algorithm():
    """Vectorized counting equals the reference's per-pixel loop
    (color_distribution_dataset.py:69-97) executed literally."""
    from ecologysemanticsegmentation_tpu.utils.color_distribution import (
        SegmentColorDistribution,
    )

    obj = SegmentColorDistribution()
    rng = np.random.RandomState(0)
    img_hsv = rng.randint(0, 180, (16, 16, 3)).astype(np.uint8)
    img_hsv[..., 1:] = rng.randint(0, 256, (16, 16, 2))
    mask = (rng.rand(16, 16) > 0.4).astype(np.uint8)

    counts, multi = obj.find_color_distribution(img_hsv, mask)

    # literal reference loop
    ref_counts = {c: 0 for c in obj.colors}
    for mdx, ndx in zip(*np.nonzero(mask)):
        distances = []
        for idx, color in enumerate(obj.colors):
            cr = obj._fg_palette[idx]["color_range"]
            if cr is None:
                distances.append(1e5)
                continue
            means = [np.mean(x, axis=0) for x in cr]
            distances.append(min(abs(m[0] - float(img_hsv[mdx, ndx, 0])) for m in means))
        ref_counts[obj.colors[int(np.argmin(distances))]] += 1
    assert counts == ref_counts
    assert sum(counts.values()) == int(mask.sum())
    assert multi.shape == img_hsv.shape and multi[mask > 0].any()


def test_background_palette_entry_does_not_misalign_colors(tmp_path):
    """A palette containing a 'background' entry (the class explicitly
    supports one) must not shift the hue/paint lookups of the colors sorted
    after it (regression: filtered color names were used to index the
    UNfiltered palette)."""
    from ecologysemanticsegmentation_tpu.utils.color_distribution import (
        SegmentColorDistribution,
    )

    # reference txt format: one '(name, ((h,s,v), (h,s,v)))' tuple line per
    # color; names chosen so 'background' sorts into the middle
    pf = tmp_path / "palette.txt"
    pf.write_text(
        "(azure, ((100, 90, 90), (110, 255, 255)))\n"
        "(background, ((0, 0, 0), (0, 0, 0)))\n"
        "(crimson, ((170, 90, 90), (180, 255, 255)))\n"
    )
    obj = SegmentColorDistribution(palette_file=str(pf))
    assert obj.colors == ["azure", "crimson"]

    img_hsv = np.zeros((4, 4, 3), np.uint8)
    img_hsv[..., 0] = 175  # crimson hue band
    img_hsv[..., 1:] = 200
    counts, multi = obj.find_color_distribution(img_hsv, np.ones((4, 4)))
    assert counts == {"azure": 0, "crimson": 16}
    # painted with crimson's first-range mean, not background's zeros
    assert multi[0, 0, 0] == np.uint8(np.mean([[170, 90, 90], [180, 255, 255]], axis=0)[0])


def test_make_palette_image():
    from ecologysemanticsegmentation_tpu.utils.color_distribution import (
        make_palette_image,
    )
    from ecologysemanticsegmentation_tpu.utils.hsv_picker import hsv_at

    img = make_palette_image(64)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    # hue sweeps across x: picker reads distinct hues at left/right
    h_left = hsv_at(img, 2, 40)[0]
    h_right = hsv_at(img, 61, 40)[0]
    assert abs(int(h_left) - int(h_right)) > 90


def test_grad_cam_shapes():
    import jax
    import jax.numpy as jnp

    from ecologysemanticsegmentation_tpu.models import build_model

    model = build_model("deeplabv3plus", num_classes=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    heat = utils.grad_cam(model, variables, jnp.ones((1, 64, 64, 3)) * 0.5, organ_index=0)
    heat = np.asarray(heat)
    assert heat.shape == (1, 64, 64)
    assert np.isfinite(heat).all() and heat.max() <= 1.0 + 1e-6


def test_reference_bbox_images_table():
    """The reference bbox-annotation data table ships and joins like the
    reference's ORIGINAL_DATA path construction."""
    from ecologysemanticsegmentation_tpu.utils.gt_repair import reference_bbox_images

    paths = reference_bbox_images("/root/data")
    assert len(paths) == 230
    assert paths[0].startswith("/root/data/") and paths[0].endswith(".jpg")
    assert all("original image" in p for p in paths)


def test_default_palette_png_exists():
    import os

    import cv2

    from ecologysemanticsegmentation_tpu.utils.hsv_picker import DEFAULT_PALETTE_PNG

    assert os.path.exists(DEFAULT_PALETTE_PNG)
    img = cv2.imread(DEFAULT_PALETTE_PNG)
    assert img is not None and img.shape[2] == 3


def test_overlay_colors_come_from_reference_table(monkeypatch):
    """The 551-entry reference color table (dataset/resources/
    color_constants.py, executed and dumped as data) supplies COLORS; the
    shuffle is seeded for reproducibility (COLOR_SHUFFLE_SEED)."""
    from ecologysemanticsegmentation_tpu.utils import colors as c

    assert len(c.COLOR_NAMES) == 551
    assert c.COLOR_NAMES["aliceblue"] == (240, 248, 255)
    assert c.COLOR_NAMES["yellow1"] == (255, 255, 0)
    # COLORS is a seeded shuffle of the table's values
    assert sorted(c.COLORS) == sorted(c.COLOR_NAMES.values())
    assert len(c.COLORS) == 551
    # deterministic under the default seed
    import importlib
    before = list(c.COLORS)
    importlib.reload(c)
    assert list(c.COLORS) == before
