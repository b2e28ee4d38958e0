"""Dataset layer tests: loader round-trips on materialized fixtures, splits,
pipeline, and the device augmentation."""

import os

import numpy as np
import pytest

from ecologysemanticsegmentation_tpu import data
from ecologysemanticsegmentation_tpu.config import EnvConfig


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fishdata")
    registry = data.materialize_to_disk(str(root), num_samples=8, size=96)
    return str(root), registry


ORGANS3 = ("whole_body", "ventral_side", "dorsal_side")


def test_synthetic_dataset_nested_organs():
    ds = data.get_synthetic_data(img_shape=96, organs=ORGANS3, num_samples=4)
    img, mask, path = ds[0]
    assert img.shape == (96, 96, 3) and img.dtype == np.float32
    assert mask.shape == (96, 96, 3)
    assert 0 <= img.min() and img.max() <= 1
    # nesting: organ k+1 subset of organ k
    assert np.all(mask[..., 1] <= mask[..., 0] + 1e-6)
    assert np.all(mask[..., 2] <= mask[..., 1] + 1e-6)
    assert mask[..., 0].sum() > 50  # a fish actually exists


def test_alvaradolab_loader_roundtrip(fixture_root):
    root, _ = fixture_root
    ds = data.get_alvaradolab_data(
        "segmentation/composite", "coco", root, 96, 0.0075, organs=ORGANS3
    )
    assert len(ds) == 8
    img, mask, path = ds[0]
    assert img.shape == (96, 96, 3) and mask.shape == (96, 96, 3)
    assert mask[..., 0].max() == 1.0  # body polygon rasterized
    # rasterized polygon should roughly match the source mask support
    assert (mask[..., 0] > 0).sum() > 100


def test_ml_training_set_loader_roundtrip(fixture_root):
    root, _ = fixture_root
    ds = data.get_ml_training_set_data(
        "segmentation/composite", "mlts", root, 96, 0.0075, organs=ORGANS3
    )
    assert len(ds) == 8
    img, mask, _ = ds[0]
    assert mask.shape == (96, 96, 3)
    assert set(np.unique(mask[..., 0])).issubset({0.0, 1.0})
    assert mask[..., 0].sum() > 100


def test_arw_raw_files_warn_and_count(tmp_path):
    """RAW (.arw) originals must not silently shrink a dataset: each skipped
    file warns and is recorded (reference fish_segmentation.py:17-24 decodes
    them via rawpy; rawpy is absent here)."""
    import cv2

    from ecologysemanticsegmentation_tpu.data import loaders

    mlts = tmp_path / "mlts" / "batch1"
    (mlts / "original image").mkdir(parents=True)
    (mlts / "whole body").mkdir(parents=True)
    img = np.full((32, 32, 3), 128, np.uint8)
    cv2.imwrite(str(mlts / "original image" / "a.png"), img)
    cv2.imwrite(str(mlts / "whole body" / "a.png"), 255 - img)
    # a RAW original whose mask also exists
    (mlts / "original image" / "b.arw").write_bytes(b"\x00" * 64)
    (mlts / "whole body" / "b.arw").write_bytes(b"\x00" * 64)

    before = len(loaders.SKIPPED_RAW_FILES)
    with pytest.warns(UserWarning, match=r"RAW file skipped"):
        ds = data.get_ml_training_set_data(
            "segmentation/composite", "mlts", str(tmp_path), 32, 0.0,
            organs=("whole_body",),
        )
    assert len(loaders.SKIPPED_RAW_FILES) > before
    assert any(p.endswith("b.arw") for p in loaders.SKIPPED_RAW_FILES)
    assert len(ds) == 1  # the readable sample still loads


def _write_synthetic_arw(path, img_bgr):
    """Minimal ARW-shaped file: a TIFF (II*\\0) whose IFD0 carries the classic
    JPEGInterchangeFormat/-Length (0x0201/0x0202) preview tag pair pointing at
    an embedded JPEG — the structure every camera-written .arw has."""
    import struct

    import cv2

    ok, jpg = cv2.imencode(".jpg", img_bgr)
    assert ok
    jpg = jpg.tobytes()
    # header(8) + IFD: count(2) + 2 entries(24) + next-ptr(4) -> jpeg at 38
    jpeg_off = 8 + 2 + 24 + 4
    buf = struct.pack("<2sHI", b"II", 42, 8)
    buf += struct.pack("<H", 2)
    buf += struct.pack("<HHII", 0x0201, 4, 1, jpeg_off)
    buf += struct.pack("<HHII", 0x0202, 4, 1, len(jpg))
    buf += struct.pack("<I", 0)  # no next IFD
    buf += jpg
    path.write_bytes(buf)


def test_arw_embedded_jpeg_preview_decodes(tmp_path):
    """Without rawpy, .arw files decode via their embedded TIFF JPEG preview
    instead of being skipped (reference fish_segmentation.py:17-24 decodes
    RAW originals; the preview holds the same demosaiced scene)."""
    import cv2

    from ecologysemanticsegmentation_tpu.data import loaders

    img = np.zeros((40, 48, 3), np.uint8)
    img[10:30, 12:36] = (20, 180, 240)
    arw = tmp_path / "scene.arw"
    _write_synthetic_arw(arw, img)

    out = loaders._imread(str(arw))
    assert out is not None and out.shape == (40, 48, 3)
    # JPEG round-trip tolerance
    assert abs(int(out[20, 20, 2]) - 240) < 20
    assert str(arw) not in loaders.SKIPPED_RAW_FILES

    # an .arw dataset loads end-to-end through the ml_training_set scanner
    mlts = tmp_path / "mlts" / "batch1"
    (mlts / "original image").mkdir(parents=True)
    (mlts / "whole body").mkdir(parents=True)
    _write_synthetic_arw(mlts / "original image" / "c.arw", img)
    cv2.imwrite(str(mlts / "whole body" / "c.png"), 255 - img)
    ds = data.get_ml_training_set_data(
        "segmentation/composite", "mlts", str(tmp_path), 32, 0.0,
        organs=("whole_body",),
    )
    assert len(ds) == 1
    image, mask, _ = ds[0]
    assert image.shape == (32, 32, 3) and np.isfinite(image).all()


def test_bbox_repair_output_is_consumed(fixture_root, tmp_path):
    """GT-repair pipeline end-to-end: rebuild_bbox_dataset output (the
    bbox_to_segmentation_gt layout) is loadable through FishDataset's
    bbox_dir plumbing (reference fish_segmentation.py:148-149)."""
    import cv2

    from ecologysemanticsegmentation_tpu.utils import rebuild_bbox_dataset

    root, registry = fixture_root

    # Build a crops dir from a synthetic sample: full image + cropped mask.
    full_dir = tmp_path / "full"
    crops_dir = tmp_path / "crops"
    full_dir.mkdir()
    crops_dir.mkdir()
    ds = data.get_synthetic_data(img_shape=96, organs=("whole_body",), num_samples=1,
                                 seed=3)
    img, mask, _ = ds[0]
    bgr = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
    cv2.imwrite(str(full_dir / "fishy.png"), bgr)
    ys, xs = np.where(mask[..., 0] > 0)
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    # ml_training_set convention: white background, dark foreground
    inv = 255 - (mask[..., 0] * 255).astype(np.uint8)
    cv2.imwrite(str(crops_dir / "fishy_mask.png"), inv[y0:y1, x0:x1])
    cv2.imwrite(str(crops_dir / "fishy_crop.png"), bgr[y0:y1, x0:x1])

    out_dir = os.path.join(root, "bbox_to_segmentation_gt")
    results = rebuild_bbox_dataset(str(full_dir), str(crops_dir), out_dir,
                                   organ="whole body")
    assert len(results) == 1

    base = data.FishDataset(
        ("segmentation/composite",), img_shape=96, organs=("whole_body",),
        split="train", registry=registry,
    )
    with_bbox = data.FishDataset(
        ("segmentation/composite",), img_shape=96, organs=("whole_body",),
        split="train", registry=registry, bbox_dir="bbox_to_segmentation_gt",
    )
    assert len(with_bbox) == len(base) + 1
    # the repaired folder is APPENDED to the scan, so the new sample lands at
    # the end of the source -> in the test split view; decode it from there
    test_view = data.FishDataset(
        ("segmentation/composite",), img_shape=96, organs=("whole_body",),
        split="test", registry=registry, bbox_dir="bbox_to_segmentation_gt",
    )
    imgs = [test_view[i] for i in range(len(test_view))]
    repaired = [x for x in imgs if "fishy" in x[2]]
    assert len(repaired) == 1
    _, seg, _ = repaired[0]
    ref_mask = cv2.resize(mask[..., 0], (96, 96), interpolation=cv2.INTER_NEAREST)
    inter = np.logical_and(seg[..., 0] > 0, ref_mask > 0).sum()
    union = np.logical_or(seg[..., 0] > 0, ref_mask > 0).sum()
    assert inter / max(union, 1) > 0.9  # realignment recovered the offset


def test_suim_loader_roundtrip(fixture_root):
    root, _ = fixture_root
    ds = data.get_suim_data("segmentation", "suim", root, 96, 0.0075)
    assert len(ds) == 8
    img, mask, _ = ds[0]
    assert mask.shape == (96, 96, 1)
    assert mask.sum() > 100  # HSV yellow range extracted the fish


def test_deepfish_loader_roundtrip(fixture_root):
    root, _ = fixture_root
    ds = data.get_deepfish_segclsloc_data("segmentation", "deepfish", root, 96, 0.0075)
    assert len(ds) == 8
    img, mask, _ = ds[0]
    assert mask.shape == (96, 96, 1)
    assert mask.sum() > 100


def test_deepfish_dirty_files_skipped_at_index_time(tmp_path):
    """The loaders' dirtiness contract: corrupt annotation JSON, malformed
    region structure, or an unreadable image are dropped when the index is
    built, never crash decode mid-epoch (reference deepfish loading parses
    json inside __getitem__ and would raise there)."""
    root = str(tmp_path)
    data.materialize_to_disk(root, num_samples=4, size=64)
    df = os.path.join(root, "deepfish")

    # corrupt json
    with open(os.path.join(df, "json", "s0__labels.json"), "w") as f:
        f.write("{not json")
    # structurally-malformed regions (points are not {x,y} dicts)
    with open(os.path.join(df, "json", "s1__labels.json"), "w") as f:
        f.write('{"labels": [{"regions": [[1, 2, 3, 4, 5, 6, 7]]}]}')
    # unreadable image
    with open(os.path.join(df, "s2.jpg"), "wb") as f:
        f.write(b"\x00" * 32)

    ds = data.get_deepfish_segclsloc_data("segmentation", "deepfish", root, 64, 0.0075)
    assert len(ds) == 1  # only s3 survives
    img, mask, path = ds[0]
    assert "s3" in path and mask.sum() > 0


def test_loader_masks_agree_across_formats(fixture_root):
    """The same synthetic fish must round-trip near-identically through the
    polygon (COCO) and mask-folder (mlts) formats."""
    root, _ = fixture_root
    coco = data.get_alvaradolab_data(
        "segmentation/composite", "coco", root, 96, 0.0075, organs=ORGANS3
    )
    mlts = data.get_ml_training_set_data(
        "segmentation/composite", "mlts", root, 96, 0.0075, organs=ORGANS3
    )
    # match by stem
    by_stem = {os.path.basename(p).split(".")[0]: i for i, (p, _) in enumerate(mlts.items)}
    _, m_coco, p_coco = coco[0]
    stem = os.path.basename(p_coco).split(".")[0]
    _, m_mlts, _ = mlts[by_stem[stem]]
    body_c, body_m = m_coco[..., 0] > 0, m_mlts[..., 0] > 0
    iou = (body_c & body_m).sum() / max((body_c | body_m).sum(), 1)
    assert iou > 0.85, f"cross-format IoU too low: {iou}"


def test_fish_dataset_splits(fixture_root):
    root, registry = fixture_root
    sizes = {}
    for split in ("train", "val", "test"):
        ds = data.FishDataset(
            dataset_type=("segmentation/composite", "segmentation"),
            img_shape=96,
            organs=ORGANS3,
            split=split,
            registry=registry,
        )
        sizes[split] = len(ds)
        if len(ds):
            img, mask, _ = ds[0]
            # binarization: positives exactly 1, ignore stays -1
            vals = set(np.unique(mask))
            assert vals.issubset({0.0, 1.0, -1.0})
    # 4 sources x 8 items; 85/5/10 contiguous split per source
    assert sizes["train"] == 4 * 6
    assert sizes["test"] == 4 * 2
    assert sizes["val"] == 0  # int(8*0.05) == 0, like the reference arithmetic


def test_batcher_drops_single_sample_batch():
    ds = data.get_synthetic_data(img_shape=64, organs=("whole_body",), num_samples=5)
    b = data.Batcher(ds, batch_size=2, shuffle=False)
    batches = list(b)
    assert len(batches) == 2  # 5 -> [2, 2], trailing 1 dropped
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert batches[0]["label"].shape == (2, 64, 64, 1)


def test_batcher_pad_final_reports_n_real():
    # 5 samples, batch 4, pad_final: batches are [4, 4(padded)] but n_real
    # must count distinct samples only (4 + 1) so metrics don't inflate.
    ds = data.get_synthetic_data(img_shape=32, organs=("whole_body",), num_samples=5)
    batches = list(data.Batcher(ds, 4, shuffle=False, pad_final=True))
    assert [b["image"].shape[0] for b in batches] == [4, 4]
    assert [b["n_real"] for b in batches] == [4, 1]
    assert sum(b["n_real"] for b in batches) == 5


def test_batcher_shuffle_deterministic():
    ds = data.get_synthetic_data(img_shape=32, organs=("whole_body",), num_samples=8)
    a = [b["paths"] for b in data.Batcher(ds, 4, shuffle=True, seed=3)]
    b = [b["paths"] for b in data.Batcher(ds, 4, shuffle=True, seed=3)]
    assert a == b


def test_augment_batch_shapes_and_mask_geometry():
    import jax

    ds = data.get_synthetic_data(img_shape=64, organs=ORGANS3, num_samples=4)
    batch = next(iter(data.Batcher(ds, 4, shuffle=False)))
    key = jax.random.PRNGKey(0)
    img, mask = data.augment_batch(key, batch["image"], batch["label"])
    assert img.shape == batch["image"].shape
    assert mask.shape == batch["label"].shape
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_augment_deterministic_per_key():
    import jax

    ds = data.get_synthetic_data(img_shape=32, organs=("whole_body",), num_samples=2)
    batch = next(iter(data.Batcher(ds, 2, shuffle=False)))
    k = jax.random.PRNGKey(5)
    a1, m1 = data.augment_batch(k, batch["image"], batch["label"])
    a2, m2 = data.augment_batch(k, batch["image"], batch["label"])
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_get_split_datasets_synthetic():
    cfg = EnvConfig(sample=True, img_size=48, organs=ORGANS3)
    train, val, test = data.get_split_datasets(cfg, synthetic=True)
    assert len(train) > 0 and len(test) > 0
    img, mask, _ = train[0]
    assert mask.shape == (48, 48, 3)


def test_coco_loader_edge_cases(tmp_path):
    """COCO-txt scanner: zero-area records skipped, unknown organs ignored,
    images without txt dropped, unreadable images dropped (reference
    fish_coco_annotator.py:44-49,70-76)."""
    import cv2

    d = tmp_path / "coco"
    d.mkdir()
    img = np.full((64, 64, 3), 120, np.uint8)
    cv2.imwrite(str(d / "a.jpg"), img)
    (d / "a.txt").write_text(
        "2\n\n64 64\n\n"
        "whole_body\n100.0\n10 10 50 10 50 50 10 50\n\n"
        "unknown_organ\n50.0\n1 1 5 1 5 5\n\n"
        "ventral_side\n0\n1 1 5 1 5 5\n"  # zero area -> skipped
    )
    cv2.imwrite(str(d / "no_txt.jpg"), img)  # no .txt pair
    (d / "bad.jpg").write_bytes(b"not a jpeg")
    (d / "bad.txt").write_text("0\n\n64 64\n")

    ds = data.get_alvaradolab_data(
        "segmentation/composite", "coco", str(tmp_path), 64, 0.0,
        organs=("whole_body", "ventral_side"),
    )
    assert len(ds) == 1
    _, mask, path = ds[0]
    assert path.endswith("a.jpg")
    assert mask[..., 0].max() == 1.0      # whole_body rasterized
    assert (mask[..., 1] == -1).all()     # ventral record had zero area -> absent -> ignore


def test_sample_flag_truncation(fixture_root):
    root, _ = fixture_root
    full = data.get_suim_data("segmentation", "suim", root, 64, 0.0)
    sampled = data.get_suim_data("segmentation", "suim", root, 64, 0.0, sample_dataset=True)
    assert len(sampled) <= min(len(full), 60)


def test_synthetic_decode_cached():
    ds = data.get_synthetic_data(img_shape=64, organs=("whole_body",), num_samples=2)
    a = ds[0]
    b = ds[0]
    assert a[0] is b[0]  # cached object identity
