"""Native host-ops (C++ via ctypes) tests, cross-checked against cv2/numpy."""

import numpy as np
import pytest

from ecologysemanticsegmentation_tpu.data import native


def test_native_builds_and_loads():
    assert native.native_available(), "g++ toolchain present but native lib failed to build"


def test_fill_polygon_matches_cv2():
    import cv2

    poly = np.array([[10, 10], [80, 20], [70, 80], [20, 70]], np.int32)
    ours = np.zeros((96, 96), np.uint8)
    native.fill_polygon(ours, poly)

    ref = np.zeros((96, 96), np.uint8)
    cv2.fillPoly(ref, [poly.reshape(-1, 1, 2)], 255)

    # rasterizers may differ on boundary pixels only
    diff = (ours != ref)
    interior = cv2.erode(ref, np.ones((3, 3), np.uint8))
    assert not (diff & (interior > 0)).any(), "interior pixels must match"
    assert diff.mean() < 0.02, f"boundary disagreement too large: {diff.mean()}"
    assert ours.sum() > 0


def test_fill_polygon_degenerate():
    ours = np.zeros((16, 16), np.uint8)
    native.fill_polygon(ours, np.array([[1, 1], [2, 2]], np.int32))  # < 3 pts
    if native.native_available():
        assert ours.sum() == 0


def test_resize_area_close_to_cv2():
    import cv2

    rng = np.random.RandomState(0)
    src = (rng.rand(64, 64) * 255).astype(np.uint8)
    ours = native.resize_area(src, (16, 16)).astype(np.int32)
    ref = cv2.resize(src, (16, 16), interpolation=cv2.INTER_AREA).astype(np.int32)
    assert np.abs(ours - ref).max() <= 2  # rounding differences only


def test_binarize_count():
    m = np.array([[0, 5], [200, 0]], np.uint8)
    count = native.binarize_count(m, 0)
    assert count == 2
    np.testing.assert_array_equal(m, [[0, 255], [255, 0]])


def test_u8_to_f32():
    img = np.array([0, 128, 255], np.uint8)
    out = native.u8_to_f32(img)
    np.testing.assert_allclose(out, [0.0, 128 / 255.0, 1.0], rtol=1e-6)
    assert out.dtype == np.float32


# ----------------------------------------------------------- JPEG fast path


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    if not native.jpeg_available():
        pytest.skip("native lib built without libjpeg")
    rng = np.random.RandomState(7)
    img = cv2.GaussianBlur(
        rng.randint(0, 256, (233, 347, 3), np.uint8), (7, 7), 3)
    path = str(tmp_path_factory.mktemp("jpeg") / "img.jpg")
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return path


def test_jpeg_read_resize_matches_cv2_pair(jpeg_file):
    import cv2

    ours = native.jpeg_read_resize(jpeg_file, (128, 96))
    ref = cv2.resize(cv2.imread(jpeg_file), (96, 128))  # cv2 takes (w, h)
    assert ours.shape == ref.shape == (128, 96, 3)
    # Same IDCT family; bilinear rounding differs by the documented ±2 LSB
    # tolerance class (data/imops.py:12-16, native/hostops.cpp).
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_jpeg_decode_resize_buffer_equals_file(jpeg_file):
    with open(jpeg_file, "rb") as f:
        buf = f.read()
    from_buf = native.jpeg_decode_resize(buf, (64, 64))
    from_file = native.jpeg_read_resize(jpeg_file, (64, 64))
    np.testing.assert_array_equal(from_buf, from_file)


def test_jpeg_fast_scale_mode_decodes(jpeg_file):
    # DCT-domain prescale is a perf mode with different pixels (documented);
    # assert it decodes and stays in the same image neighborhood.
    exact = native.jpeg_read_resize(jpeg_file, (64, 64))
    fast = native.jpeg_read_resize(jpeg_file, (64, 64), fast_scale_to=64)
    assert fast is not None
    assert np.abs(fast.astype(int) - exact.astype(int)).mean() < 16


def test_jpeg_read_resize_bad_inputs(jpeg_file):
    assert native.jpeg_read_resize("/nonexistent/file.jpg", (32, 32)) is None
    assert native.jpeg_decode_resize(b"not a jpeg at all", (32, 32)) is None


def test_decode_ring_epoch_submit_up_front(jpeg_file):
    import cv2

    ref = cv2.resize(cv2.imread(jpeg_file), (80, 80))
    with native.DecodeRing((80, 80), capacity=4, n_threads=2) as ring:
        seqs = [ring.submit(jpeg_file) for _ in range(12)]  # >> capacity
        bad = ring.submit("/nonexistent.jpg")
        outs = [ring.get(s) for s in seqs]  # consumed in submit order
        assert ring.get(bad) is None
    for out in outs:
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_decode_ring_close_with_pending_jobs(jpeg_file):
    ring = native.DecodeRing((32, 32), capacity=2, n_threads=1)
    seqs = [ring.submit(jpeg_file) for _ in range(8)]
    assert ring.get(seqs[0]) is not None
    ring.close()  # must drain + join without hanging
    ring.close()  # idempotent


@pytest.fixture(scope="module")
def png_file(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    if not native.png_available():
        pytest.skip("native lib built without libpng")
    rng = np.random.RandomState(11)
    img = cv2.GaussianBlur(
        rng.randint(0, 256, (181, 233, 3), np.uint8), (5, 5), 2)
    path = str(tmp_path_factory.mktemp("png") / "img.png")
    cv2.imwrite(path, img)
    return path


def test_image_read_resize_png_matches_cv2(png_file):
    import cv2

    ours = native.image_read_resize(png_file, (96, 128))
    ref = cv2.resize(cv2.imread(png_file), (128, 96))
    assert ours.shape == ref.shape == (96, 128, 3)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
    # sniffed by magic bytes, so JPEGs flow through the same entry
    assert native.ring_extensions() == (".jpg", ".jpeg", ".png")


def test_decode_ring_handles_png(png_file):
    import cv2

    ref = cv2.resize(cv2.imread(png_file), (64, 64))
    with native.DecodeRing((64, 64), capacity=2, n_threads=1) as ring:
        out = ring.get(ring.submit(png_file))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_loader_native_flag_covers_png(png_file, monkeypatch):
    from ecologysemanticsegmentation_tpu.data import loaders

    baseline = loaders._read_resized(png_file, 64)
    monkeypatch.setattr(loaders, "NATIVE_JPEG", True)
    fused = loaders._read_resized(png_file, 64)
    assert np.abs(fused.astype(int) - baseline.astype(int)).max() <= 2


def test_decode_ring_use_after_close_raises(jpeg_file):
    ring = native.DecodeRing((32, 32), capacity=2, n_threads=1)
    seq = ring.submit(jpeg_file)
    assert ring.get(seq) is not None
    ring.close()
    with pytest.raises(RuntimeError, match="closed"):
        ring.submit(jpeg_file)
    with pytest.raises(RuntimeError, match="closed"):
        ring.get(seq)


def test_load_keeps_existing_lib_when_rebuild_fails(monkeypatch):
    """A stale-source rebuild attempt that fails (no g++ on the host) must
    fall back to loading the existing .so, not degrade to the slow path."""
    if not native.native_available():
        pytest.skip("native lib unavailable")

    def no_toolchain(*a, **k):
        raise FileNotFoundError("g++ not found")

    orig_lib, orig_tried = native._lib, native._tried
    try:
        native._lib, native._tried = None, False
        monkeypatch.setattr(native.subprocess, "run", no_toolchain)
        # make the source look newer than the built library
        monkeypatch.setattr(
            native.os.path, "getmtime",
            lambda p: 0.0 if p.endswith(".so") else 1.0)
        lib = native._load()
        assert lib is not None
    finally:
        native._lib, native._tried = orig_lib, orig_tried


def test_loader_native_jpeg_flag(jpeg_file, monkeypatch):
    from ecologysemanticsegmentation_tpu.data import loaders

    baseline = loaders._read_resized(jpeg_file, 64)
    monkeypatch.setattr(loaders, "NATIVE_JPEG", True)
    fused = loaders._read_resized(jpeg_file, 64)
    assert np.abs(fused.astype(int) - baseline.astype(int)).max() <= 2
    # non-JPEG paths fall back to the generic reader under the flag
    assert loaders._read_resized("/nonexistent.png", 64) is None
