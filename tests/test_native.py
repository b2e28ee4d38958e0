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
