"""Tile-adaptive CLAHE: kernel-vs-reference, numpy oracle, cv2 similarity.

The shipped global CLAHE is a documented approximation of albumentations'
``A.CLAHE`` (8x8 tiles, bilinear LUT interpolation — reference
``dataset/augment.py:22-90``).  ``AUGMENT_TILED_CLAHE=1`` enables the
tile-adaptive form; these tests pin its semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ecologysemanticsegmentation_tpu.data.augment as A
from ecologysemanticsegmentation_tpu.ops.pallas.clahe_tiled import (
    BINS,
    _apply_reference,
    tile_weights,
    tiled_clahe_new_luma,
)


def _mk_luma(b=2, h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    # smooth gradient + local texture so tiles genuinely differ
    yy, xx = np.mgrid[:h, :w]
    base = (yy / h * 0.6 + xx / w * 0.3)[None]
    tex = rng.rand(b, h, w) * 0.25
    return np.clip(base + tex, 0.0, 1.0).astype(np.float32)


def _mk_deltas(b=2, t=8, seed=1):
    rng = np.random.RandomState(seed)
    hist = rng.rand(b, t, t, BINS).astype(np.float32) + 0.1
    cdf = np.cumsum(hist, axis=-1)
    cdf /= cdf[..., -1:]
    return np.diff(cdf, axis=-1, prepend=np.zeros((b, t, t, 1), np.float32))


def test_kernel_matches_jnp_reference_interpret():
    luma, deltas = jnp.asarray(_mk_luma()), jnp.asarray(_mk_deltas())
    out_k = np.asarray(tiled_clahe_new_luma(luma, deltas, 8, interpret=True))
    wy = jnp.asarray(tile_weights(64, 8))
    wx = jnp.asarray(tile_weights(64, 8))
    gx = jnp.einsum("btsk,xs->bktx", deltas, wx)
    out_r = np.asarray(_apply_reference(luma, gx, wy))
    np.testing.assert_allclose(out_k, out_r, atol=2e-5)


def test_reference_matches_pointwise_numpy_oracle():
    """The einsum/step-function formulation == direct per-pixel 4-neighbor
    LUT interpolation (independent scalar transcription of cv2's scheme)."""
    b, h, w, t = 1, 32, 32, 4
    luma = _mk_luma(b, h, w)
    deltas = _mk_deltas(b, t)
    cdf = np.cumsum(deltas, axis=-1)  # (b,t,t,BINS) per-tile LUT
    ts_y, ts_x = h / t, w / t
    expected = np.zeros((b, h, w), np.float32)
    for y in range(h):
        fy = (y + 0.5) / ts_y - 0.5
        y0 = int(np.floor(fy))
        wy1 = fy - y0
        y0c, y1c = np.clip([y0, y0 + 1], 0, t - 1)
        if y0 < 0:
            y0c = y1c = 0
            wy1 = 0.0
        if y0 >= t - 1:
            y0c = y1c = t - 1
            wy1 = 0.0
        for x in range(w):
            fx = (x + 0.5) / ts_x - 0.5
            x0 = int(np.floor(fx))
            wx1 = fx - x0
            x0c, x1c = np.clip([x0, x0 + 1], 0, t - 1)
            if x0 < 0:
                x0c = x1c = 0
                wx1 = 0.0
            if x0 >= t - 1:
                x0c = x1c = t - 1
                wx1 = 0.0
            k = min(int(np.floor(luma[0, y, x] * (BINS - 1))), BINS - 1)
            v = ((1 - wy1) * (1 - wx1) * cdf[0, y0c, x0c, k]
                 + (1 - wy1) * wx1 * cdf[0, y0c, x1c, k]
                 + wy1 * (1 - wx1) * cdf[0, y1c, x0c, k]
                 + wy1 * wx1 * cdf[0, y1c, x1c, k])
            expected[0, y, x] = v
    got = np.asarray(tiled_clahe_new_luma(
        jnp.asarray(luma), jnp.asarray(deltas), t, use_pallas=False))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_tiled_clahe_tracks_cv2():
    """End-to-end _clahe_tiled luminance vs cv2.createCLAHE on the same
    uint8 luminance (tolerance: 32 vs 256 bins, luma-scale application)."""
    import cv2

    h = w = 64
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[:h, :w]
    img = np.clip(
        (yy / h * 0.7)[..., None] + rng.rand(h, w, 3) * 0.2, 0, 1
    ).astype(np.float32)
    # fixed clip limit for comparability: monkey-free — draw the same value
    key = jax.random.PRNGKey(0)
    clip = float(jax.random.uniform(key, (1, 1, 1), minval=1.0, maxval=4.0)[0, 0, 0])

    out = np.asarray(A._clahe_tiled(key, jnp.asarray(img[None])))[0]
    luma_in = np.clip(img @ np.array([0.299, 0.587, 0.114]), 0, 1)
    luma_out = np.clip(out @ np.array([0.299, 0.587, 0.114]), 0, 1)

    ref8 = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8)).apply(
        (luma_in * 255).astype(np.uint8)).astype(np.float32) / 255.0

    # both should equalize in the same direction; demand close agreement
    err = np.abs(luma_out - ref8)
    assert err.mean() < 0.06, err.mean()
    corr = np.corrcoef(luma_out.ravel(), ref8.ravel())[0, 1]
    assert corr > 0.97, corr


def test_pipeline_flag_switches_to_tiled(monkeypatch):
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(2, 64, 64, 1) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(7)
    base, mask_a = A.augment_batch(key, imgs, masks)
    monkeypatch.setattr(A, "TILED_CLAHE", True)
    A.augment_batch.clear_cache()
    try:
        tiled, mask_b = A.augment_batch(key, imgs, masks)
    finally:
        A.augment_batch.clear_cache()
    # same RNG stream: geometry identical (masks bit-equal), photometrics
    # differ only via the CLAHE branch
    np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))
    tiled = np.asarray(tiled, np.float32)
    assert tiled.shape == np.asarray(base).shape
    assert np.isfinite(tiled).all()
    assert tiled.min() >= 0.0 and tiled.max() <= 1.0


def test_non_divisible_sizes_fall_back_to_global():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 24, 24, 3).astype(np.float32))
    key = jax.random.PRNGKey(1)
    np.testing.assert_array_equal(
        np.asarray(A._clahe_tiled(key, x)), np.asarray(A._clahe(key, x)))
