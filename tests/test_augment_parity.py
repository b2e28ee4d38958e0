"""Tolerance-based augmentation parity tests (SURVEY.md §7 "Augmentation
fidelity").

albumentations is not installed in this image, so each op is checked against
an independent ground truth instead:

* geometric warps vs ``cv2.warpAffine`` / ``cv2.resize`` with the matching
  interpolation + border mode (cv2 is the engine albumentations itself uses),
* color conversions vs ``cv2.cvtColor``,
* analytic ops (gamma, brightness/contrast, tone curve, to-gray) vs their
  closed-form definitions (reference ``dataset/augment.py:22-75`` op list),
* mask semantics: label values must pass through geometry EXACTLY
  (albumentations warps masks with INTER_NEAREST).
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.data import augment as A


@pytest.fixture
def img(rng):
    return rng.rand(2, 64, 64, 3).astype(np.float32)


# ------------------------------------------------------------ mask semantics


def test_mask_values_exact_through_full_pipeline(rng):
    """After ANY combination of geometric ops, mask values stay exactly in
    {0, 1, -1} — the bilinear-mask bug dilated every rotated/cropped mask
    once the trainer binarized at >0."""
    imgs = rng.rand(8, 64, 64, 3).astype(np.float32)
    masks = rng.choice([0.0, 1.0, -1.0], size=(8, 64, 64, 3)).astype(np.float32)
    for seed in range(6):
        _, out = A.augment_batch(jax.random.PRNGKey(seed), jnp.asarray(imgs),
                                 jnp.asarray(masks))
        vals = np.unique(np.asarray(out))
        assert set(vals).issubset({0.0, 1.0, -1.0}), vals


def test_rotate_mask_matches_cv2_nearest(rng):
    """The nearest mask warp agrees with cv2.warpAffine(INTER_NEAREST,
    BORDER_REFLECT_101) up to coordinate-rounding ties on a real rotation."""
    mask = (rng.rand(48, 48) > 0.7).astype(np.float32)
    deg = 37.0
    ys, xs = A._rotate_coords(48, 48, jnp.float32(deg))
    ours = np.asarray(A._nearest_warp(jnp.asarray(mask)[None, ..., None], ys, xs))[0, ..., 0]

    # cv2 rotates "output <- input" with the inverse matrix convention;
    # getRotationMatrix2D(center, angle) maps input coords into output —
    # warpAffine then samples input at M^-1(output), which is exactly our
    # (cos*yc - sin*xc) source-coordinate form for angle=+deg in (y,x).
    m = cv2.getRotationMatrix2D(((48 - 1) / 2.0, (48 - 1) / 2.0), deg, 1.0)
    ref = cv2.warpAffine(mask, m, (48, 48), flags=cv2.INTER_NEAREST,
                         borderMode=cv2.BORDER_REFLECT_101)
    mismatch = np.mean(ours != ref)
    assert mismatch < 0.03, f"{mismatch:.4f} of pixels differ"


def test_image_rotate_matches_cv2_bilinear(rng):
    img = rng.rand(48, 48).astype(np.float32)
    deg = 23.0
    ys, xs = A._rotate_coords(48, 48, jnp.float32(deg))
    ours = np.asarray(
        A._bilinear_warp(jnp.asarray(img)[None, ..., None].astype(jnp.float32), ys, xs)
    )[0, ..., 0]
    m = cv2.getRotationMatrix2D(((48 - 1) / 2.0, (48 - 1) / 2.0), deg, 1.0)
    ref = cv2.warpAffine(img, m, (48, 48), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT_101)
    # interior pixels match bilinear exactly up to fp error; borders follow
    # the reflect handling
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=2e-2)


def test_hflip_is_exact(rng):
    imgs = rng.rand(4, 32, 32, 3).astype(np.float32)
    np.testing.assert_array_equal(imgs[:, :, ::-1], np.asarray(jnp.asarray(imgs)[:, :, ::-1]))


# ------------------------------------------------------------ color math


def test_rgb_hsv_roundtrip_matches_cv2(rng):
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    hsv = np.asarray(A._rgb_to_hsv(jnp.asarray(img)))[0]
    ref = cv2.cvtColor(img[0], cv2.COLOR_RGB2HSV)  # H in [0,360), S,V in [0,1]
    np.testing.assert_allclose(hsv[..., 0] * 360.0, ref[..., 0], atol=0.5)
    np.testing.assert_allclose(hsv[..., 1], ref[..., 1], atol=1e-3)
    np.testing.assert_allclose(hsv[..., 2], ref[..., 2], atol=1e-3)

    back = np.asarray(A._hsv_to_rgb(A._rgb_to_hsv(jnp.asarray(img))))
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_gamma_is_power_law(rng):
    x = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out = np.asarray(A._gamma(key, x))
    g = np.asarray(A._u(key, 3, 0.8, 1.2)).astype(np.float32)
    np.testing.assert_allclose(out, np.clip(np.asarray(x), 1e-6, 1) ** g, rtol=2e-2)


def test_brightness_contrast_formula(rng):
    x = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32))
    key = jax.random.PRNGKey(1)
    kb, kc = jax.random.split(key)
    out = np.asarray(A._brightness_contrast(key, x))
    alpha = np.asarray(A._u(kc, 3, -0.2, 0.2)).astype(np.float32)
    beta = np.asarray(A._u(kb, 3, -0.2, 0.2)).astype(np.float32)
    np.testing.assert_allclose(out, np.asarray(x) * (1 + alpha) + beta, atol=2e-2)


def test_to_gray_matches_cv2_weights(rng):
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    out = np.asarray(A._to_gray(None, jnp.asarray(img)))
    ref = cv2.cvtColor(img[0], cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(out[0, ..., 0], ref, atol=1e-3)
    np.testing.assert_allclose(out[0, ..., 0], out[0, ..., 1])


def test_tone_curve_bezier_properties(rng):
    """albumentations RandomToneCurve: monotone [0,1]->[0,1] with fixed
    endpoints. Check the quadratic-Bezier form keeps those invariants."""
    x = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32).reshape(1, 8, 8, 1))
    for seed in range(4):
        out = np.asarray(A._tone_curve(jax.random.PRNGKey(seed), x)).reshape(-1)
        assert out.min() >= -1e-3 and out.max() <= 1 + 1e-3
        assert np.all(np.diff(out) >= -1e-3)  # monotone
        assert abs(out[0]) < 1e-3 and abs(out[-1] - 1) < 2e-2  # endpoints


def test_channel_shuffle_is_permutation(rng):
    x = jnp.asarray(rng.rand(6, 8, 8, 3).astype(np.float32))
    out = np.asarray(A._channel_shuffle(jax.random.PRNGKey(3), x))
    for n in range(6):
        ours = {tuple(np.round(out[n, ..., c].ravel(), 5)) for c in range(3)}
        orig = {tuple(np.round(np.asarray(x)[n, ..., c].ravel(), 5)) for c in range(3)}
        assert ours == orig


# ------------------------------------------------------- distribution checks


def test_clahe_flattens_histogram(rng):
    """CLAHE (clip-limited global form): a low-contrast image's luminance
    spread must increase, and output stays in [0,1] after pipeline clip."""
    img = (0.4 + 0.1 * rng.rand(2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(A._clahe(jax.random.PRNGKey(0), jnp.asarray(img)))
    luma_in = img.mean(axis=-1)
    luma_out = np.clip(out, 0, 10).mean(axis=-1)
    assert luma_out.std() > 1.5 * luma_in.std()


def test_fancy_pca_shifts_along_eigvecs(rng):
    """FancyPCA adds a per-sample constant color shift: output - input must be
    spatially constant per sample."""
    x = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32))
    out = np.asarray(A._fancy_pca(jax.random.PRNGKey(5), x))
    delta = out - np.asarray(x)
    assert np.allclose(delta.std(axis=(1, 2)), 0, atol=1e-4)
    assert np.abs(delta).max() > 1e-4  # actually does something


def test_pipeline_marginal_rates(rng):
    """Over many seeds, the fraction of samples altered by the pipeline
    approaches the reference probability tree's activation rate (every sample
    has an independent-tail op with p=.7 CLAHE, so nearly all change)."""
    imgs = rng.rand(16, 32, 32, 3).astype(np.float32)
    masks = (rng.rand(16, 32, 32, 1) > 0.5).astype(np.float32)
    changed = 0
    total = 0
    for seed in range(8):
        out, _ = A.augment_batch(jax.random.PRNGKey(seed + 100), jnp.asarray(imgs),
                                 jnp.asarray(masks))
        changed += int(np.sum(np.abs(np.asarray(out) - imgs).max(axis=(1, 2, 3)) > 1e-3))
        total += 16
    assert changed / total > 0.85


def test_composed_warp_matches_sequential_ops(rng):
    """The single composed affine gather (round 5) equals applying crop, then
    hflip, then rotate as separate resamplings — up to the one-vs-two
    interpolation difference for images; masks (nearest, single rounding)
    are compared by mismatch fraction."""
    h = w = 64
    # smooth image + blocky mask: sequential resampling interpolates twice,
    # the composition once — they agree up to O(curvature * scale^2), so the
    # comparison needs band-limited inputs (white noise would diverge by O(1))
    img = np.kron(rng.rand(2, 8, 8, 3), np.ones((1, 8, 8, 1))).astype(np.float32)
    img = cv2.GaussianBlur(img.reshape(2 * h, w, 3), (9, 9), 3.0).reshape(2, h, w, 3)
    mask = np.kron(
        rng.choice([0.0, 1.0, -1.0], size=(2, 8, 8, 3)), np.ones((1, 8, 8, 1))
    ).astype(np.float32)
    top, left, ch, cw = 7.0, 11.0, 40.0, 48.0
    deg = 33.0
    t = jnp.bool_(True)

    ys, xs = A._composed_warp_coords(
        h, w, t, jnp.float32(top), jnp.float32(left), jnp.float32(ch),
        jnp.float32(cw), t, t, jnp.float32(deg))
    ours = np.asarray(A._bilinear_warp(jnp.asarray(img), ys, xs))
    ours_m = np.asarray(A._nearest_warp(jnp.asarray(mask), ys, xs))

    cys, cxs = A._crop_coords(h, w, top, left, ch, cw)
    step1 = A._bilinear_warp(jnp.asarray(img), cys, cxs)[:, :, ::-1]
    step1_m = A._nearest_warp(jnp.asarray(mask), cys, cxs)[:, :, ::-1]
    rys, rxs = A._rotate_coords(h, w, jnp.float32(deg))
    ref = np.asarray(A._bilinear_warp(step1, rys, rxs))
    ref_m = np.asarray(A._nearest_warp(step1_m, rys, rxs))

    # Compare where the rotation stays in-bounds: outside it the sequential
    # form reflects the cropped INTERMEDIATE while the composition reflects
    # the ORIGINAL source — a documented border-semantics deviation (both are
    # valid reflect101 augmentations).  In-bounds, the two differ only by
    # one-vs-two interpolations.
    valid = np.asarray(
        (rys >= 0) & (rys <= h - 1) & (rxs >= 0) & (rxs <= w - 1))
    valid = valid & (  # one-pixel erosion: skip straddling footprints
        np.roll(valid, 1, 0) & np.roll(valid, -1, 0)
        & np.roll(valid, 1, 1) & np.roll(valid, -1, 1))
    assert valid.mean() > 0.5  # the comparison actually covers the interior
    v = np.broadcast_to(valid[None, :, :, None], ours.shape)
    np.testing.assert_allclose(ours[v], ref[v], atol=0.08)
    assert np.mean(ours_m[v] != ref_m[v]) < 0.05
    assert set(np.unique(ours_m)).issubset({0.0, 1.0, -1.0})

    # gates off -> identity coordinates
    f = jnp.bool_(False)
    ys0, xs0 = A._composed_warp_coords(
        h, w, f, jnp.float32(top), jnp.float32(left), jnp.float32(ch),
        jnp.float32(cw), f, f, jnp.float32(deg))
    yy, xx = np.mgrid[:h, :w]
    np.testing.assert_allclose(np.asarray(ys0), yy, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xs0), xx, atol=1e-5)

    # flip-only composition is the exact reversal map
    ysf, xsf = A._composed_warp_coords(
        h, w, f, jnp.float32(top), jnp.float32(left), jnp.float32(ch),
        jnp.float32(cw), t, f, jnp.float32(deg))
    np.testing.assert_allclose(np.asarray(xsf), xx[:, ::-1], atol=1e-5)


def test_per_sample_variant_matches_singleton_calls(rng):
    """augment_batch_per_sample's definition: sample i == the shipped
    pipeline run on the singleton batch [i] with key split(key, B)[i]."""
    images = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(4, 32, 32, 3) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(3)
    out_i, out_m = A.augment_batch_per_sample(key, images, masks)
    keys = jax.random.split(key, 4)
    for i in range(4):
        ref_i, ref_m = A.augment_batch(keys[i], images[i:i + 1], masks[i:i + 1])
        np.testing.assert_array_equal(np.asarray(out_i[i]), np.asarray(ref_i[0]))
        np.testing.assert_array_equal(np.asarray(out_m[i]), np.asarray(ref_m[0]))


def test_per_sample_env_flag_selects_trainer_augment(monkeypatch):
    """AUGMENT_PER_SAMPLE=1 at import time routes the TRAINER's
    ``augment_batch`` binding to the per-sample pipeline (module re-import;
    jit caches are keyed per function object so the reload is isolated)."""
    import importlib

    from ecologysemanticsegmentation_tpu.data import augment as aug_mod
    from ecologysemanticsegmentation_tpu.train import trainer as trainer_mod

    monkeypatch.setenv("AUGMENT_PER_SAMPLE", "1")
    try:
        re_aug = importlib.reload(aug_mod)
        re_trainer = importlib.reload(trainer_mod)
        assert re_aug.PER_SAMPLE is True
        assert re_trainer.augment_batch is re_aug.augment_batch_per_sample
    finally:
        monkeypatch.delenv("AUGMENT_PER_SAMPLE")
        re_aug = importlib.reload(aug_mod)
        re_trainer = importlib.reload(trainer_mod)
    assert re_trainer.augment_batch is re_aug.augment_batch


def test_always_warp_flag_is_bitwise_identical(monkeypatch, rng):
    """AUGMENT_ALWAYS_WARP=1 removes the geometry ``lax.cond`` (the composed
    warp runs every step with gates folded into the affine).  The identity /
    flip-only affines are reproduced EXACTLY by the gathers (integer coords
    give frac=0, so v*1 + u*0 == v even in bf16) — the two forms must be
    bitwise identical over keys that cover fired and non-fired gates."""
    import importlib

    from ecologysemanticsegmentation_tpu.data import augment as aug_mod

    images = jnp.asarray(rng.rand(3, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray(
        rng.choice([0.0, 1.0, -1.0], size=(3, 32, 32, 3)).astype(np.float32))
    keys = [jax.random.PRNGKey(s) for s in range(12)]

    base = [aug_mod.augment_batch(k, images, masks) for k in keys]
    monkeypatch.setenv("AUGMENT_ALWAYS_WARP", "1")
    try:
        re_aug = importlib.reload(aug_mod)
        assert re_aug.ALWAYS_WARP is True
        flat = [re_aug.augment_batch(k, images, masks) for k in keys]
    finally:
        monkeypatch.delenv("AUGMENT_ALWAYS_WARP")
        re_aug = importlib.reload(aug_mod)
    assert re_aug.ALWAYS_WARP is False
    for (bi, bm), (fi, fm) in zip(base, flat):
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(fi))
        np.testing.assert_array_equal(np.asarray(bm), np.asarray(fm))
