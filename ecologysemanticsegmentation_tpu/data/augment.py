"""Device-side augmentation pipeline (jnp, fully batched, jit-able).

TPU-native rebuild of the reference's host-side albumentations pipeline
(reference ``dataset/augment.py:22-90``).  The reference decodes + augments
per-sample in DataLoader worker processes — its known bottleneck (OOM notes at
``fish_coco_annotator.py:166-172``).  Here the whole pipeline is a pure
function of a PRNG key fused into the jitted train step.

Probability tree mirrors the reference:

* outer ``p=0.7`` gate over [ OneOf{defocus, gaussian-blur, zoom-blur, fog}
  (p=.4) → OneOf{color-jitter, brightness-contrast, gamma, emboss} (p=.4) →
  random-resized-crop (p=.3) → hflip (.5) → FancyPCA (.3) → channel-shuffle
  (.5) → to-gray (.3) ],
* independent: HSV shift (p=.4), CLAHE (p=.7), joint rotate 0-90° (p=.4,
  reference ``Arotate`` ``augment.py:77-90``), tone curve (p=.5).

Geometric ops (crop/flip/rotate) are joint over image+mask; photometric ops
touch the image only.  Masks are warped with NEAREST interpolation
(albumentations' mask semantics), so label values stay exactly in
{0, 1, −1} through every geometric op.

Performance design (measured: a per-sample vmapped version of this pipeline
ran at 852 ms/step for batch 64@256 on v5e vs 13.8 ms for the bare model —
this rewrite exists to close that gap):

* every op runs on the whole NHWC batch; per-sample randomness enters as
  ``(B,1,1,1)`` parameter tensors and ``where`` selects — pure VPU work,
* RGB↔HSV is vectorized channel math (the vmapped-per-pixel version compiled
  to enormous select chains),
* geometric ops (rotate, resized-crop, hflip) use **batch-uniform** parameters so
  the bilinear gather has indices shared across the batch — one
  ``x[:, yi, xi]`` gather moving contiguous (B, C) blocks per index instead
  of 64 divergent per-sample gathers — and **batch-uniform gates**; since
  round 5 the three ops are COMPOSED into one affine and applied as ONE warp
  under ONE ``lax.cond`` (see :func:`augment_batch` docstring for the
  marginal-preserving gate hoisting), so a step pays at most one resampling
  and one cond boundary; the OneOf blocks dispatch ONE branch via
  ``lax.switch`` (computing all four then selecting measured ~3x the winning
  branch's cost).  Documented deviation: the reference draws these per
  *sample*; here per *batch* (fresh draws every step, so per-image marginals
  over an epoch match),
* channel shuffle is a (B,3,3) permutation-matrix einsum (MXU),
* CLAHE builds its histogram from a 4× subsampled luminance via a one-hot
  reduction and applies the LUT with ``take_along_axis`` on a 32-entry table,
* zoom blur is a pyramid of static center-crop resizes (banded-matrix
  einsums via :func:`..ops.resize.resize_bilinear`).

Remaining documented approximations (parity is tolerance-based per
SURVEY.md §7): fog uses a low-frequency noise field instead of rasterized
circles; CLAHE is clip-limited *global* (not tile-adaptive) equalization —
``AUGMENT_TILED_CLAHE=1`` swaps in the cv2-semantics 8x8-tile form
(:func:`_clahe_tiled`, Pallas apply kernel, +0.9 ms/step measured); tone
curve is a single-control-point quadratic Bezier.  Parameter granularity is
per-BATCH by default (A/B'd quality-equivalent, RESULTS.md round 3);
``AUGMENT_PER_SAMPLE=1`` selects :func:`augment_batch_per_sample` — the
reference's per-sample granularity with the same op math.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)

# AUGMENT_TILED_CLAHE=1 selects the tile-adaptive CLAHE (_clahe_tiled:
# cv2/albumentations 8x8-tile semantics via a Pallas apply kernel) instead
# of the default clip-limited global form.  Read at trace time — flip it
# before the first augment_batch call (tests use .clear_cache()).
TILED_CLAHE = os.environ.get("AUGMENT_TILED_CLAHE", "0").lower() not in (
    "0", "", "false")

# AUGMENT_ALWAYS_WARP=1 removes the remaining geometry lax.cond and applies
# the composed warp EVERY step (non-fired gates fold the affine to identity,
# which the bilinear/nearest gathers reproduce exactly — integer coords give
# frac=0, so v*1 + u*0 == v even in bf16; bitwise-equality test in
# tests/test_augment_parity.py).  MEASURED SLOWER on the v5e (round 5,
# experiments/r4_residual.jsonl *_r5ab rows: cond 69.35 ms vs always-warp
# 70.73 ms at batch 128 @ 256px): the hypothesis was that dropping the
# cond's ~0.43 ms of boundary copies + its fusion barrier would repay the
# ~0.72 ms sometimes-skipped warp, but the unconditional gather costs more
# than the cond it replaces.  The cond form stays the default; the knob
# stays as the one-env-var re-measurement for other backends.  Read at
# trace time, like AUGMENT_TILED_CLAHE.
ALWAYS_WARP = os.environ.get("AUGMENT_ALWAYS_WARP", "0").lower() not in (
    "0", "", "false")


# --------------------------------------------------------------- conv helpers


def _depthwise_conv(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """x NHWC, kernel (kh, kw) static. SAME padding, per-channel."""
    c = x.shape[-1]
    k = jnp.broadcast_to(jnp.asarray(kernel)[:, :, None, None], kernel.shape + (1, c))
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _disk_kernel(radius: int) -> np.ndarray:
    n = 2 * radius + 1
    yy, xx = np.mgrid[:n, :n] - radius
    k = (yy**2 + xx**2 <= radius**2).astype(np.float32)
    return k / k.sum()


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    r = size // 2
    yy, xx = np.mgrid[:size, :size] - r
    k = np.exp(-(yy**2 + xx**2) / (2.0 * sigma**2)).astype(np.float32)
    return k / k.sum()


# --------------------------------------------------------- geometric sampling


def _reflect101(x: jax.Array, n: int) -> jax.Array:
    period = 2 * (n - 1) if n > 1 else 1
    x = jnp.abs(x) % period
    return jnp.where(x >= n, period - x, x)


def _bilinear_warp(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample NHWC batch at float coords (H, W) SHARED across the batch,
    reflect101 border.  The shared-index gather is the TPU-friendly form."""
    h, w = x.shape[1:3]
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    wy = (ys - y0f)[None, :, :, None]
    wx = (xs - x0f)[None, :, :, None]

    wy = wy.astype(x.dtype)
    wx = wx.astype(x.dtype)

    def at(yi, xi):
        yi = _reflect101(yi.astype(jnp.int32), h)
        xi = _reflect101(xi.astype(jnp.int32), w)
        return x[:, yi, xi]

    top = at(y0f, x0f) * (1 - wx) + at(y0f, x0f + 1) * wx
    bot = at(y0f + 1, x0f) * (1 - wx) + at(y0f + 1, x0f + 1) * wx
    return top * (1 - wy) + bot * wy


def _nearest_warp(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Nearest-neighbor variant of :func:`_bilinear_warp` for MASKS
    (albumentations warps masks with ``cv2.INTER_NEAREST`` — bilinear would
    soften edges and blend the −1 ignore sentinels into invalid values;
    after the trainer's ``>0`` binarize that dilates every mask).  Label
    values pass through exactly."""
    h, w = x.shape[1:3]
    yi = _reflect101(jnp.round(ys).astype(jnp.int32), h)
    xi = _reflect101(jnp.round(xs).astype(jnp.int32), w)
    return x[:, yi, xi]


def _rotate_coords(h: int, w: int, degrees: jax.Array):
    """Source coords that rotate the image counterclockwise by ``degrees``
    (the cv2/albumentations convention: warpAffine with
    getRotationMatrix2D(center, +deg) samples src at R(-deg)·out)."""
    theta = jnp.deg2rad(degrees)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[:h, :w]
    yc, xc = yy - cy, xx - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    return cos * yc + sin * xc + cy, -sin * yc + cos * xc + cx


def _crop_coords(h: int, w: int, top, left, ch, cw):
    oy = jnp.arange(h, dtype=jnp.float32)
    ox = jnp.arange(w, dtype=jnp.float32)
    src_y = top + (oy + 0.5) * ch / h - 0.5
    src_x = left + (ox + 0.5) * cw / w - 0.5
    return (
        jnp.broadcast_to(src_y[:, None], (h, w)),
        jnp.broadcast_to(src_x[None, :], (h, w)),
    )


# ------------------------------------------------------------ color utilities


def _rgb_to_hsv(img: jax.Array) -> jax.Array:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    conds = [i == k for k in range(6)]
    r = jnp.select(conds, [v, q, p, p, t, v])
    g = jnp.select(conds, [t, v, v, q, p, p])
    b = jnp.select(conds, [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _luma(img: jax.Array) -> jax.Array:
    return jnp.einsum("nhwc,c->nhw", img, jnp.asarray(_LUMA, img.dtype))


# ------------------------------------------------------------- the transforms
# All take (key, batch NHWC) and return the transformed batch; per-sample
# randomness is (B,1,1,1)-shaped.


def _u(key, b, lo, hi):
    # bf16 so per-sample parameters don't promote the image math to f32
    return jax.random.uniform(key, (b, 1, 1, 1), minval=lo, maxval=hi).astype(jnp.bfloat16)


def _defocus(key, x):
    del key
    return _depthwise_conv(x, _disk_kernel(3))


def _gauss_blur(key, x):
    del key
    return _depthwise_conv(x, _gaussian_kernel(3, 0.2 + 1e-3))


def _zoom_blur(key, x):
    del key
    h, w = x.shape[1:3]
    acc = x
    for factor in (1.03, 1.06, 1.09, 1.11):
        ch, cw = int(round(h / factor)), int(round(w / factor))
        top, left = (h - ch) // 2, (w - cw) // 2
        crop = x[:, top : top + ch, left : left + cw]
        acc = acc + resize_bilinear(crop, (h, w))
    return acc / 5.0


def _fog(key, x):
    b, h, w, _ = x.shape
    k1, k2 = jax.random.split(key)
    coef = _u(k1, b, 0.3, 1.0)
    field = jax.random.uniform(k2, (b, max(h // 16, 1), max(w // 16, 1), 1))
    field = resize_bilinear(field, (h, w))
    alpha = coef * 0.6 * field
    return x * (1 - alpha) + alpha


def _color_jitter(key, x):
    b = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    bright = _u(kb, b, 0.6, 1.4)
    contr = _u(kc, b, 0.6, 1.4)
    sat = _u(ks, b, 0.6, 1.4)
    hshift = jax.random.uniform(kh, (b, 1, 1), minval=-0.4, maxval=0.4).astype(x.dtype)
    x = x * bright
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * contr + mean
    luma = _luma(x)[..., None]
    x = (x - luma) * sat + luma
    hsv = _rgb_to_hsv(jnp.clip(x, 0, 1))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hshift) % 1.0)
    return _hsv_to_rgb(hsv)


def _brightness_contrast(key, x):
    b = x.shape[0]
    kb, kc = jax.random.split(key)
    return x * (1.0 + _u(kc, b, -0.2, 0.2)) + _u(kb, b, -0.2, 0.2)


def _gamma(key, x):
    g = _u(key, x.shape[0], 0.8, 1.2)
    return jnp.power(jnp.clip(x, 1e-6, 1.0), g)


_EMBOSS_K = np.array([[-1.0, -1.0, 0.0], [-1.0, 1.0, 1.0], [0.0, 1.0, 1.0]], np.float32)


def _emboss(key, x):
    b = x.shape[0]
    ka, ks = jax.random.split(key)
    alpha = _u(ka, b, 0.3, 0.6)
    strength = _u(ks, b, 0.3, 0.7)
    embossed = _depthwise_conv(x, _EMBOSS_K) * strength + 0.5
    return x * (1 - alpha) + embossed * alpha


def _eigh3x3(a: jax.Array):
    """Closed-form symmetric 3x3 eigendecomposition, batched: (B,3,3) f32 ->
    (eigval (B,3) ascending, eigvec (B,3,3) columns).

    ``jnp.linalg.eigh`` lowers to an iterative loop nest; the trigonometric
    form (Smith 1961) is a handful of fused elementwise ops.  Eigenvectors
    come from the largest cross product of rows of ``A - lambda I`` (safe for
    augmentation use; near-isotropic covariances fall back toward axis
    vectors via the epsilon guards)."""
    q = jnp.trace(a, axis1=-2, axis2=-1)[:, None, None] / 3.0
    p1 = a[:, 0, 1] ** 2 + a[:, 0, 2] ** 2 + a[:, 1, 2] ** 2
    aq = a - q * jnp.eye(3)
    p2 = (aq[:, 0, 0] ** 2 + aq[:, 1, 1] ** 2 + aq[:, 2, 2] ** 2) + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-20))[:, None, None]
    bm = aq / p
    r = (
        bm[:, 0, 0] * (bm[:, 1, 1] * bm[:, 2, 2] - bm[:, 1, 2] * bm[:, 2, 1])
        - bm[:, 0, 1] * (bm[:, 1, 0] * bm[:, 2, 2] - bm[:, 1, 2] * bm[:, 2, 0])
        + bm[:, 0, 2] * (bm[:, 1, 0] * bm[:, 2, 1] - bm[:, 1, 1] * bm[:, 2, 0])
    ) / 2.0
    phi = jnp.arccos(jnp.clip(r, -1.0, 1.0)) / 3.0
    q1, p1d = q[:, 0, 0], p[:, 0, 0]
    lam_hi = q1 + 2.0 * p1d * jnp.cos(phi)
    lam_lo = q1 + 2.0 * p1d * jnp.cos(phi + 2.0 * np.pi / 3.0)
    lam_mid = 3.0 * q1 - lam_hi - lam_lo
    eigval = jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)  # ascending

    def vec(lam):
        m = a - lam[:, None, None] * jnp.eye(3)
        c01 = jnp.cross(m[:, 0], m[:, 1])
        c02 = jnp.cross(m[:, 0], m[:, 2])
        c12 = jnp.cross(m[:, 1], m[:, 2])
        n01 = jnp.sum(c01 * c01, -1, keepdims=True)
        n02 = jnp.sum(c02 * c02, -1, keepdims=True)
        n12 = jnp.sum(c12 * c12, -1, keepdims=True)
        v = jnp.where(n01 >= jnp.maximum(n02, n12), c01,
                      jnp.where(n02 >= n12, c02, c12))
        return v / jnp.sqrt(jnp.maximum(
            jnp.sum(v * v, -1, keepdims=True), 1e-20))

    eigvec = jnp.stack([vec(eigval[:, i]) for i in range(3)], axis=-1)  # columns
    return eigval, eigvec


def _fancy_pca(key, x, alpha_std=0.35):
    b = x.shape[0]
    flat = x.reshape(b, -1, 3)
    mean = flat.astype(jnp.float32).mean(axis=1, keepdims=True)
    centered = flat - mean.astype(flat.dtype)
    cov = jnp.einsum("npc,npd->ncd", centered, centered,
                     preferred_element_type=jnp.float32) / flat.shape[1]
    cov = cov + 1e-6 * jnp.eye(3)
    eigval, eigvec = _eigh3x3(cov)  # (B,3), (B,3,3)
    alphas = jax.random.normal(key, (b, 3)) * alpha_std
    delta = jnp.einsum("ncd,nd->nc", eigvec, alphas * eigval)
    return x + delta[:, None, None, :].astype(x.dtype)


_PERMS3 = np.array(
    [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]], np.int32
)
_PERM_MATS = np.stack([np.eye(3, dtype=np.float32)[p] for p in _PERMS3])  # (6,3,3)


def _channel_shuffle(key, x):
    b = x.shape[0]
    idx = jax.random.randint(key, (b,), 0, 6)
    pmats = jnp.asarray(_PERM_MATS, x.dtype)[idx]  # (B,3,3)
    # Explicit 9-FMA broadcast form: a batched matmul with K=3 lowers to a
    # layout-hostile tiny dot_general; as compare-free elementwise FMAs it
    # fuses into the surrounding photometric chain.
    cols = [
        sum(x[..., c] * pmats[:, None, None, c, d] for c in range(3))
        for d in range(3)
    ]
    return jnp.stack(cols, axis=-1)


def _to_gray(key, x):
    del key
    return jnp.broadcast_to(_luma(x)[..., None], x.shape)


def _hsv_shift(key, x):
    b = x.shape[0]
    kh, ks, kv = jax.random.split(key, 3)
    dh = (jax.random.uniform(kh, (b, 1, 1), minval=-60, maxval=60) / 180.0).astype(x.dtype)
    ds = (jax.random.uniform(ks, (b, 1, 1), minval=-60, maxval=60) / 255.0).astype(x.dtype)
    dv = (jax.random.uniform(kv, (b, 1, 1), minval=-30, maxval=30) / 255.0).astype(x.dtype)
    hsv = _rgb_to_hsv(jnp.clip(x, 0, 1))
    hsv = jnp.stack(
        [
            (hsv[..., 0] + dh) % 1.0,
            jnp.clip(hsv[..., 1] + ds, 0, 1),
            jnp.clip(hsv[..., 2] + dv, 0, 1),
        ],
        axis=-1,
    )
    return _hsv_to_rgb(hsv)


_CLAHE_BINS = 32


def _clahe(key, x):
    b, h, w, _ = x.shape
    clip_limit = jax.random.uniform(key, (b, 1), minval=1.0, maxval=4.0)
    luma = jnp.clip(_luma(jnp.clip(x, 0, 1)), 0.0, 1.0)
    # histogram from 4x-subsampled luminance via one-hot reduction
    ds = luma[:, ::4, ::4].reshape(b, -1)
    n = ds.shape[1]
    idx = jnp.clip((ds * (_CLAHE_BINS - 1)).astype(jnp.int32), 0, _CLAHE_BINS - 1)
    one_hot = (idx[..., None] == jnp.arange(_CLAHE_BINS)).astype(jnp.float32)
    hist = one_hot.sum(axis=1)  # (B, bins)
    cap = clip_limit * n / _CLAHE_BINS
    excess = jnp.sum(jnp.maximum(hist - cap, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, cap) + excess / _CLAHE_BINS
    cdf = jnp.cumsum(hist, axis=1) / n  # (B, bins), monotone to ~1
    # Piecewise-constant LUT application as a fused step-function sum:
    # cdf[idx] = cdf[0] + sum_k (cdf[k]-cdf[k-1]) * 1{idx >= k}.  Each term is
    # an elementwise compare-FMA with a (B,1,1) broadcast, so XLA fuses the
    # whole LUT into ONE pass over the luminance — no per-element gather (a
    # take_along_axis here measured 38 ms) and no materialized one-hot
    # (B, H*W, 32) tensor (~540 MB at batch 128, ~2 ms of HBM traffic).
    idx = jnp.clip(
        (luma * (_CLAHE_BINS - 1)).astype(jnp.int32), 0, _CLAHE_BINS - 1
    )[..., None]  # (B,H,W,1) compare operand
    deltas = jnp.diff(cdf, axis=1, prepend=jnp.zeros((b, 1), cdf.dtype))  # (B,bins)
    new_luma = jnp.zeros((b, h, w), jnp.float32)
    for k in range(_CLAHE_BINS):
        new_luma = new_luma + deltas[:, k, None, None] * (idx[..., 0] >= k)
    scale = new_luma / jnp.maximum(luma.astype(jnp.float32), 1e-6)
    return x * scale[..., None].astype(x.dtype)


_CLAHE_TILES = 8
# 64 bins for the tiled form: per-tile LUTs see far fewer samples than the
# global histogram, and the finer staircase is what closes the gap to cv2's
# 256-bin output (measured corr 0.96 @ 32 bins -> 0.98 @ 64,
# tests/test_clahe_tiled.py).
_CLAHE_TILED_BINS = 64


def _clahe_tiled(key, x):
    """Tile-adaptive CLAHE (albumentations/cv2 semantics: 8x8 tile grid,
    per-tile clipped histograms, bilinear interpolation between tile LUTs),
    removing the shipped global approximation when enabled.

    Selected via ``AUGMENT_TILED_CLAHE=1`` (module flag ``TILED_CLAHE``);
    the global form stays the default — the tiled apply adds ~32 fused
    compare-FMAs per pixel plus the LUT interpolation (measured cost in
    RESULTS).  The interpolated apply runs as one Pallas pass on TPU
    (:mod:`..ops.pallas.clahe_tiled` — jnp would materialize 32 full-res
    planes); histogram building mirrors :func:`_clahe` per tile on a 2x
    subsample.  Requires H, W divisible by 16 (8 tiles x even subsample);
    other sizes fall back to the global form."""
    from ..ops.pallas.clahe_tiled import tiled_clahe_new_luma

    b, h, w, _ = x.shape
    t = _CLAHE_TILES
    if h % (2 * t) or w % (2 * t):
        return _clahe(key, x)
    bins = _CLAHE_TILED_BINS
    clip_limit = jax.random.uniform(key, (b, 1, 1), minval=1.0, maxval=4.0)
    luma = jnp.clip(_luma(jnp.clip(x, 0, 1)), 0.0, 1.0).astype(jnp.float32)
    th2, tw2 = h // t // 2, w // t // 2
    ds = luma[:, ::2, ::2].reshape(b, t, th2, t, tw2)
    ds = ds.transpose(0, 1, 3, 2, 4).reshape(b, t * t, th2 * tw2)
    n = th2 * tw2
    idx = jnp.clip((ds * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    # bf16 one-hot: tile counts are <= n <= 256, all exactly representable,
    # and the (B, T*T, n, bins) intermediate halves
    one_hot = (idx[..., None] == jnp.arange(bins)).astype(jnp.bfloat16)
    hist = one_hot.sum(axis=2, dtype=jnp.float32)  # (B, T*T, bins)
    cap = clip_limit * n / bins
    excess = jnp.sum(jnp.maximum(hist - cap, 0.0), axis=2, keepdims=True)
    hist = jnp.minimum(hist, cap) + excess / bins
    cdf = jnp.cumsum(hist, axis=2) / n
    deltas = jnp.diff(cdf, axis=2, prepend=jnp.zeros((b, t * t, 1), cdf.dtype))
    new_luma = tiled_clahe_new_luma(luma, deltas.reshape(b, t, t, bins), t)
    scale = new_luma / jnp.maximum(luma, 1e-6)
    return x * scale[..., None].astype(x.dtype)


def _tone_curve(key, x):
    c = jnp.clip(0.5 + 0.25 * jax.random.normal(key, (x.shape[0], 1, 1, 1)), 0.0, 1.0)
    c = c.astype(x.dtype)
    t = jnp.clip(x, 0, 1)
    return 2 * (1 - t) * t * c + t * t


# ------------------------------------------------------------------- pipeline


def _gate(key, p, b):
    return jax.random.bernoulli(key, p, (b, 1, 1, 1))


def _one_of(key, p, fns, x):
    """albumentations OneOf: apply one of ``fns`` with probability ``p``.

    The branch CHOICE is batch-uniform and dispatched with ``lax.switch`` so
    only ONE branch executes per step (computing all four then selecting
    measured ~3x the cost of the winning branch); the Bernoulli ``p`` gate
    stays per-sample.  Same documented deviation as the geometric params:
    per-image marginals over an epoch match the reference (every step draws
    a fresh uniform choice), only the within-batch joint is shared."""
    b = x.shape[0]
    kg, kc, kf = jax.random.split(key, 3)
    gate = _gate(kg, p, b)
    choice = jax.random.randint(kc, (), 0, len(fns))
    out = jax.lax.switch(
        choice,
        [lambda op, fn=fn: fn(kf, op).astype(op.dtype) for fn in fns],
        x,
    )
    return jnp.where(gate, out, x)


def _affine_row(*vals):
    return jnp.stack([jnp.asarray(v, jnp.float32).reshape(()) for v in vals])


def _composed_warp_coords(h, w, crop_g, top, left, ch, cw, flip_g, rot_g, degree):
    """Compose crop -> hflip -> rotate into ONE affine coordinate field.

    Each op's 3x3 homogeneous matrix maps OUTPUT coords to its input coords
    and is gated to identity by its batch-uniform Bernoulli, so the final
    ``src = M_crop @ M_flip @ M_rot @ out`` sampling applies exactly the ops
    that fired as a single resampling (sequential resampling applied up to
    two bilinear passes per step; the composition is the same continuous map
    with one interpolation — strictly less blur)."""
    eye = jnp.eye(3, dtype=jnp.float32)
    theta = jnp.deg2rad(degree)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    m_rot = jnp.stack([
        _affine_row(cos, sin, cy - cos * cy - sin * cx),
        _affine_row(-sin, cos, cx + sin * cy - cos * cx),
        _affine_row(0.0, 0.0, 1.0),
    ])
    m_rot = jnp.where(rot_g, m_rot, eye)
    m_flip = jnp.where(
        flip_g,
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, w - 1.0], [0.0, 0.0, 1.0]],
                    jnp.float32),
        eye,
    )
    m_crop = jnp.stack([
        _affine_row(ch / h, 0.0, top + 0.5 * ch / h - 0.5),
        _affine_row(0.0, cw / w, left + 0.5 * cw / w - 0.5),
        _affine_row(0.0, 0.0, 1.0),
    ])
    m_crop = jnp.where(crop_g, m_crop, eye)
    m = m_crop @ m_flip @ m_rot
    yy, xx = jnp.mgrid[:h, :w]
    yy, xx = yy.astype(jnp.float32), xx.astype(jnp.float32)
    ys = m[0, 0] * yy + m[0, 1] * xx + m[0, 2]
    xs = m[1, 0] * yy + m[1, 1] * xx + m[1, 2]
    return ys, xs


@jax.jit
def augment_batch(key: jax.Array, images: jax.Array, masks: jax.Array):
    """Augment an NHWC batch (images in [0,1]) + masks jointly. Pure/jittable.

    Internally computes in bfloat16: image precision in [0,1] at bf16 (8-bit
    mantissa) matches the uint8 sources, and halving HBM traffic across the
    ~15 full-batch passes is a direct step-time win.  Coordinates, histograms
    and PCA stay f32.  Returns bfloat16 (the train step consumes bf16; mask
    values are exactly {-1, 0, 1} either way).

    Geometry (round 5): crop, hflip and rotate are composed into ONE affine
    gather under ONE ``lax.cond`` (:func:`_composed_warp_coords`), at the
    crop's pipeline position.  The previous three separate conds each paid a
    fusion-boundary + identity-branch copy (the r4 residual experiment
    attributed ~2 ms of the augmentation cost to such boundary effects), and
    crop+rotate steps paid two resamplings.  Documented deviations on top of
    the batch-uniform parameter draw: (a) the geometric gates are hoisted out
    of the per-sample outer p=0.7 gate with marginal-preserving probabilities
    (crop 0.7*0.3=0.21, flip 0.7*0.5=0.35; rotate was already outside), so a
    sample's crop/flip no longer co-occurs with its photometric block,
    (b) rotation now happens BEFORE FancyPCA/CLAHE, whose statistics see the
    reflect101-resampled border pixels (interior pixel population unchanged).
    Flip-only steps (no crop/rotate fired) keep the cheap pure-reversal form
    instead of paying the 4-gather bilinear warp.
    """
    b, h, w, _ = images.shape
    keys = jax.random.split(key, 14)
    (k_outer, k_blur, k_color, k_crop_p, k_crop, k_flip, k_pca, k_shuf, k_gray,
     k_hsv, k_clahe, k_rot, k_tone, k_extra) = keys

    img, mask = images.astype(jnp.bfloat16), masks.astype(jnp.bfloat16)
    outer = _gate(k_outer, 0.7, b)

    # --- photometric compose block part 1 (albumentations Compose p=0.7)
    x = _one_of(k_blur, 0.4, [_defocus, _gauss_blur, _zoom_blur, _fog], img)
    x = _one_of(k_color, 0.4, [_color_jitter, _brightness_contrast, _gamma, _emboss], x)
    img = jnp.where(outer, x, img)

    # --- composed geometry: crop (p=.21) -> hflip (p=.35) -> rotate (p=.4),
    # batch-uniform gates + parameters, ONE warp under ONE cond
    ks1, ks2, ks3, ks4 = jax.random.split(k_crop, 4)
    scale = jax.random.uniform(ks1, (), minval=0.08, maxval=1.0)
    log_ratio = jax.random.uniform(ks2, (), minval=np.log(0.75), maxval=np.log(4 / 3))
    area = scale * h * w
    cw = jnp.clip(jnp.sqrt(area * jnp.exp(log_ratio)), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / jnp.exp(log_ratio)), 8.0, h)
    top = jax.random.uniform(ks3, ()) * (h - ch)
    left = jax.random.uniform(ks4, ()) * (w - cw)
    crop_g = jax.random.bernoulli(k_crop_p, 0.7 * 0.3)
    flip_g = jax.random.bernoulli(k_flip, 0.7 * 0.5)
    # Arotate: degree U[0,90) with 20% chance of 0 (batch-uniform), p=0.4
    kd1, kd2, kg = jax.random.split(k_rot, 3)
    degree = jax.random.randint(kd1, (), 0, 90).astype(jnp.float32)
    degree = jnp.where(jax.random.bernoulli(kd2, 0.2), 0.0, degree)
    rot_g = jax.random.bernoulli(kg, 0.4)
    ys, xs = _composed_warp_coords(
        h, w, crop_g, top, left, ch, cw, flip_g, rot_g, degree)

    def _warp(xi, mi):
        return _bilinear_warp(xi, ys, xs), _nearest_warp(mi, ys, xs)

    def _no_warp(xi, mi):
        # flip-only steps: a reversal is far cheaper than a 4-gather warp
        return jax.lax.cond(
            flip_g,
            lambda a, mk: (a[:, :, ::-1], mk[:, :, ::-1]),
            lambda a, mk: (a, mk),
            xi, mi,
        )

    if ALWAYS_WARP:
        # no cond: gates folded the affine to identity/flip, which the
        # gathers reproduce exactly (see the knob comment at module top)
        img, mask = _warp(img, mask)
    else:
        img, mask = jax.lax.cond(
            jnp.logical_or(crop_g, rot_g), _warp, _no_warp, img, mask)

    # --- photometric compose block part 2 (SAME outer draw, so the
    # within-sample joint between the OneOf blocks and pca/shuffle/gray is
    # exactly the reference's Compose semantics)
    kp1, kp2 = jax.random.split(k_pca)
    img = jnp.where(outer & _gate(kp1, 0.3, b), _fancy_pca(kp2, img), img)
    ksh1, ksh2 = jax.random.split(k_shuf)
    img = jnp.where(outer & _gate(ksh1, 0.5, b), _channel_shuffle(ksh2, img), img)
    img = jnp.where(outer & _gate(k_gray, 0.3, b), _to_gray(None, img), img)

    # --- independent tail
    kh1, kh2 = jax.random.split(k_hsv)
    img = jnp.where(_gate(kh1, 0.4, b), _hsv_shift(kh2, img), img)
    kc1, kc2 = jax.random.split(k_clahe)
    clahe_fn = _clahe_tiled if TILED_CLAHE else _clahe
    img = jnp.where(_gate(kc1, 0.7, b), clahe_fn(kc2, img), img)

    kt1, kt2 = jax.random.split(k_tone)
    img = jnp.where(_gate(kt1, 0.5, b), _tone_curve(kt2, img), img)
    # Returned in bfloat16: the train step consumes bf16 images directly and
    # the labels are exactly {-1, 0, 1} (nearest-warped), so casting back to
    # f32 here would only add two full-batch HBM round-trips.
    return jnp.clip(img, 0.0, 1.0), mask


def augment_sample(key: jax.Array, img: jax.Array, mask: jax.Array):
    """Single-sample convenience wrapper (HWC in, HWC f32 out)."""
    imgs, masks = augment_batch(key, img[None], mask[None])
    return imgs[0].astype(jnp.float32), masks[0].astype(jnp.float32)


@jax.jit
def augment_batch_per_sample(key: jax.Array, images: jax.Array, masks: jax.Array):
    """:func:`augment_batch` with PER-SAMPLE parameter granularity — the
    reference's semantics (``dataset/augment.py:22-90`` draws every gate and
    geometric parameter per sample).

    Exactly the shipped op math vmapped over singleton batches with one
    fresh key per sample: sample ``i``'s output is bit-identical to
    ``augment_batch(split(key, B)[i], images[i:i+1], masks[i:i+1])``
    (tests/test_augment_parity.py).  Under vmap the batch-level
    ``lax.cond`` gates (crop/rotate/flip) become selects, so every step
    pays the warp gathers — measurably slower than the batch-uniform
    default, whose quality was A/B'd as equivalent (RESULTS.md round 3:
    final-Dice delta flips sign across seeds, magnitude inside seed noise).
    Selected in the trainers via ``AUGMENT_PER_SAMPLE=1`` (read at import
    time, like ``AUGMENT_TILED_CLAHE``)."""
    keys = jax.random.split(key, images.shape[0])

    def one(k, im, mk):
        im2, mk2 = augment_batch(k, im[None], mk[None])
        return im2[0], mk2[0]

    return jax.vmap(one)(keys, images, masks)


# AUGMENT_PER_SAMPLE=1 makes the trainers draw augmentation parameters per
# sample (reference granularity) instead of per batch.
PER_SAMPLE = os.environ.get("AUGMENT_PER_SAMPLE", "0").lower() not in (
    "0", "", "false")
