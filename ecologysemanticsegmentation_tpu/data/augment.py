"""Device-side augmentation pipeline (jnp, jit/vmap-able).

TPU-native rebuild of the reference's host-side albumentations pipeline
(reference ``dataset/augment.py:22-90``).  The reference decodes + augments
per-sample in DataLoader worker processes — its known bottleneck (OOM notes at
``fish_coco_annotator.py:166-172``).  Here the whole pipeline is a pure
function of a PRNG key that runs *on device, batched*, fused into the input
side of the train step: no host round-trip, no per-sample Python.

Structure mirrors the reference's probability tree:

* outer ``p=0.7`` gate over [ OneOf{defocus, gaussian-blur, zoom-blur, fog}
  (p=.4) → OneOf{color-jitter, brightness-contrast, gamma, emboss} (p=.4) →
  random-resized-crop (p=.3) → hflip (.5) → FancyPCA (.3) → channel-shuffle
  (.5) → to-gray (.3) ],
* independent: HSV shift (p=.4), CLAHE (p=.7), joint rotate 0-90° (p=.4,
  reference ``Arotate`` ``augment.py:77-90``), tone curve (p=.5).

Geometric ops (crop/flip/rotate) are joint over image+mask; photometric ops
touch the image only — same contract as albumentations' ``mask=`` pass-through.

Documented approximations (parity is tolerance-based per SURVEY.md §7):
fog uses a low-frequency noise field instead of rasterized circles; CLAHE is
a clip-limited *global* histogram equalization (tile-adaptive version tracked
in ops/); tone curve is a single-control-point quadratic Bezier.  Everything
runs under ``vmap`` with per-sample keys, so conditionals lower to
``select`` — both branches execute, which is the right trade on TPU (static
graph, no divergence).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear

# --------------------------------------------------------------- conv helpers


def _depthwise_conv(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """img HWC, kernel (kh, kw). SAME padding, per-channel."""
    c = img.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, c))
    out = jax.lax.conv_general_dilated(
        img[None], k.astype(img.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[0]


def _disk_kernel(radius: int) -> jnp.ndarray:
    n = 2 * radius + 1
    yy, xx = jnp.mgrid[:n, :n] - radius
    k = (yy**2 + xx**2 <= radius**2).astype(jnp.float32)
    return k / jnp.sum(k)


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    r = size // 2
    yy, xx = jnp.mgrid[:size, :size] - r
    k = jnp.exp(-(yy**2 + xx**2) / (2.0 * sigma**2))
    return k / jnp.sum(k)


# --------------------------------------------------------- geometric sampling


def _reflect101(x: jax.Array, n: int) -> jax.Array:
    """OpenCV BORDER_REFLECT_101 index folding."""
    period = 2 * (n - 1) if n > 1 else 1
    x = jnp.abs(x) % period
    return jnp.where(x >= n, period - x, x)


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample HWC image at float coords (out_h, out_w) with reflect101 border."""
    h, w = img.shape[:2]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    def at(yi, xi):
        yi = _reflect101(yi.astype(jnp.int32), h)
        xi = _reflect101(xi.astype(jnp.int32), w)
        return img[yi, xi]

    top = at(y0, x0) * (1 - wx) + at(y0, x0 + 1) * wx
    bot = at(y0 + 1, x0) * (1 - wx) + at(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def _rotate_joint(img, mask, degrees):
    h, w = img.shape[:2]
    theta = jnp.deg2rad(degrees)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[:h, :w]
    yc, xc = yy - cy, xx - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * yc - sin * xc + cy
    src_x = sin * yc + cos * xc + cx
    return (
        _bilinear_sample(img, src_y, src_x),
        _bilinear_sample(mask, src_y, src_x),
    )


def _crop_resize_joint(img, mask, top, left, ch, cw):
    """Resample a (top, left, ch, cw) crop back to full size (joint)."""
    h, w = img.shape[:2]
    oy = jnp.arange(h, dtype=jnp.float32)
    ox = jnp.arange(w, dtype=jnp.float32)
    src_y = top + (oy + 0.5) * ch / h - 0.5
    src_x = left + (ox + 0.5) * cw / w - 0.5
    ys = jnp.broadcast_to(src_y[:, None], (h, w))
    xs = jnp.broadcast_to(src_x[None, :], (h, w))
    return _bilinear_sample(img, ys, xs), _bilinear_sample(mask, ys, xs)


# ------------------------------------------------------------ color utilities


def _rgb_to_hsv(img):
    return jax.vmap(jax.vmap(_px_rgb2hsv))(img)


def _px_rgb2hsv(px):
    r, g, b = px[0], px[1], px[2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx])


def _hsv_to_rgb(img):
    return jax.vmap(jax.vmap(_px_hsv2rgb))(img)


def _px_hsv2rgb(px):
    h, s, v = px[0] * 6.0, px[1], px[2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b])


_LUMA = jnp.array([0.299, 0.587, 0.114])


# ------------------------------------------------------------- the transforms


def _defocus(key, img):
    return _depthwise_conv(img, _disk_kernel(3))


def _gauss_blur(key, img):
    return _depthwise_conv(img, _gaussian_kernel(3, 0.2 + 1e-3))


def _zoom_blur(key, img):
    h, w = img.shape[:2]
    acc = img
    for factor in (1.03, 1.06, 1.09, 1.11):
        ch, cw = h / factor, w / factor
        top, left = (h - ch) / 2.0, (w - cw) / 2.0
        zoomed, _ = _crop_resize_joint(img, img, top, left, ch, cw)
        acc = acc + zoomed
    return acc / 5.0


def _fog(key, img):
    h, w = img.shape[:2]
    k1, k2 = jax.random.split(key)
    coef = jax.random.uniform(k1, (), minval=0.3, maxval=1.0)
    field = jax.random.uniform(k2, (1, h // 16 or 1, w // 16 or 1, 1))
    field = resize_bilinear(field, (h, w))[0]
    alpha = coef * 0.6 * field
    return img * (1 - alpha) + alpha


def _color_jitter(key, img):
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = jax.random.uniform(kb, (), minval=0.6, maxval=1.4)
    c = jax.random.uniform(kc, (), minval=0.6, maxval=1.4)
    s = jax.random.uniform(ks, (), minval=0.6, maxval=1.4)
    hshift = jax.random.uniform(kh, (), minval=-0.4, maxval=0.4)
    img = img * b
    mean = jnp.mean(img)
    img = (img - mean) * c + mean
    luma = jnp.sum(img * _LUMA, axis=-1, keepdims=True)
    img = (img - luma) * s + luma
    hsv = _rgb_to_hsv(jnp.clip(img, 0, 1))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hshift) % 1.0)
    return _hsv_to_rgb(hsv)


def _brightness_contrast(key, img):
    kb, kc = jax.random.split(key)
    alpha = 1.0 + jax.random.uniform(kc, (), minval=-0.2, maxval=0.2)
    beta = jax.random.uniform(kb, (), minval=-0.2, maxval=0.2)
    return img * alpha + beta


def _gamma(key, img):
    g = jax.random.uniform(key, (), minval=0.8, maxval=1.2)
    return jnp.power(jnp.clip(img, 1e-6, 1.0), g)


_EMBOSS_K = jnp.array([[-1.0, -1.0, 0.0], [-1.0, 1.0, 1.0], [0.0, 1.0, 1.0]])


def _emboss(key, img):
    ka, ks = jax.random.split(key)
    alpha = jax.random.uniform(ka, (), minval=0.3, maxval=0.6)
    strength = jax.random.uniform(ks, (), minval=0.3, maxval=0.7)
    embossed = _depthwise_conv(img, _EMBOSS_K * strength) + 0.5
    return img * (1 - alpha) + embossed * alpha


def _fancy_pca(key, img, alpha_std=0.35):
    flat = img.reshape(-1, 3)
    mean = flat.mean(axis=0)
    cov = jnp.cov((flat - mean).T) + 1e-6 * jnp.eye(3)
    eigval, eigvec = jnp.linalg.eigh(cov)
    alphas = jax.random.normal(key, (3,)) * alpha_std
    delta = eigvec @ (alphas * eigval)
    return img + delta


def _channel_shuffle(key, img):
    perm = jax.random.permutation(key, 3)
    return img[..., perm]


def _to_gray(key, img):
    luma = jnp.sum(img * _LUMA, axis=-1, keepdims=True)
    return jnp.broadcast_to(luma, img.shape)


def _hsv_shift(key, img):
    kh, ks, kv = jax.random.split(key, 3)
    # albumentations units: hue ±60 (cv2 0-180 scale), sat ±60/255, val ±30/255.
    dh = jax.random.uniform(kh, (), minval=-60, maxval=60) / 180.0
    ds = jax.random.uniform(ks, (), minval=-60, maxval=60) / 255.0
    dv = jax.random.uniform(kv, (), minval=-30, maxval=30) / 255.0
    hsv = _rgb_to_hsv(jnp.clip(img, 0, 1))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + dh) % 1.0)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] + ds, 0, 1))
    hsv = hsv.at[..., 2].set(jnp.clip(hsv[..., 2] + dv, 0, 1))
    return _hsv_to_rgb(hsv)


def _clahe(key, img, clip_limit=3.0, bins=64):
    """Clip-limited global histogram equalization on luminance."""
    luma = jnp.sum(jnp.clip(img, 0, 1) * _LUMA, axis=-1)
    idx = jnp.clip((luma * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros(bins).at[idx.ravel()].add(1.0)
    n = luma.size
    cap = clip_limit * n / bins
    excess = jnp.sum(jnp.maximum(hist - cap, 0.0))
    hist = jnp.minimum(hist, cap) + excess / bins
    cdf = jnp.cumsum(hist) / n
    new_luma = cdf[idx]
    scale = new_luma / jnp.maximum(luma, 1e-6)
    return img * scale[..., None]


def _tone_curve(key, img):
    c = 0.5 + 0.25 * jax.random.normal(key, ())
    c = jnp.clip(c, 0.0, 1.0)
    t = jnp.clip(img, 0, 1)
    return 2 * (1 - t) * t * c + t * t


def _random_resized_crop(key, img, mask):
    h, w = img.shape[:2]
    ks, kr, ky, kx = jax.random.split(key, 4)
    scale = jax.random.uniform(ks, (), minval=0.08, maxval=1.0)
    log_ratio = jax.random.uniform(
        kr, (), minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    ratio = jnp.exp(log_ratio)
    area = scale * h * w
    cw = jnp.clip(jnp.sqrt(area * ratio), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / ratio), 8.0, h)
    top = jax.random.uniform(ky, (), minval=0.0, maxval=1.0) * (h - ch)
    left = jax.random.uniform(kx, (), minval=0.0, maxval=1.0) * (w - cw)
    return _crop_resize_joint(img, mask, top, left, ch, cw)


# ------------------------------------------------------------------- pipeline


def _maybe(key, p, fn, img, *rest):
    """Apply ``fn`` with probability ``p`` (select-based, vmap-safe)."""
    kg, kf = jax.random.split(key)
    gate = jax.random.bernoulli(kg, p)
    out = fn(kf, img, *rest)
    if rest:
        return tuple(jnp.where(gate, o, i) for o, i in zip(out, (img, *rest)))
    return jnp.where(gate, out, img)


def _one_of(key, p, fns, img):
    kg, kc, kf = jax.random.split(key, 3)
    gate = jax.random.bernoulli(kg, p)
    choice = jax.random.randint(kc, (), 0, len(fns))
    outs = jnp.stack([fn(kf, img) for fn in fns])
    out = outs[choice]
    return jnp.where(gate, out, img)


def augment_sample(key: jax.Array, img: jax.Array, mask: jax.Array):
    """Augment one (HWC image in [0,1], HWC mask) pair. Pure / jittable."""
    keys = jax.random.split(key, 12)
    k_outer, k_blur, k_color, k_rrc, k_flip, k_pca, k_shuf, k_gray, k_hsv, k_clahe, k_rot, k_tone = keys

    outer = jax.random.bernoulli(k_outer, 0.7)

    def composed(img, mask):
        img = _one_of(k_blur, 0.4, [_defocus, _gauss_blur, _zoom_blur, _fog], img)
        img = _one_of(
            k_color, 0.4, [_color_jitter, _brightness_contrast, _gamma, _emboss], img
        )
        img2, mask2 = _maybe(k_rrc, 0.3, _random_resized_crop, img, mask)
        flip = jax.random.bernoulli(k_flip, 0.5)
        img2 = jnp.where(flip, img2[:, ::-1], img2)
        mask2 = jnp.where(flip, mask2[:, ::-1], mask2)
        img2 = _maybe(k_pca, 0.3, _fancy_pca, img2)
        img2 = _maybe(k_shuf, 0.5, _channel_shuffle, img2)
        img2 = _maybe(k_gray, 0.3, _to_gray, img2)
        return img2, mask2

    aug_img, aug_mask = composed(img, mask)
    img = jnp.where(outer, aug_img, img)
    mask = jnp.where(outer, aug_mask, mask)

    img = _maybe(k_hsv, 0.4, _hsv_shift, img)
    img = _maybe(k_clahe, 0.7, _clahe, img)

    # Arotate (reference augment.py:77-90): p=0.4 outer, degree U[0,90) with a
    # 20% chance of 0.
    kd1, kd2, kg = jax.random.split(k_rot, 3)
    degree = jax.random.randint(kd1, (), 0, 90).astype(jnp.float32)
    degree = jnp.where(jax.random.bernoulli(kd2, 0.2), 0.0, degree)
    rot_img, rot_mask = _rotate_joint(img, mask, degree)
    rot_gate = jax.random.bernoulli(kg, 0.4)
    img = jnp.where(rot_gate, rot_img, img)
    mask = jnp.where(rot_gate, rot_mask, mask)

    img = _maybe(k_tone, 0.5, _tone_curve, img)
    return jnp.clip(img, 0.0, 1.0), mask


@jax.jit
def augment_batch(key: jax.Array, images: jax.Array, masks: jax.Array):
    """Vectorized batched augmentation: NHWC images + masks, per-sample keys."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(augment_sample)(keys, images, masks)
