"""Bilinear / nearest resize as MXU-friendly einsums.

TPU design note: spatial bilinear resampling is separable, so we express it as
two small matmuls (H then W) against banded interpolation matrices that are
baked in as compile-time constants.  XLA maps these onto the MXU and fuses the
surrounding elementwise work — far better than gather-based resampling, which
lowers to slow dynamic-slice loops on TPU.

``align_corners`` is supported because the reference's decoders use torch's
``nn.UpsamplingBilinear2d`` (align_corners=True; reference smp DeepLabV3Plus
decoder) while its ASPP pooling branch uses ``F.interpolate(align_corners=
False)`` — both are needed for checkpoint-parity eval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, float32."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        # Half-pixel centers (torch align_corners=False / jax.image default).
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear-resize NHWC ``x`` to spatial size ``out_hw``.

    Static shapes only (jit-friendly).  Accumulates in float32 on the MXU and
    casts back to the input dtype.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    # f32 inputs (masks, parity-sensitive paths) use exact MXU passes; bf16
    # model activations keep the fast default precision.
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    mh = jnp.asarray(_interp_matrix(oh, h, align_corners))
    mw = jnp.asarray(_interp_matrix(ow, w, align_corners))
    y = jnp.einsum(
        "oh,nhwc->nowc", mh, x, preferred_element_type=jnp.float32, precision=precision
    )
    y = jnp.einsum(
        "pw,nowc->nopc", mw, y, preferred_element_type=jnp.float32, precision=precision
    )
    return y.astype(x.dtype)


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor integer upsampling of NHWC (torch
    ``F.interpolate(scale_factor=k)`` default mode, used by the reference VGG
    U-Net decoder ``model/vgg.py:118``)."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize to an arbitrary static size (cv2.INTER_NEAREST-style)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = (np.arange(oh) * h // oh).astype(np.int32)
    cols = (np.arange(ow) * w // ow).astype(np.int32)
    return x[:, rows][:, :, cols]
