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


@functools.lru_cache(maxsize=16)
def _upsample_fir(factor: int) -> np.ndarray:
    """Length-``2*factor`` 1-D FIR of integer-factor bilinear upsampling
    (half-pixel centers) as a stride-``factor`` transposed conv: output
    ``o`` has phase ``p = o % f`` sampling input at ``(p+0.5)/f - 0.5``;
    scattering the two neighbor weights to kernel index ``p - f*j`` gives a
    dense symmetric kernel (f=4: [1,3,5,7,7,5,3,1]/8)."""
    taps: dict[int, float] = {}
    for p in range(factor):
        d = (p + 0.5) / factor - 0.5
        j0 = int(np.floor(d))
        frac = d - j0
        for j, wt in ((j0, 1.0 - frac), (j0 + 1, frac)):
            k = p - factor * j
            taps[k] = taps.get(k, 0.0) + wt
    kmin = min(taps)
    kern = np.zeros((max(taps) - kmin + 1,), np.float32)
    for k, wt in taps.items():
        kern[k - kmin] = wt
    return kern


def _upsample_convt(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor bilinear upsample as separable depthwise transposed
    convs.  Matches the einsum path within 1 bf16 ulp (bit-exact on TPU for
    f=4; the H-pass intermediate rounds to bf16) including the edge clamp,
    which a 1-px edge-replicate pre-pad reproduces exactly.  Exists because
    the einsum lowering materializes ~1.7 ms of
    layout copies per train step around the decoder's x4 upsample
    (hlo_stats profile) while the conv path keeps TPU-native layouts."""
    kern = _upsample_fir(factor)
    kh = len(kern)
    c = x.shape[-1]
    # output size: f*(h+2-1)+1 + 2*pad - 2f + 1 = f*h + 2*pad + 2 - f, so
    # pad = (f-2)/2 gives exactly f*h, phase-aligned (verified per factor)
    pad = (factor - 2) // 2
    xp = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    k1 = jnp.broadcast_to(
        jnp.asarray(kern, x.dtype)[:, None, None, None], (kh, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        xp, k1, window_strides=(1, 1), padding=[(pad, pad), (0, 0)],
        lhs_dilation=(factor, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    yp = jnp.concatenate([y[:, :, :1], y, y[:, :, -1:]], axis=2)
    k2 = jnp.broadcast_to(
        jnp.asarray(kern, x.dtype)[None, :, None, None], (1, kh, 1, c))
    return jax.lax.conv_general_dilated(
        yp, k2, window_strides=(1, 1), padding=[(0, 0), (pad, pad)],
        lhs_dilation=(1, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _interp_matrix_device(out_size: int, in_size: int,
                          align_corners: bool) -> jax.Array:
    """The bilinear matrix built from iota on device: each row has the
    two-tap weights ``(1-w, w)`` at ``floor(src), floor(src)+1``, which is
    exactly ``relu(1 - |src_o - i|)`` (border clamp included).  No inline
    constant: at 512px the augmentation's zoom-blur pyramid otherwise bakes
    8 banded matrices of ~2 MB each into the HLO (~16 MB of constants —
    the payload implicated in the 512px remote-compile blowup, RESULTS
    round 3 incident note)."""
    o = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 1)
    if align_corners and out_size > 1:
        src = o * ((in_size - 1) / max(out_size - 1, 1))
    else:
        src = (o + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, float(in_size - 1))
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - i))


# Above this element count the interpolation operand is built on device
# instead of baked as a constant.  2^17 elements (512 KB f32) keeps every
# 256px-config operand (decoder 64x16, zoom-blur 256x~233) as constants —
# identical compiled programs for the benched shapes — while the 512px+
# zoom-blur matrices (512x~465 = 238k elements) switch to the iota form.
_DEVICE_OPERAND_ELEMS = 1 << 17


def _interp_operand(out_size: int, in_size: int, align_corners: bool):
    if out_size * in_size >= _DEVICE_OPERAND_ELEMS:
        return _interp_matrix_device(out_size, in_size, align_corners)
    return jnp.asarray(_interp_matrix(out_size, in_size, align_corners))


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
    if (
        not align_corners
        and x.dtype == jnp.bfloat16  # model-activation path; f32 keeps einsum
        and h > 1 and w > 1
        and oh % h == 0 and ow % w == 0
        and oh // h == ow // w
        and oh // h in (2, 4, 8)
    ):
        return _upsample_convt(x, oh // h)
    # Measured dead end (do not re-ship without new in-context evidence): a
    # joint kron(Mh, Mw) single-dot form for small grids (the decoder's
    # align_corners=True 16->64 site) won ISOLATED — fwd+bwd 3.98 -> 2.79 ms
    # (experiments/resize_ac_bench.py) against the profile's ~0.85 ms fwd
    # convert copy + ~0.87 ms bwd transpose fusion — but regressed the FULL
    # train step 69.4 -> 70.9/71.4 ms: in context XLA partially absorbs the
    # pair's layout ops, while the joint dot adds ~13x FLOPs and its own f32
    # output materialization.  Same pattern as round 2's layout-copy A/Bs.
    # f32 inputs (masks, parity-sensitive paths) use exact MXU passes; bf16
    # model activations keep the fast default precision.
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    mh = _interp_operand(oh, h, align_corners)
    mw = _interp_operand(ow, w, align_corners)
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
