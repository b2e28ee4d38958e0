"""Tile-adaptive CLAHE apply (Pallas TPU kernel + jnp reference).

The shipped augmentation CLAHE is clip-limited *global* equalization — a
documented approximation of albumentations' ``A.CLAHE`` (8x8 tile grid with
bilinearly interpolated per-tile LUTs; reference ``dataset/augment.py:22-90``).
This module supplies the tile-adaptive form (``data/augment.py`` selects it
via ``AUGMENT_TILED_CLAHE=1``).

Math: per-tile clipped histograms give per-tile CDF step *deltas*
``d[b,ty,tx,k]`` (32 bins).  The equalized luminance is the cv2-style
bilinear interpolation between the 4 nearest tile LUTs:

  new_l[b,y,x] = sum_k 1{idx[b,y,x] >= k} * (Wy[y,:] @ d[b,:,:,k] @ Wx[x,:]^T)

where Wy/Wx are the (H, T)/(W, T) tile-center interpolation weights
(two-tap rows, clamped at the borders, exactly cv2's scheme).

Why a kernel: the inner term is a per-bin (H,T)@(T,W) matmul whose result
feeds ONE fused multiply-add per pixel.  XLA cannot fuse a dot into a
consumer loop, so the jnp formulation materializes 32 full-resolution
planes (~1 GB of HBM traffic at batch 128 @ 256px).  In Pallas the 32 tiny
MXU dots stay in VMEM and the whole apply is a single pass over the
luminance.  The x-axis interpolation is pre-contracted outside the kernel
(``Gx = einsum("btsk,xs->bktx", d, Wx)`` — 33 MB, cheap) so the kernel's
per-bin work is one (H,T)@(T,W) dot.

Gradients are not needed (augmentation is outside the differentiated
path), so no custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BINS = 32  # default bin count (the kernel reads the actual count from its operands)


@functools.lru_cache(maxsize=32)
def tile_weights(n: int, tiles: int) -> np.ndarray:
    """(n, tiles) bilinear tile-center interpolation weights (cv2 CLAHE
    semantics: pixels interpolate between the two nearest tile centers;
    pixels outside the outermost centers clamp to the edge tile)."""
    ts = n / tiles
    pos = np.arange(n) + 0.5
    t = pos / ts - 0.5  # fractional tile-center coordinate
    lo = np.floor(t).astype(np.int64)
    frac = (t - lo).astype(np.float32)
    w = np.zeros((n, tiles), np.float32)
    for i in range(n):
        l, f = lo[i], frac[i]
        if l < 0:
            w[i, 0] = 1.0
        elif l >= tiles - 1:
            w[i, tiles - 1] = 1.0
        else:
            w[i, l] = 1.0 - f
            w[i, l + 1] = f
    return w


def _kernel(l_ref, gx_ref, wy_ref, o_ref):
    bins = gx_ref.shape[1]
    l = l_ref[0]                        # (H, W) f32 luminance in [0,1]
    idx = jnp.floor(l * (bins - 1))     # f32 bin index (compare operand)
    acc = jnp.zeros(l.shape, jnp.float32)
    wy = wy_ref[...]                    # (H, T)
    for k in range(bins):
        g = jnp.dot(wy, gx_ref[0, k], preferred_element_type=jnp.float32)
        acc = acc + g * (idx >= k)
    o_ref[0] = acc


def _apply_reference(luma: jax.Array, gx: jax.Array, wy: jax.Array) -> jax.Array:
    """jnp reference of the kernel (same operands): used off-TPU and by
    oracle tests.  Materializes the per-bin planes — correct, not fast."""
    bins = gx.shape[1]
    idx = jnp.floor(luma * (bins - 1))  # (B, H, W)
    planes = jnp.einsum("yt,bktx->bkyx", wy, gx)  # (B, bins, H, W)
    ks = jnp.arange(bins, dtype=luma.dtype)
    gates = (idx[:, None] >= ks[None, :, None, None]).astype(luma.dtype)
    return jnp.sum(planes * gates, axis=1)


def tiled_clahe_new_luma(
    luma: jax.Array,
    deltas: jax.Array,
    tiles: int,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(B, H, W) luminance in [0,1] + (B, T, T, bins) per-tile CDF deltas
    -> (B, H, W) equalized luminance (bilinear between tile LUTs)."""
    b, h, w = luma.shape
    bins = deltas.shape[-1]
    wy = jnp.asarray(tile_weights(h, tiles))
    wx = jnp.asarray(tile_weights(w, tiles))
    # pre-contract the x axis: (B, T, T, K) x (W, T) -> (B, K, T, W)
    gx = jnp.einsum("btsk,xs->bktx", deltas, wx)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if not use_pallas and not interpret:
        return _apply_reference(luma, gx, wy)
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bins, tiles, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, tiles), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(luma.astype(jnp.float32), gx.astype(jnp.float32), wy)
