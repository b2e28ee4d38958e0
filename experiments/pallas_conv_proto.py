"""Pallas direct-conv prototype: ONE layer4 conv vs XLA (ROADMAP item).

The flagship's ceiling case says 5x needs >90% MXU on every conv; XLA runs
the layer4 3x3 512->512 dilation-2 conv at ~68% (1.149 ms chained, see
int8_conv_microbench2).  This prototypes the conv as 9 masked-row-shift
matmuls inside one Pallas kernel — x flattened to (H*W, C), each tap a
(256,512)@(512,512) bf16 dot with a precomputed boundary mask, f32 VMEM
accumulator — to measure whether a hand pipeline can beat XLA's conv
emitter on this shape before committing to a full fwd+bwd integration.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/pallas_conv_proto.py
(CPU check: JAX_PLATFORMS='' PY... with interpret=True)
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 128, 16, 16, 512
KH = KW = 3
DIL = 2
TAPS = [(dy, dx) for dy in (-DIL, 0, DIL) for dx in (-DIL, 0, DIL)]
BB = 4  # batch tile (per-sample variant)
BBF = 2  # batch tile (flat variant; f32 roll temps hit the VMEM stack limit at 4)


def _tap_masks() -> np.ndarray:
    """(9, H*W, 1) f32: 1 where the shifted source pixel is in-bounds."""
    yy, xx = np.mgrid[:H, :W]
    masks = []
    for dy, dx in TAPS:
        ok = (yy + dy >= 0) & (yy + dy < H) & (xx + dx >= 0) & (xx + dx < W)
        masks.append(ok.reshape(H * W, 1))
    return np.stack(masks).astype(np.float32)


def _kernel(x_ref, w_ref, m_ref, o_ref):
    for b in range(BB):
        # Sublane rotate is 32-bit-only in Mosaic, so shift an f32 copy
        # (static-slice concat of bf16 at non-tile-aligned rows miscompiled
        # and then faulted the worker — see log).
        x32 = x_ref[b].astype(jnp.float32)  # (H*W, C)
        acc = jnp.zeros((H * W, C), jnp.float32)
        for t, (dy, dx) in enumerate(TAPS):
            shift = (-(dy * W + dx)) % (H * W)
            xs = pltpu.roll(x32, shift, axis=0) if shift else x32
            xs = (xs * m_ref[t]).astype(jnp.bfloat16)
            acc = acc + jnp.dot(xs, w_ref[t], preferred_element_type=jnp.float32)
        o_ref[b] = acc.astype(o_ref.dtype)


def pallas_conv(x, w, interpret=False):
    """x (B,H,W,C) bf16, w (KH,KW,C,C) bf16 -> (B,H,W,C) bf16."""
    xf = x.reshape(B, H * W, C)
    wt = w.reshape(KH * KW, C, C)
    masks = jnp.asarray(_tap_masks())  # (9, H*W, 1)
    out = pl.pallas_call(
        _kernel,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, H * W, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wt.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(masks.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, H * W, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), x.dtype),
        interpret=interpret,
    )(xf, wt, masks)
    return out.reshape(B, H, W, C)


def _tap_masks_flat() -> np.ndarray:
    """(9, BBF*H*W, 1) masks tiled across the batch tile: every cross-sample
    (or cross-block circular) wrap row is exactly an out-of-bounds row, so
    the per-sample mask pattern repeated BBF times also guards the flat
    layout."""
    m = _tap_masks()  # (9, H*W, 1)
    return np.tile(m, (1, BBF, 1))


def _kernel_flat(x_ref, w_ref, m_ref, o_ref):
    x32 = x_ref[...].astype(jnp.float32)  # (BB*HW, C)
    acc = jnp.zeros(x32.shape, jnp.float32)
    for t, (dy, dx) in enumerate(TAPS):
        shift = (-(dy * W + dx)) % (BBF * H * W)
        xs = pltpu.roll(x32, shift, axis=0) if shift else x32
        xs = (xs * m_ref[t]).astype(jnp.bfloat16)
        acc = acc + jnp.dot(xs, w_ref[t], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def pallas_conv_flat(x, w, interpret=False):
    """Batch-tile-flattened variant: one (BB*HW, C) dot per tap."""
    xf = x.reshape(B * H * W, C)
    wt = w.reshape(KH * KW, C, C)
    masks = jnp.asarray(_tap_masks_flat())
    out = pl.pallas_call(
        _kernel_flat,
        grid=(B // BBF,),
        in_specs=[
            pl.BlockSpec((BBF * H * W, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wt.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(masks.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BBF * H * W, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H * W, C), x.dtype),
        interpret=interpret,
    )(xf, wt, masks)
    return out.reshape(B, H, W, C)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(DIL, DIL),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timeit(fn, *args, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / steps * 1000.0


def main():
    interpret = jax.devices()[0].platform != "tpu"
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C) - 0.5, jnp.bfloat16)
    w = jnp.asarray((rng.rand(KH, KW, C, C) - 0.5) / C, jnp.bfloat16)

    if interpret:
        ref = np.asarray(
            xla_conv(x[:8].astype(jnp.float32), w.astype(jnp.float32)))
        got = np.asarray(pallas_conv(x, w, interpret=True)[:8], np.float32)
        d = np.abs(got - ref)
        print("interpret check: max", d.max(), "mean", d.mean())
        assert d.max() < 0.05
        return

    ref = np.asarray(xla_conv(x, w), np.float32)
    got = np.asarray(pallas_conv(x, w), np.float32)
    got_flat = np.asarray(pallas_conv_flat(x, w), np.float32)
    scale = np.abs(ref).max()
    print(json.dumps({"check_max_abs": float(np.abs(got - ref).max()),
                      "check_flat_max_abs": float(np.abs(got_flat - ref).max()),
                      "ref_scale": float(scale)}), flush=True)

    # Chain K applications to bury the dispatch floor (cf. int8 microbench2).
    K = 8

    @jax.jit
    def chain_xla(x, w):
        def body(_, y):
            return xla_conv(y, w).astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, K, body, x).astype(jnp.float32))

    @jax.jit
    def chain_pallas(x, w):
        def body(_, y):
            return pallas_conv(y, w)
        return jnp.sum(jax.lax.fori_loop(0, K, body, x).astype(jnp.float32))

    @jax.jit
    def chain_pallas_flat(x, w):
        def body(_, y):
            return pallas_conv_flat(y, w)
        return jnp.sum(jax.lax.fori_loop(0, K, body, x).astype(jnp.float32))

    t_x = timeit(chain_xla, x, w)
    t_p = timeit(chain_pallas, x, w)
    t_f = timeit(chain_pallas_flat, x, w)
    gflop = 2.0 * B * H * W * C * C * KH * KW / 1e9
    row = {"xla_ms_per_conv": round(t_x / K, 3),
           "pallas_ms_per_conv": round(t_p / K, 3),
           "pallas_flat_ms_per_conv": round(t_f / K, 3),
           "xla_tflops": round(gflop / (t_x / K) , 1),
           "pallas_tflops": round(gflop / (t_p / K), 1),
           "pallas_flat_tflops": round(gflop / (t_f / K), 1),
           "speedup_flat": round(t_x / t_f, 3)}
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
