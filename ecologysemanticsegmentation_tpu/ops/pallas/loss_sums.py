"""Fused single-pass loss reductions (Pallas TPU kernel, custom VJP).

The 7-loss tuple (:mod:`...losses`) needs ~10 different reductions over the
same (B, H, W, C) probability/label tensors; left to XLA these become several
HBM passes over ~50 MB of activations per step.  Everything the tuple needs
derives from seven per-channel sums computed in ONE pass:

  s0 = Σ g                (label mass)
  s1 = Σ p                (prediction mass)
  s2 = Σ p²               (the reference's ``p*p`` dice denominators)
  s3 = Σ g·p              (intersection)
  s4 = Σ (1−p)^1.5 · log(p + ε)      (focal fg integrand)
  s5 = Σ p^1.5 · log(1−p + ε)        (focal bg integrand)
  s6 = Σ max(p,0) + log1p(e^(−|p|))  (the p-only part of BCE-with-logits)

e.g. Σ(1−g)(1−p) = N − s0 − s1 + s3, Tversky's Σp·(1−g) = s1 − s3, and
BCE-with-logits(input=p, target=g) = (s6 − s3)/N.

Layout: the caller passes (C, N) transposed views (channel-major) so the big
reduction axis sits on lanes; the grid walks N in tiles and accumulates into
a (8, C) VMEM output (row 7 holds the element count).  The backward pass is a
second elementwise kernel: dp = Σ_k w_k · ∂s_k/∂p with the seven cotangent
weights broadcast from SMEM-sized inputs.

Falls back to pure jnp off-TPU (same math, used by CPU tests via
``interpret=True`` or the ``_sums_reference`` path).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-7
GAMMA = 1.5
NUM_SUMS = 8  # 7 sums + element count
LANE_TILE = 2048


def _sums_reference(p: jax.Array, g: jax.Array) -> jax.Array:
    """Pure-jnp reference: p, g are (C, N); returns (8, C) f32.

    Pixels with ``g < 0`` (the ``-1`` ignore sentinel) are excluded from
    every reduction INCLUDING the count row — the reference's stated-but-
    unimplemented "-1 will not be learnt" semantics
    (``visualize_composite_labels.py:44``; its loss code sums the raw -1s
    and NaNs once the negative mass dominates a dice numerator).  On clean
    ``{0,1}`` labels ``w == 1`` everywhere and the sums are bit-identical
    to the unmasked form."""
    p = p.astype(jnp.float32)
    g = g.astype(jnp.float32)
    w = (g >= 0).astype(jnp.float32)
    gw = g * w
    pw = p * w
    return jnp.stack([
        jnp.sum(gw, axis=1),
        jnp.sum(pw, axis=1),
        jnp.sum(pw * p, axis=1),
        jnp.sum(gw * p, axis=1),
        jnp.sum(w * jnp.power(1.0 - p, GAMMA) * jnp.log(p + EPS), axis=1),
        jnp.sum(w * jnp.power(p, GAMMA) * jnp.log(1.0 - p + EPS), axis=1),
        jnp.sum(w * (jnp.maximum(p, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(p)))), axis=1),
        jnp.sum(w, axis=1),
    ])


def _fwd_kernel(p_ref, g_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    p = p_ref[:, :].astype(jnp.float32)
    g = g_ref[:, :].astype(jnp.float32)
    # Ignore mask: g < 0 pixels drop out of every sum incl. the count row
    # (see _sums_reference).  w == 1 everywhere on clean labels.
    w = (g >= 0).astype(jnp.float32)
    g = g * w
    one_m_p = 1.0 - p
    s0 = jnp.sum(g, axis=1)
    s1 = jnp.sum(w * p, axis=1)
    s2 = jnp.sum(w * p * p, axis=1)
    s3 = jnp.sum(g * p, axis=1)
    # x^1.5 as x*sqrt(x): one sqrt instead of exp(1.5*log(x)); sqrt of a
    # negative is NaN, matching jnp.power's NaN-for-negative-base semantics
    pow_1mp = one_m_p * jnp.sqrt(one_m_p)
    pow_p = p * jnp.sqrt(p)
    s4 = jnp.sum(w * pow_1mp * jnp.log(p + EPS), axis=1)
    s5 = jnp.sum(w * pow_p * jnp.log(one_m_p + EPS), axis=1)
    s6 = jnp.sum(w * (jnp.maximum(p, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(p)))), axis=1)
    n = jnp.sum(w, axis=1)
    out_ref[:, :] += jnp.stack([s0, s1, s2, s3, s4, s5, s6, n])


def _bwd_kernel(p_ref, g_ref, w_ref, dp_ref, dg_ref):
    p = p_ref[:, :].astype(jnp.float32)
    g = g_ref[:, :].astype(jnp.float32)
    w = w_ref[:, :]  # (8, C)
    # Ignore mask (matches _fwd_kernel): every sum carries a w factor, so
    # every gradient does too; the mask itself is piecewise-constant in g
    # (zero subgradient), so dg needs no extra term.
    msk = (g >= 0).astype(jnp.float32)
    g = g * msk

    def wc(k):  # cotangent weight for sum k, shaped (C, 1) for broadcast
        return w[k][:, None]

    one_m_p = 1.0 - p
    dp = msk * (
        wc(1)
        + wc(2) * 2.0 * p
        + wc(3) * g
        + wc(4) * (one_m_p * jnp.sqrt(one_m_p) / (p + EPS)
                   - GAMMA * jnp.sqrt(one_m_p) * jnp.log(p + EPS))
        + wc(5) * (GAMMA * jnp.sqrt(p) * jnp.log(one_m_p + EPS)
                   - p * jnp.sqrt(p) / (one_m_p + EPS))
        # d/dp [max(p,0) + log1p(e^-|p|)] = 1{p>0} - sign(p)/(1 + e^|p|)
        + wc(6) * ((p > 0).astype(jnp.float32)
                   - jnp.sign(p) / (1.0 + jnp.exp(jnp.abs(p))))
    )
    dg = (wc(0) + wc(3) * p) * msk
    dp_ref[:, :] = dp
    dg_ref[:, :] = dg * jnp.ones_like(p)


def _pad_to_tile(x: jax.Array) -> jax.Array:
    c, n = x.shape
    pad = (-n) % LANE_TILE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


@functools.lru_cache(maxsize=4)
def _make_fused(interpret: bool):
    @jax.custom_vjp
    def fused(p, g):
        return _fwd(p, g, interpret)

    fused.defvjp(
        lambda p, g: _fwd_vjp(interpret, p, g),
        lambda res, cot: _bwd_vjp(interpret, res, cot),
    )
    return fused


def fused_loss_sums(p: jax.Array, g: jax.Array, interpret: bool = False) -> jax.Array:
    """(C, N) probs/labels -> (8, C) sums (differentiable, custom VJP).
    Padding contributes p=g=0 elements whose analytic effect on rows 4/6/7 is
    subtracted after the kernel."""
    return _make_fused(bool(interpret))(p, g)


def _fwd(p, g, interpret):
    c, n = p.shape
    pp, gp = _pad_to_tile(p), _pad_to_tile(g)
    n_pad = pp.shape[1]
    grid = n_pad // LANE_TILE
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NUM_SUMS, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NUM_SUMS, c), jnp.float32),
        interpret=interpret,
    )(pp, gp)
    # Remove padding contributions: zeros add log(eps) to s4 and log1p(1) to
    # s6; subtract the analytic zero-element contribution per padded lane.
    pad = n_pad - n
    if pad:
        zero_contrib = jnp.zeros((NUM_SUMS, c), jnp.float32)
        zero_contrib = zero_contrib.at[4].set(pad * float(np.log(EPS)))
        zero_contrib = zero_contrib.at[6].set(pad * float(np.log(2.0)))
        zero_contrib = zero_contrib.at[7].set(float(pad))
        out = out - zero_contrib
    return out


def _fwd_vjp(interpret, p, g):
    return _fwd(p, g, interpret), (p, g)


def _bwd_vjp(interpret, res, cot):
    p, g = res
    c, n = p.shape
    pp, gp = _pad_to_tile(p), _pad_to_tile(g)
    dp, dg = pl.pallas_call(
        _bwd_kernel,
        grid=(pp.shape[1] // LANE_TILE,),
        in_specs=[
            pl.BlockSpec((c, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_SUMS, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((c, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(pp.shape, jnp.float32),
            jax.ShapeDtypeStruct(pp.shape, jnp.float32),
        ],
        interpret=interpret,
    )(pp, gp, cot.astype(jnp.float32))
    return dp[:, :n].astype(p.dtype), dg[:, :n].astype(g.dtype)


#: trace-time stack for :func:`spatial_mesh_context`; ``None`` entries
#: suppress the redirection inside a shard body (reentrancy guard)
_SPATIAL_STACK: list = []


@contextlib.contextmanager
def spatial_mesh_context(mesh, data_axis: str = "data", model_axis: str = "model"):
    """Trace-time context: every :func:`loss_sums_nhwc` call inside it is
    partitioned explicitly over ``mesh`` via :func:`loss_sums_nhwc_spatial`.
    The trainers enter it around their losses_fn when ``--spatial_partition``
    is active, so the composite/sequential loss paths — whose reductions are
    reached through the parity-frozen ``seven_losses*`` signatures — shard
    without threading a mesh through every loss function."""
    _SPATIAL_STACK.append((mesh, data_axis, model_axis))
    try:
        yield
    finally:
        _SPATIAL_STACK.pop()


def loss_sums_nhwc_spatial(probs: jax.Array, labels: jax.Array, mesh,
                           data_axis: str = "data", model_axis: str = "model",
                           use_pallas: bool | None = None,
                           interpret: bool = False):
    """:func:`loss_sums_nhwc` partitioned over a ``(data, model)`` mesh
    (batch over ``data``, image rows over ``model`` — the
    ``--spatial_partition`` layout).  A bare ``pallas_call`` is opaque to
    GSPMD, so unwrapped the partitioner would gather the full-resolution
    probs/labels per device; here each shard reduces its own rows (kernel or
    jnp body, the normal selection) and one ``psum`` yields the global
    ``(8, C)`` sums — exact because every row is a plain sum and the count
    row composes additively."""
    from jax.sharding import PartitionSpec as P

    def local_fn(p, g):
        _SPATIAL_STACK.append(None)  # the shard body must not re-enter
        try:
            part = loss_sums_nhwc(p, g, use_pallas=use_pallas,
                                  interpret=interpret)
        finally:
            _SPATIAL_STACK.pop()
        return jax.lax.psum(part, (data_axis, model_axis))

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(data_axis, model_axis), P(data_axis, model_axis)),
        out_specs=P(None, None), check_vma=False,
    )(probs, labels)


def loss_sums_nhwc(probs: jax.Array, labels: jax.Array,
                   use_pallas: bool | None = None, interpret: bool = False):
    """NHWC -> (8, C) sums.  ``use_pallas=None`` auto-selects: the Pallas
    kernel on TPU, the jnp reference elsewhere (identical math); ``interpret``
    picks the kernel's execution mode when the kernel is selected (CPU
    tests).  ``LOSS_SUMS_USE_PALLAS=0`` forces the jnp path (partitions
    natively under GSPMD).  Inside :func:`spatial_mesh_context` the call
    reroutes to :func:`loss_sums_nhwc_spatial`."""
    import os

    if _SPATIAL_STACK and _SPATIAL_STACK[-1] is not None:
        mesh, da, ma = _SPATIAL_STACK[-1]
        return loss_sums_nhwc_spatial(probs, labels, mesh, da, ma,
                                      use_pallas, interpret)
    c = probs.shape[-1]
    p = probs.reshape(-1, c).T
    g = labels.reshape(-1, c).T
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and os.environ.get("LOSS_SUMS_USE_PALLAS", "1")
                      not in ("0", "false"))
    if not use_pallas:
        return _sums_reference(p, g)
    return fused_loss_sums(p, g, interpret)
