"""Fused head-upsample + sigmoid + loss-sums (Pallas TPU kernel, custom VJP).

The flagship model's head emits logits at 1/4 resolution and bilinearly
upsamples them x4 to the input size before sigmoid + the 7-loss tuple
(reference smp DeepLabV3Plus decoder; ``train_multiclass.py:105-148``).
Left unfused, that materializes per step (batch 128 @ 256px, C=3):

  * the 256^2 upsampled logits (fwd write + bwd read),
  * the sigmoided probability tensor,
  * channel-major ``(C, N)`` transposes of BOTH probs and labels for the
    flat loss-sums kernel (:mod:`.loss_sums`),
  * full-resolution ``dp``/``dg`` cotangents on the way back,

several hundred MB of pure HBM traffic.  This kernel consumes the
1/4-resolution logits directly: the x4 bilinear upsample is two small
matmuls against compile-time interpolation matrices (the same separable
form as :func:`...ops.resize.resize_bilinear`), executed on the MXU
*inside* the kernel per batch tile, followed by sigmoid and the seven
per-channel reductions of :mod:`.loss_sums` — one pass over the labels,
and the full-resolution probability field never exists in HBM.  The
backward kernel recomputes the upsample (logits are tiny) and projects
the elementwise cotangent back through the transposed matrices, emitting
gradients at 1/4 resolution.

Semantics match ``loss_sums_nhwc(sigmoid(upsample(logits)), labels)``
except the upsampled logits stay f32 in-register instead of being
quantized to bf16 between the resize and the sigmoid (strictly more
precise; measured Dice impact of the bf16 path is < 0.005, RESULTS.md).

Layout notes: NHWC tensors enter with H as sublanes and W*C flattened on
lanes; the W-dimension interpolation matrix is expanded to a
channel-block-diagonal ``(w*C, W*C)`` operand so both matmuls act on the
native layout with no in-kernel transposes.  Per-channel sums come out
of a final ``(8, W*C) @ (W*C, C)`` contraction performed outside the
kernel (tiny).

Falls back to a pure-jnp reference off-TPU (identical math, used by CPU
tests and via ``interpret=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _DEVICE_OPERAND_ELEMS, _interp_matrix, _interp_matrix_device
from .loss_sums import EPS, GAMMA, NUM_SUMS, _sums_reference


def _upsample_mats(h: int, w: int, H: int, W: int, c: int, align_corners: bool):
    """Interpolation operands: (H, h) row matrix and (w*c, W*c)
    channel-block column matrix such that ``U[n] = Mh @ X[n] @ Mwc``
    upsamples an NHWC item flattened to (h, w*c) -> (H, W*c).

    Below :data:`..resize._DEVICE_OPERAND_ELEMS` these are host numpy,
    baked in as compile-time constants (byte-identical programs for the
    benched 256px configs).  Above it (IMGSIZE >= ~724 @ x4) they are
    built on device from iota — MUST be called inside the traced fwd/bwd
    so large-image programs don't carry multi-MB HLO constants (the
    512px remote-compile incident, RESULTS round 3) — and use the exact
    construction :func:`...ops.resize.resize_bilinear` selects at the
    same size, so ``head_sums_reference`` parity holds bitwise in the
    operand weights."""
    if H * h >= _DEVICE_OPERAND_ELEMS:
        mh = _interp_matrix_device(H, h, align_corners)  # (H, h) on device
    else:
        mh = _interp_matrix(H, h, align_corners)
    if W * w >= _DEVICE_OPERAND_ELEMS:
        mwc = jnp.kron(_interp_matrix_device(W, w, align_corners).T,
                       jnp.eye(c, dtype=jnp.float32))
    elif (w * c) * (W * c) >= 4 * _DEVICE_OPERAND_ELEMS:
        # mw itself stays a baked constant (bitwise the host form that
        # resize_bilinear selects at this size) but its c^2-fold
        # channel-block expansion is built on device: at 512px C=3 this
        # replaces a 2.3 MB HLO constant with a 260 KB one + a kron.
        # The 4x-higher threshold keeps the benched 256px expansion
        # (192x768 = 576 KB) baked — identical compiled programs there.
        mwc = jnp.kron(jnp.asarray(_interp_matrix(W, w, align_corners).T),
                       jnp.eye(c, dtype=jnp.float32))
    else:
        mw = _interp_matrix(W, w, align_corners)  # (W, w)
        mwc = np.zeros((w * c, W * c), np.float32)
        for ch in range(c):
            mwc[ch::c, ch::c] = mw.T
    return mh, mwc


def _transposed(m):
    """Contiguous transpose; stays host-side for host constants."""
    return np.ascontiguousarray(m.T) if isinstance(m, np.ndarray) else m.T


def _elementwise_sums(p: jax.Array, g: jax.Array) -> jax.Array:
    """The seven reduction integrands over one (H, W*C) tile; returns
    (8, W*C) with row 7 the count of non-ignored pixels.  Pixels with
    ``g < 0`` (the ``-1`` ignore sentinel) drop out of every row — the same
    masking as ``loss_sums._sums_reference``; on clean ``{0,1}`` labels
    ``w == 1`` and the sums (incl. the count) are unchanged."""
    w = (g >= 0).astype(jnp.float32)
    g = g * w
    one_m_p = 1.0 - p
    pow_1mp = one_m_p * jnp.sqrt(one_m_p)
    pow_p = p * jnp.sqrt(p)
    rows = [
        jnp.sum(g, axis=0),
        jnp.sum(w * p, axis=0),
        jnp.sum(w * p * p, axis=0),
        jnp.sum(g * p, axis=0),
        jnp.sum(w * pow_1mp * jnp.log(p + EPS), axis=0),
        jnp.sum(w * pow_p * jnp.log(one_m_p + EPS), axis=0),
        jnp.sum(w * (jnp.maximum(p, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(p)))), axis=0),
        jnp.sum(w, axis=0),
    ]
    return jnp.stack(rows)


def _fwd_kernel(x_ref, g_ref, mh_ref, mwc_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    mh = mh_ref[:, :]
    mwc = mwc_ref[:, :]
    bb = x_ref.shape[0]
    acc = jnp.zeros_like(out_ref)
    for b in range(bb):  # static unroll over the batch tile
        x = x_ref[b].astype(jnp.float32)           # (h, w*C)
        u = jnp.dot(mh, x, preferred_element_type=jnp.float32)    # (H, w*C)
        u = jnp.dot(u, mwc, preferred_element_type=jnp.float32)   # (H, W*C)
        p = jax.nn.sigmoid(u)
        g = g_ref[b].astype(jnp.float32)
        acc = acc + _elementwise_sums(p, g)
    out_ref[:, :] += acc


def _bwd_kernel(x_ref, g_ref, w_ref, mh_ref, mwc_ref, mhT_ref, mwcT_ref, dx_ref):
    mh = mh_ref[:, :]
    mwc = mwc_ref[:, :]
    mhT = mhT_ref[:, :]
    mwcT = mwcT_ref[:, :]
    w = w_ref[:, :]  # (8, W*C) lane-broadcast cotangent weights

    bb = x_ref.shape[0]
    for b in range(bb):
        x = x_ref[b].astype(jnp.float32)
        u = jnp.dot(mh, x, preferred_element_type=jnp.float32)
        u = jnp.dot(u, mwc, preferred_element_type=jnp.float32)
        p = jax.nn.sigmoid(u)
        g = g_ref[b].astype(jnp.float32)
        # ignore mask, as in _elementwise_sums: masked pixels contribute no dp
        msk = (g >= 0).astype(jnp.float32)
        g = g * msk
        one_m_p = 1.0 - p
        # d(sums)/dp with the (8, C) cotangent applied (cf. loss_sums._bwd_kernel)
        dp = (
            w[1]
            + w[2] * 2.0 * p
            + w[3] * g
            + w[4] * (one_m_p * jnp.sqrt(one_m_p) / (p + EPS)
                      - GAMMA * jnp.sqrt(one_m_p) * jnp.log(p + EPS))
            + w[5] * (GAMMA * jnp.sqrt(p) * jnp.log(one_m_p + EPS)
                      - p * jnp.sqrt(p) / (one_m_p + EPS))
            + w[6] * ((p > 0).astype(jnp.float32)
                      - jnp.sign(p) / (1.0 + jnp.exp(jnp.abs(p))))
        )
        du = msk * dp * p * one_m_p  # sigmoid'
        dx = jnp.dot(mhT, du, preferred_element_type=jnp.float32)   # (h, W*C)
        dx = jnp.dot(dx, mwcT, preferred_element_type=jnp.float32)  # (h, w*C)
        dx_ref[b] = dx.astype(dx_ref.dtype)


def _fwd_kernel_rows(x_ref, g_ref, mh_ref, mwc_ref, o_ref):
    """Row-blocked fwd: grid (B, H//Hb); the (Hb, h) slice of the row
    interpolation matrix selects this block's output rows, so the labels
    tile shrinks to Hb rows and IMGSIZE >= 512 fits VMEM."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    x = x_ref[0].astype(jnp.float32)                              # (h, w*C)
    u = jnp.dot(mh_ref[...], x, preferred_element_type=jnp.float32)
    u = jnp.dot(u, mwc_ref[...], preferred_element_type=jnp.float32)
    p = jax.nn.sigmoid(u)
    g = g_ref[0].astype(jnp.float32)
    o_ref[:, :] += _elementwise_sums(p, g)


def _bwd_kernel_rows(x_ref, g_ref, w_ref, mh_ref, mwc_ref, dx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dx_ref[0] = jnp.zeros_like(dx_ref[0])

    mh = mh_ref[...]          # (Hb, h) block rows
    mwc = mwc_ref[...]        # (w*C, W*C) — also used transposed via
    w = w_ref[:, :]           # dot_general so no mhT/mwcT operands (they
                              # would double the irreducible VMEM share)

    x = x_ref[0].astype(jnp.float32)
    u = jnp.dot(mh, x, preferred_element_type=jnp.float32)
    u = jnp.dot(u, mwc, preferred_element_type=jnp.float32)
    p = jax.nn.sigmoid(u)
    g = g_ref[0].astype(jnp.float32)
    msk = (g >= 0).astype(jnp.float32)  # ignore mask (cf. _elementwise_sums)
    g = g * msk
    one_m_p = 1.0 - p
    dp = (
        w[1]
        + w[2] * 2.0 * p
        + w[3] * g
        + w[4] * (one_m_p * jnp.sqrt(one_m_p) / (p + EPS)
                  - GAMMA * jnp.sqrt(one_m_p) * jnp.log(p + EPS))
        + w[5] * (GAMMA * jnp.sqrt(p) * jnp.log(one_m_p + EPS)
                  - p * jnp.sqrt(p) / (one_m_p + EPS))
        + w[6] * ((p > 0).astype(jnp.float32)
                  - jnp.sign(p) / (1.0 + jnp.exp(jnp.abs(p))))
    )
    du = msk * dp * p * one_m_p                                   # (Hb, W*C)
    dz = jax.lax.dot_general(                                     # du @ mwc^T
        du, mwc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (Hb, w*C)
    dx = jax.lax.dot_general(                                     # mh^T @ dz
        mh, dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (h, w*C)
    dx_ref[0] += dx.astype(dx_ref.dtype)


def head_sums_reference(logits_lr: jax.Array, labels: jax.Array,
                        align_corners: bool = True) -> jax.Array:
    """Pure-jnp reference: f32 upsample + sigmoid + the (8, C) sums."""
    from ..resize import resize_bilinear

    up = resize_bilinear(logits_lr.astype(jnp.float32), labels.shape[1:3],
                         align_corners=align_corners)
    p = jax.nn.sigmoid(up)
    c = p.shape[-1]
    return _sums_reference(p.reshape(-1, c).T, labels.reshape(-1, c).T)


@functools.lru_cache(maxsize=8)
def _make_fused_rows(shape_lr, shape_hr, align_corners: bool, interpret: bool,
                     row_block: int):
    """Row-blocked build for large images: grid (B, H//row_block); the
    labels stream through VMEM ``row_block`` rows at a time while the tiny
    low-res logits stay resident.  Same custom-VJP contract as
    :func:`_make_fused`."""
    B, h, w, C = shape_lr
    _, H, W, _ = shape_hr
    nb = H // row_block

    def _full(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def _fwd(logits, labels):
        # Built inside the trace: above the constant threshold the
        # operands are device iota programs, not baked HLO constants.
        mh, mwc = _upsample_mats(h, w, H, W, C, align_corners)
        x = logits.reshape(B, h, w * C)
        g = labels.reshape(B, H, W * C)
        out = pl.pallas_call(
            _fwd_kernel_rows,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, h, w * C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, row_block, W * C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_block, h), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                _full((w * C, W * C)),
            ],
            out_specs=pl.BlockSpec((NUM_SUMS, W * C), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NUM_SUMS, W * C), jnp.float32),
            interpret=interpret,
        )(x, g, jnp.asarray(mh), jnp.asarray(mwc))
        # row 7 already holds the in-kernel non-ignored count
        sums = out.reshape(NUM_SUMS, W, C).sum(axis=1)
        return sums

    def _bwd(logits, labels, cot):
        mh, mwc = _upsample_mats(h, w, H, W, C, align_corners)
        x = logits.reshape(B, h, w * C)
        g = labels.reshape(B, H, W * C)
        wline = jnp.tile(cot.astype(jnp.float32), (1, W))
        dx = pl.pallas_call(
            _bwd_kernel_rows,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, h, w * C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, row_block, W * C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                _full((NUM_SUMS, W * C)),
                pl.BlockSpec((row_block, h), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                _full((w * C, W * C)),
            ],
            out_specs=pl.BlockSpec((1, h, w * C), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, h, w * C), logits.dtype),
            interpret=interpret,
        )(x, g, wline, jnp.asarray(mh), jnp.asarray(mwc))
        return dx.reshape(B, h, w, C)

    @jax.custom_vjp
    def fused(logits, labels):
        return _fwd(logits, labels)

    def fused_fwd(logits, labels):
        return _fwd(logits, labels), (logits, labels)

    def fused_bwd(res, cot):
        logits, labels = res
        return _bwd(logits, labels, cot), jnp.zeros_like(labels)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


@functools.lru_cache(maxsize=8)
def _make_fused_spatial(shape_lr, shape_hr_local, interpret: bool):
    """Per-shard build for spatial partitioning (:func:`head_sums_spatial`):
    identical kernels to :func:`_make_fused`, but the row-interpolation
    operand enters as a TRACED argument — each device passes the
    ``(H_local, h)`` block of the global matrix that selects its own output
    rows, so the kernel computes this shard's partial sums with no halo
    exchange (the low-res logits are fully replicated across the model
    axis; they are ~100x smaller than the labels)."""
    B, h, w, C = shape_lr
    _, Hl, W, _ = shape_hr_local

    bb = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and cand * Hl * W * C * 4 <= 4 * 2**20:
            bb = cand
            break
    grid = B // bb

    def _full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def _fwd(logits, labels, mh, mwc):
        x = logits.reshape(B, h, w * C)
        g = labels.reshape(B, Hl, W * C)
        out = pl.pallas_call(
            _fwd_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((bb, h, w * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, Hl, W * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _full((Hl, h)),
                _full((w * C, W * C)),
            ],
            out_specs=pl.BlockSpec((NUM_SUMS, W * C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NUM_SUMS, W * C), jnp.float32),
            interpret=interpret,
        )(x, g, mh, mwc)
        # row 7 holds the in-kernel LOCAL non-ignored count; psum -> global
        sums = out.reshape(NUM_SUMS, W, C).sum(axis=1)
        return sums

    def _bwd(logits, labels, mh, mwc, cot):
        x = logits.reshape(B, h, w * C)
        g = labels.reshape(B, Hl, W * C)
        wline = jnp.tile(cot.astype(jnp.float32), (1, W))
        dx = pl.pallas_call(
            _bwd_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((bb, h, w * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, Hl, W * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _full((NUM_SUMS, W * C)),
                _full((Hl, h)),
                _full((w * C, W * C)),
                _full((h, Hl)),
                _full((W * C, w * C)),
            ],
            out_specs=pl.BlockSpec((bb, h, w * C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, h, w * C), logits.dtype),
            interpret=interpret,
        )(x, g, wline, mh, mwc, mh.T, mwc.T)
        return dx.reshape(B, h, w, C)

    @jax.custom_vjp
    def fused(logits, labels, mh, mwc):
        return _fwd(logits, labels, mh, mwc)

    def fused_fwd(logits, labels, mh, mwc):
        return _fwd(logits, labels, mh, mwc), (logits, labels, mh, mwc)

    def fused_bwd(res, cot):
        logits, labels, mh, mwc = res
        return (_bwd(logits, labels, mh, mwc, cot), jnp.zeros_like(labels),
                jnp.zeros_like(mh), jnp.zeros_like(mwc))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def _spatial_sums_reference(x: jax.Array, g: jax.Array, mh_local: jax.Array,
                            mwc: jax.Array) -> jax.Array:
    """Pure-jnp per-shard partial sums (same math as the spatial kernel)."""
    B, h, w, C = x.shape
    _, Hl, W, _ = g.shape
    xf = x.reshape(B, h, w * C).astype(jnp.float32)
    u = jnp.einsum("Hh,bhk->bHk", mh_local, xf)
    u = jnp.einsum("bHk,kK->bHK", u, mwc)
    p = jax.nn.sigmoid(u)
    return _sums_reference(p.reshape(-1, C).T,
                           g.reshape(B, Hl, W, C).reshape(-1, C).T)


def head_sums_spatial(
    logits_lr: jax.Array,
    labels: jax.Array,
    mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    align_corners: bool = True,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Spatially-partitioned :func:`fused_head_loss_sums` (shard_map form).

    For ``--spatial_partition`` training (image rows sharded over the mesh's
    ``model`` axis), a bare ``pallas_call`` is opaque to GSPMD — XLA would
    all-gather the full-resolution labels onto every device.  This wrapper
    makes the partitioning explicit: labels stay row-sharded
    (``P(data, model)``), the 1/4-resolution logits are replicated across
    ``model`` (they are tiny), each device runs the SAME fused kernel on its
    row block with the matching ``(H/n, h)`` slice of the row-interpolation
    matrix (no halo exchange — every output row reads only replicated
    low-res rows), and one ``psum`` over (data, model) produces the global
    ``(8, C)`` sums on every device.  Gradients flow through the kernel's
    custom VJP and the psum; the count row composes because each shard
    contributes its local count.

    Falls back to a jnp body per shard off-TPU (CPU tests run BOTH paths —
    the kernel under ``interpret=True`` — on the virtual mesh)."""
    from jax.sharding import PartitionSpec as P

    n = int(mesh.shape[model_axis])
    dp = int(mesh.shape[data_axis])
    B, h, w, C = logits_lr.shape
    _, H, W, _ = labels.shape
    assert H % n == 0 and B % dp == 0, (H, n, B, dp)
    Hl, Bl = H // n, B // dp
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
        if use_pallas:
            # same degrade rule as fused_head_loss_sums, on the LOCAL block
            fixed = (h * w * C * 4 + (w * C) * (W * C) * 4 * 2
                     + NUM_SUMS * W * C * 4)
            if fixed + Hl * W * C * 4 + 2 * Hl * h * 4 > 12 * 2**20:
                use_pallas = False

    def local_fn(x, g):
        k = jax.lax.axis_index(model_axis)
        mh, mwc = _upsample_mats(h, w, H, W, C, align_corners)
        mh_local = jax.lax.dynamic_slice_in_dim(jnp.asarray(mh), k * Hl, Hl, 0)
        mwc = jnp.asarray(mwc)
        if use_pallas:  # same contract as fused_head_loss_sums:
            # use_pallas=False ALWAYS selects the jnp reference; interpret
            # only chooses how the kernel executes when use_pallas is set
            fused = _make_fused_spatial((Bl, h, w, C), (Bl, Hl, W, C),
                                        bool(interpret))
            part = fused(x, g, mh_local, mwc)
        else:
            part = _spatial_sums_reference(x, g, mh_local, mwc)
        return jax.lax.psum(part, (data_axis, model_axis))

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the vma checker (jax >= 0.8) rejects inside shard_map.
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(data_axis), P(data_axis, model_axis)),
        out_specs=P(None, None), check_vma=False,
    )(logits_lr, labels)


@functools.lru_cache(maxsize=8)
def _make_fused(shape_lr, shape_hr, align_corners: bool, interpret: bool):
    """Build the custom-VJP fused op for static shapes.

    ``shape_lr`` = (B, h, w, C) logits, ``shape_hr`` = (B, H, W, C) labels.
    Returns ``fused(logits, labels) -> (8, C) f32 sums``.
    """
    B, h, w, C = shape_lr
    _, H, W, _ = shape_hr

    # Batch tile: largest power of two <= 8 dividing B, bounded by VMEM
    # (labels tile bb*H*W*C*4B must stay well under the ~16 MB budget).
    bb = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and cand * H * W * C * 4 <= 4 * 2**20:
            bb = cand
            break
    grid = B // bb

    def _full(shape):  # operand broadcast to every grid step
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def _fwd(logits, labels):
        mh, mwc = _upsample_mats(h, w, H, W, C, align_corners)
        x = logits.reshape(B, h, w * C)
        g = labels.reshape(B, H, W * C)
        out = pl.pallas_call(
            _fwd_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((bb, h, w * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, H, W * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _full((H, h)),
                _full((w * C, W * C)),
            ],
            out_specs=pl.BlockSpec((NUM_SUMS, W * C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NUM_SUMS, W * C), jnp.float32),
            interpret=interpret,
        )(x, g, jnp.asarray(mh), jnp.asarray(mwc))
        # (8, W*C) -> per-channel (8, C); row 7 is the in-kernel count.
        sums = out.reshape(NUM_SUMS, W, C).sum(axis=1)
        return sums

    def _bwd(logits, labels, cot):
        mh, mwc = _upsample_mats(h, w, H, W, C, align_corners)
        mhT, mwcT = _transposed(mh), _transposed(mwc)
        x = logits.reshape(B, h, w * C)
        g = labels.reshape(B, H, W * C)
        wline = jnp.tile(cot.astype(jnp.float32), (1, W))  # (8, W*C)
        dx = pl.pallas_call(
            _bwd_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((bb, h, w * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, H, W * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                _full((NUM_SUMS, W * C)),
                _full((H, h)),
                _full((w * C, W * C)),
                _full((h, H)),
                _full((W * C, w * C)),
            ],
            out_specs=pl.BlockSpec((bb, h, w * C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, h, w * C), logits.dtype),
            interpret=interpret,
        )(x, g, wline, jnp.asarray(mh), jnp.asarray(mwc),
          jnp.asarray(mhT), jnp.asarray(mwcT))
        return dx.reshape(B, h, w, C)

    @jax.custom_vjp
    def fused(logits, labels):
        return _fwd(logits, labels)

    def fused_fwd(logits, labels):
        return _fwd(logits, labels), (logits, labels)

    def fused_bwd(res, cot):
        logits, labels = res
        dlogits = _bwd(logits, labels, cot)
        # Labels carry no parameters upstream; a zeros cotangent is DCE'd
        # under jit (the train step never uses d(loss)/d(labels)).
        return dlogits, jnp.zeros_like(labels)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_head_loss_sums(
    logits_lr: jax.Array,
    labels: jax.Array,
    align_corners: bool = True,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(B, h, w, C) low-res logits + (B, H, W, C) labels -> (8, C) sums of
    ``sigmoid(bilinear_upsample(logits))`` against ``labels``.

    Differentiable in ``logits_lr`` (custom VJP; recompute-in-backward).
    ``use_pallas=None`` auto-selects the kernel on TPU and the jnp
    reference elsewhere.
    """
    assert logits_lr.ndim == 4 and labels.ndim == 4
    assert logits_lr.shape[0] == labels.shape[0]
    assert logits_lr.shape[-1] == labels.shape[-1]
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    row_block = None
    if use_pallas:
        # Even at bb=1 the kernel must hold one label item, one logit item,
        # the two interpolation operands and the (8, W*C) accumulator in
        # VMEM (~16 MB).  Oversized configs (IMGSIZE >= 512 with C=3) fall
        # to the ROW-BLOCKED kernels (grid (B, H//Hb): labels stream Hb
        # rows at a time, the row matrix is block-sliced); only when even
        # the blocked operands don't fit (the (w*C, W*C) column operand is
        # irreducible — IMGSIZE ~2048+) degrade to the jnp reference.
        B, h, w, C = logits_lr.shape
        _, H, W, _ = labels.shape
        # the single-tile path's bwd also holds the transposed operands
        fixed = (
            h * w * C * 4                # one logit item
            + (w * C) * (W * C) * 4      # column interpolation operand
            + NUM_SUMS * W * C * 4       # accumulator / cotangent line
        )
        budget = 12 * 2**20
        single = (fixed + (w * C) * (W * C) * 4  # mwcT in the unblocked bwd
                  + H * W * C * 4 + 2 * H * h * 4)
        if single > budget:
            # row-blocked kernels: labels stream Hb rows at a time and the
            # bwd reuses mh/mwc via dot_general (no transposed operands)
            for hb in (256, 128, 64, 32):
                if H % hb == 0 and hb < H and (
                        fixed + hb * W * C * 4 + hb * h * 4 <= budget):
                    row_block = hb
                    break
            else:
                use_pallas = False
    if not use_pallas:
        return head_sums_reference(logits_lr, labels, align_corners)
    if row_block is not None:
        fused = _make_fused_rows(tuple(logits_lr.shape), tuple(labels.shape),
                                 bool(align_corners), bool(interpret), row_block)
    else:
        fused = _make_fused(tuple(logits_lr.shape), tuple(labels.shape),
                            bool(align_corners), bool(interpret))
    return fused(logits_lr, labels)
