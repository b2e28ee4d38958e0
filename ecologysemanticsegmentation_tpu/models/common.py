"""Shared model building blocks (flax.linen, NHWC, bf16-compute/f32-params)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


class StochasticDropout(nn.Module):
    """Element-wise Bernoulli dropout with survival-rate scaling.

    Behavioral rebuild of the reference's ``StochasticDropout``
    (``model/dropout.py:14-46``, itself adapted from torchvision stochastic
    depth but applied element-wise): each element survives with probability
    ``1 - p`` and surviving elements are scaled by ``1 / (1 - p)``.
    """

    p: float = 0.05

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = False) -> jax.Array:
        if self.p == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.p
        # Mask from 16 hardware-RNG bits per element instead of a 32-bit
        # threefry uniform: the VGG U-Net draws element-wise masks over
        # full-resolution activations, and a single (128,256,256,64) mask
        # measured 15.3 ms with threefry bernoulli vs 8.7 ms with an
        # unsafe_rbg uint16-threshold compare (~25% of its whole train step
        # was mask generation).  Distribution is Bernoulli(keep) with keep
        # quantized to 1/65536 — at p=0.05 that is |Δp| ≤ 8e-6; the
        # survival scaling below uses the exact keep.
        rbg = jax.random.wrap_key_data(
            jnp.tile(jax.random.key_data(rng), 2), impl="unsafe_rbg"
        )
        thresh = jnp.uint16(min(round(keep * 65536), 65535))
        bits = jax.random.bits(rbg, x.shape, jnp.uint16)
        noise = (bits < thresh).astype(x.dtype) / keep
        # Inert outside a remat region: under the VGG U-Net's per-stage
        # remat policy this keeps the mask as a saved residual (regenerating
        # it in the backward replay would double the measured RNG cost).
        noise = checkpoint_name(noise, "sd_mask")
        return x * noise


class NearestUpConcatConv(nn.Module):
    """``conv3x3(concat([nearest_x2(x), skip]))`` (or ``[skip, up]``) without
    materializing the upsample or the concat.

    The x2-nearest-upsampled operand never exists: ``conv3x3(nearest2(x))``
    equals a single ``conv_general_dilated`` with ``lhs_dilation=(2, 2)``,
    padding (2, 2) and the composed kernel ``k4[a, b] = sum_{t,s in {0,1}}
    k3[a-t, b-s]`` (nearest-x2 is a transposed conv with a 2x2 ones kernel;
    composing folds the ones into a 4x4 kernel — exact, see
    tests/test_models.py).  ``conv(concat([a, b]))`` splits into two convs
    over kernel input-channel slices, summed.  Measured on the VGG U-Net
    step (v5e, batch 128): the materialized nearest upsample alone was a
    25 ms broadcast fwd + 13.5 ms reduce bwd, and the concat a 10.7 ms
    split bwd.

    Parameter layout is IDENTICAL to the ``nn.Conv`` it replaces — one
    ``kernel`` of shape (3, 3, C_up + C_skip, F) (+ optional bias) with the
    same initializer — so checkpoints, importers and torch-parity maps are
    unchanged.  ``up_first`` selects which kernel input-channel slice the
    upsampled operand owns (matches the replaced concat's order).
    """

    features: int
    use_bias: bool = False
    up_first: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, low: jax.Array, skip: jax.Array | None = None) -> jax.Array:
        cx = low.shape[-1]
        cs = 0 if skip is None else skip.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),  # nn.Conv's default
            (3, 3, cx + cs, self.features), jnp.float32,
        )
        if self.up_first:
            ku, ks = kernel[:, :, :cx], kernel[:, :, cx:]
        else:
            ks, ku = kernel[:, :, :cs], kernel[:, :, cs:]
        k4 = jnp.zeros((4, 4, cx, self.features), jnp.float32)
        for t in (0, 1):
            for s in (0, 1):
                k4 = k4.at[t:t + 3, s:s + 3].add(ku)
        dn = ("NHWC", "HWIO", "NHWC")
        out = jax.lax.conv_general_dilated(
            low.astype(self.dtype), k4.astype(self.dtype), (1, 1),
            ((2, 2), (2, 2)), lhs_dilation=(2, 2), dimension_numbers=dn,
        )
        if skip is not None:
            out = out + jax.lax.conv_general_dilated(
                skip.astype(self.dtype), ks.astype(self.dtype), (1, 1),
                "SAME", dimension_numbers=dn,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class NearestUpDepthwiseConv(nn.Module):
    """``depthwise3x3(nearest_x2(x))`` without materializing the upsample —
    the grouped-conv twin of :class:`NearestUpConcatConv`: one grouped
    ``conv_general_dilated`` with ``lhs_dilation=(2, 2)`` and the 3x3 kernel
    composed with ones(2, 2) into a per-channel 4x4 kernel (exact identity,
    tests/test_models.py).  Removes the x4-size mid-channel tensor the
    MBDeconv stride-2 path previously wrote/read around its depthwise conv.

    Parameter layout matches ``nn.Conv(C, (3, 3), feature_group_count=C)``
    (kernel (3, 3, 1, C)) so checkpoints are unchanged.
    """

    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, low: jax.Array) -> jax.Array:
        c = low.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, c), jnp.float32
        )
        k4 = jnp.zeros((4, 4, 1, c), jnp.float32)
        for t in (0, 1):
            for s in (0, 1):
                k4 = k4.at[t:t + 3, s:s + 3].add(kernel)
        out = jax.lax.conv_general_dilated(
            low.astype(self.dtype), k4.astype(self.dtype), (1, 1),
            ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class ConvBNAct(nn.Module):
    """Conv → BatchNorm → activation, the workhorse block.

    BatchNorm uses torch-equivalent hyperparameters (momentum 0.9 here ==
    torch momentum 0.1; eps 1e-5).  Under jit with a batch-sharded input the
    batch statistics are *global* across data-parallel replicas automatically
    (GSPMD inserts the cross-replica reductions), which supersedes the
    reference's single-device BatchNorm and its ``batch > 1`` guard
    (reference ``train_multiclass.py:131``).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        if isinstance(x, tuple):
            # (x_lowres, skip_or_None) marks a fused nearest-x2 entry: the
            # upsampled tensor (and the concat, if skip is given) never
            # materializes.  Dispatch on the conv this block would have run —
            # both fused modules keep the same "conv" parameter layout.
            # (A third variant — contracting a 1x1 conv's low-res operand
            # before upsampling — measured 1.4-1.9x SLOWER than the
            # materialized concat and was removed; RESULTS.md round 3.)
            assert (self.strides, self.dilation) == ((1, 1), (1, 1))
            assert self.kernel_size == (3, 3)
            low, skip = x
            if self.groups != 1:
                # depthwise3x3(nearest_x2(low)) as one grouped dilated conv
                assert skip is None
                assert self.groups == self.features == low.shape[-1]
                x = NearestUpDepthwiseConv(
                    use_bias=self.use_bias, dtype=self.dtype, name="conv",
                )(low)
            else:
                x = NearestUpConcatConv(
                    self.features, use_bias=self.use_bias, up_first=True,
                    dtype=self.dtype, name="conv",
                )(low, skip)
        else:
            x = nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                kernel_dilation=self.dilation,
                feature_group_count=self.groups,
                padding="SAME" if self.strides == (1, 1) else [
                    ((k - 1) * d // 2, (k - 1) * d // 2)
                    for k, d in zip(self.kernel_size, self.dilation)
                ],
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def _shift2d(x: jax.Array, oi: int, oj: int) -> jax.Array:
    """``out[b, y, x_] = in[b, y+oi, x_+oj]`` with zero fill (static offsets)."""
    _, h, w, _ = x.shape
    sl = x[:, max(oi, 0): h + min(oi, 0), max(oj, 0): w + min(oj, 0), :]
    return jnp.pad(sl, ((0, 0), (max(-oi, 0), max(oi, 0)),
                        (max(-oj, 0), max(oj, 0)), (0, 0)))


class DepthwiseConv(nn.Module):
    """Depthwise KxK conv with a dilation-aware TPU lowering.

    For ``dilation == 1`` XLA's grouped-conv path is fastest (measured).  For
    the ASPP's large dilations a grouped ``lax.conv`` zero-pads the input to
    many times the feature map's area (rate 36 on a 16x16 map pads to 88x88,
    ~800 MB at batch 128) and runs off-MXU over it — measured at ~9% MFU for
    the ASPP/decoder (RESULTS.md stage budget).  Those branches instead use a
    static shift-and-add: K*K fused VPU multiply-adds over shifted views,
    where taps whose offset exceeds the map are dropped at *trace* time (for
    a 16x16 map, rates 24/36 reduce exactly to the center tap — the same
    zero-padded math as the reference's torch conv).

    Parameter name/shape (``kernel``: (K, K, 1, C)) and initializer match
    ``nn.Conv(feature_group_count=C)`` so init streams, checkpoints, and the
    torch state-dict importer are unchanged.
    """

    kernel_size: tuple[int, int] = (3, 3)
    dilation: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> jax.Array:
        parts = x if isinstance(x, (tuple, list)) else (x,)
        c = sum(p.shape[-1] for p in parts)
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, 1, c), jnp.float32
        )
        outs, off = [], 0
        for p in parts:
            pc = p.shape[-1]
            outs.append(self._one(p, kernel[..., off:off + pc]))
            off += pc
        return outs[0] if len(outs) == 1 else tuple(outs)

    def _one(self, x: jax.Array, kernel: jax.Array) -> jax.Array:
        c = x.shape[-1]
        kh, kw = self.kernel_size
        _, h, w, _ = x.shape
        dh, dw = self.dilation
        xb = x.astype(self.dtype)
        if max(dh, dw) == 1:
            pad = [((k - 1) // 2,) * 2 for k in (kh, kw)]
            return jax.lax.conv_general_dilated(
                xb, kernel.astype(self.dtype), window_strides=(1, 1),
                padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
        out = None
        for i in range(kh):
            oi = (i - kh // 2) * dh
            if abs(oi) >= h:
                continue  # tap entirely out of bounds -> zero contribution
            for j in range(kw):
                oj = (j - kw // 2) * dw
                if abs(oj) >= w:
                    continue
                term = _shift2d(xb, oi, oj) * kernel[i, j, 0].astype(self.dtype)
                out = term if out is None else out + term
        if out is None:  # degenerate: every tap out of bounds
            out = jnp.zeros_like(xb)
        return out


class _PointwiseConv(nn.Module):
    """1x1 conv that accepts a *virtual concat*: a tuple of NHWC parts is
    contracted against the matching row-slices of one (1, 1, sum(C), F)
    kernel and summed — algebraically identical to ``conv1x1(concat(parts))``
    with the same parameter (so checkpoints/importers are unchanged), but the
    channel-concatenated tensor never materializes.  On TPU a concat at a
    non-128-multiple channel offset (e.g. 48+256 in the DeepLabV3+ decoder)
    is a lane-unaligned relayout of the whole activation — measured as the
    dominant cost of the decoder (RESULTS.md decoder budget)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> jax.Array:
        parts = x if isinstance(x, (tuple, list)) else (x,)
        cin = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, cin, self.features), jnp.float32,
        )
        out, off = None, 0
        for p in parts:
            pc = p.shape[-1]
            w = kernel[0, 0, off:off + pc].astype(self.dtype)  # (pc, F)
            term = jax.lax.dot_general(
                p.astype(self.dtype), w,
                dimension_numbers=(((3,), (0,)), ((), ())),
            )
            out = term if out is None else out + term
            off += pc
        return out


class SeparableConvBNAct(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 separable conv with BN/act — the ASPP and
    DeepLabV3+ decoder conv type (smp ``SeparableConv2d`` equivalent).

    Accepts a tuple of NHWC tensors as a virtual channel-concat (see
    :class:`_PointwiseConv`): depthwise runs per part on its kernel slice,
    the pointwise contraction sums per-part matmuls — same math and params
    as concatenating first, minus the unaligned concat relayout."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    dilation: tuple[int, int] = (1, 1)
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        x = DepthwiseConv(
            self.kernel_size, self.dilation, dtype=self.dtype, name="depthwise"
        )(x)
        x = _PointwiseConv(self.features, dtype=self.dtype, name="pointwise")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def leaky_relu(x: jax.Array) -> jax.Array:
    """torch nn.LeakyReLU default (negative_slope=0.01)."""
    return nn.leaky_relu(x, negative_slope=0.01)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(kernel_size=3, stride=2, padding=1)`` equivalent."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(2, 2)`` equivalent (VGG)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))
