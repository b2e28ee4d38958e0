"""VGG19-BN U-Net with StochasticDropout and optional deep supervision.

Behavioral rebuild of the reference's custom ``VGGUNet``
(``model/vgg.py:9-212``), the exported-but-superseded ``vgg_unet``
(``model/__init__.py:8-15``):

* Encoder = vgg19_bn feature stack *truncated* at the first conv whose output
  width exceeds ``max_channels`` (``vgg.py:121-127``); a ``StochasticDropout``
  follows every ReLU once widths reach ``dropout_min_channels``
  (``vgg.py:150-158``).  Pre-MaxPool tensors are collected as skip
  connections, deepest-first (``vgg.py:177-187``).
* Decoder channel plan ``[512x5, 256, 256, 128, 64]`` with upsample flags
  ``[T,F,F,T,F,T,F,T,T]``, filtered by ``max_channels`` (``vgg.py:60-66``).
  Upsample stages do nearest x2 + concat(encoder_skip, x) (``vgg.py:115-120``).
* ``DeconvNormActivation`` = N x (3x3/1x1 conv -> BN -> LeakyReLU ->
  optional StochasticDropout) (``vgg.py:9-47``); the final 1x1 head *also*
  carries BN + LeakyReLU — a reference quirk kept for parity.
* Deep supervision: side heads over the pre-upsample decoder tensors with
  input widths ``[512,512,512,256,128]`` (``vgg.py:190-193,203-210``),
  returned shallowest-first (reversed), plumbing the reference's
  README "TODO: DEEPSUPERVISION" into a working path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from .common import (
    NearestUpConcatConv,
    StochasticDropout,
    leaky_relu,
    max_pool_2x2,
)

Dtype = Any

# Rematerialization (the ``remat`` option): a save-only-conv-outputs policy
# over the WHOLE encoder+decoder was tried and REJECTED — the backward replay
# of a whole region holds its recompute temporaries alongside the saved set,
# and HBM use grew from <15.75G to 20.4G (compile-time OOM) at batch 128 @
# 256px (RESULTS.md round 3, experiments/vgg_remat_oom.log).  ``remat=True``
# instead wraps each encoder pool-stage and each decoder block in its OWN
# remat region (policy: save tagged conv outputs + dropout masks), bounding
# the replay working set to one stage's temporaries while still dropping the
# BN/LeakyReLU/ReLU intermediates from the residual set.
#
# The remat regions are BARRIER-FREE by default (``prevent_cse=False``):
# jax.checkpoint's optimization_barrier ops are what distinguishes the remat
# program from the plain one at the XLA level, and the axon terminal's TPU
# compile helper 500s on the barrier form (ROADMAP round 3).  The barrier-free
# form compiles and runs on the real chip — measured cost vs plain is noise
# (b64: 245.3 vs 246.6 img/s; b128: 315.7 vs 316.4; RESULTS.md round 4) —
# while XLA *may* CSE some recomputation back.  VGG_REMAT_PREVENT_CSE=1
# restores the strict barriers for backends that accept them.  Read at
# trace time.
#
# MEASURED MEMORY CLAIM (round 5, b192 @ 256px differential OOM reports,
# /tmp/vgg_remat_bench.jsonl -> RESULTS.md): on this XLA/libtpu the
# barrier-free form is a memory NO-OP — plain and remat both peak at
# exactly 23.18G — i.e. XLA CSEs the recomputation back in full; and the
# strict-barrier form nearly DOUBLES peak HBM (42.53G: barriers pin both
# the saved set and replay temporaries across the schedule).  On this
# backend ``remat=True`` is therefore cost-free but buys no batch/size
# headroom; the flag's value is portability to backends whose scheduler
# honors checkpoint barriers sanely.

# vgg19_bn configuration "E": conv widths with 'M' max-pools.
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

_DECODER_CHANNELS = [512, 512, 512, 512, 512, 256, 256, 128, 64]
_DECODER_UPSAMPLE = [True, False, False, True, False, True, False, True, True]
_BN = dict(momentum=0.9, epsilon=1e-5, param_dtype=jnp.float32)


def _remat_policy():
    """Residuals kept by a remat region: tagged conv outputs (the MXU work
    that must not be recomputed) and dropout masks (RNG regenerate measured
    8.7 ms per full-res mask); BN/activation intermediates are replayed."""
    return jax.checkpoint_policies.save_only_these_names("vgg_conv", "sd_mask")


def _remat_kwargs() -> dict:
    """Shared nn.remat options; barrier-free by default,
    VGG_REMAT_PREVENT_CSE=1 restores the barriers (module note above)."""
    import os

    kw = {"policy": _remat_policy()}
    if os.environ.get("VGG_REMAT_PREVENT_CSE", "0") != "1":
        kw["prevent_cse"] = False
    return kw


def _encoder_stages() -> list[list[int]]:
    """VGG19_CFG split at the max-pools: [[64,64],[128,128],[256]*4,[512]*4,[512]*4]."""
    stages: list[list[int]] = []
    cur: list[int] = []
    for spec in VGG19_CFG:
        if spec == "M":
            stages.append(cur)
            cur = []
        else:
            cur.append(int(spec))
    if cur:
        stages.append(cur)
    return stages


def _decoder_plan(max_channels: int) -> tuple[list[int], list[bool]]:
    channels = list(_DECODER_CHANNELS)
    upsample = list(_DECODER_UPSAMPLE)
    if max_channels != 512:
        channels = [c for c in channels if c <= max_channels]
        upsample = upsample[-len(channels):]
    channels.insert(0, channels[0])
    return channels, upsample


class DeconvNormActivation(nn.Module):
    """N x (conv -> BN -> LeakyReLU -> optional StochasticDropout).

    Block 0 accepts a ``(skip_highres, x_lowres)`` tuple, meaning
    "nearest-x2 upsample x, concat [skip, x], then conv" — executed as the
    fused :class:`NearestUpConcatConv` (same parameters)."""

    features: int
    kernel: int = 3
    num_blocks: int = 2
    dropout_p: float = 0.05
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        for i in range(self.num_blocks):
            if isinstance(x, tuple):
                assert i == 0 and self.kernel == 3
                skip, low = x
                x = NearestUpConcatConv(
                    self.features, use_bias=self.use_bias, dtype=self.dtype,
                    up_first=False, name=f"conv{i}",
                )(low, skip)
            else:
                x = nn.Conv(
                    self.features, (self.kernel, self.kernel), padding="SAME",
                    use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{i}",
                )(x)
            x = checkpoint_name(x, "vgg_conv")  # inert outside remat regions
            x = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name=f"bn{i}", **_BN
            )(x)
            x = leaky_relu(x)
            if self.dropout_p != 0.0:
                x = StochasticDropout(self.dropout_p, name=f"dropout{i}")(
                    x, deterministic=not train
                )
        return x


class VGGUNetEncoder(nn.Module):
    max_channels: int = 512
    dropout_p: float = 0.05
    dropout_min_channels: int = 256
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, list[jax.Array]]:
        skips: list[jax.Array] = []
        dropout_flag = False
        conv_idx = 0
        for stage_widths in _encoder_stages():
            if stage_widths[0] > self.max_channels:
                break  # truncation rule (reference vgg.py:121-127); stage
                # widths are uniform, so the per-conv break is stage-level

            def stage(mdl: "VGGUNetEncoder", x: jax.Array,
                      widths=tuple(stage_widths), idx0=conv_idx,
                      flag0=dropout_flag) -> jax.Array:
                flag = flag0
                for k, width in enumerate(widths):
                    x = nn.Conv(
                        width, (3, 3), padding="SAME", use_bias=True,
                        dtype=mdl.dtype, param_dtype=jnp.float32,
                        name=f"conv{idx0 + k}",
                    )(x)
                    x = checkpoint_name(x, "vgg_conv")
                    x = nn.BatchNorm(
                        use_running_average=not train, dtype=mdl.dtype,
                        name=f"bn{idx0 + k}", **_BN,
                    )(x)
                    x = nn.relu(x)
                    if width >= mdl.dropout_min_channels:
                        flag = True
                    if flag and mdl.dropout_p != 0.0:
                        x = StochasticDropout(
                            mdl.dropout_p, name=f"dropout{idx0 + k}"
                        )(x, deterministic=not train)
                return x

            # Per-stage remat (see module note): parameter paths are
            # unchanged — the lifted function transform runs in this
            # module's own scope.
            run = nn.remat(stage, **_remat_kwargs()) if self.remat else stage
            x = run(self, x)
            conv_idx += len(stage_widths)
            if any(w >= self.dropout_min_channels for w in stage_widths):
                dropout_flag = True
            skips.append(x)
            x = max_pool_2x2(x)
        return x, list(reversed(skips))


class VGGUNetDecoder(nn.Module):
    num_classes: int = 1
    max_channels: int = 512
    dropout_p: float = 0.05
    dropout_min_channels: int = 256
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, skips: list[jax.Array], train: bool = False
    ) -> tuple[jax.Array, list[jax.Array]]:
        channels, upsample = _decoder_plan(self.max_channels)
        ds_features: list[jax.Array] = []
        skip_idx = 0

        def block(mdl: "VGGUNetDecoder", x, out_ch: int, kernel: int,
                  nb: int, dp: float, use_bias: bool, name: str):
            return DeconvNormActivation(
                out_ch, kernel, num_blocks=nb, dropout_p=dp,
                use_bias=use_bias, dtype=mdl.dtype, name=name,
            )(x, train)

        if self.remat:
            # Per-block remat regions (see module note); out_ch/kernel/nb/
            # dp/use_bias/name are Python-static block parameters.
            block = nn.remat(block, static_argnums=(2, 3, 4, 5, 6, 7),
                             **_remat_kwargs())

        for idx in range(len(channels) - 1):
            out_ch = channels[idx + 1]
            if upsample[idx]:
                ds_features.append(x)
                # (skip, x) tuple = fused nearest-x2 + concat + conv in the
                # block below (NearestUpConcatConv); the upsampled tensor and
                # the concat never materialize.
                x = (skips[skip_idx].astype(x.dtype), x)
                skip_idx += 1
            dp = self.dropout_p if self.dropout_min_channels <= out_ch else 0.0
            nb = 1 if idx == 0 and self.max_channels == 512 else 3
            x = block(self, x, out_ch, 3, nb, dp, False, f"channel_block{idx}")
            if idx != 0:
                x = block(self, x, out_ch, 1, 2, dp, False, f"conv_block{idx}")
        x = block(self, x, self.num_classes, 1, 1, 0.0, True, "final_conv")
        return x, ds_features


class VGGUNet(nn.Module):
    num_classes: int = 1
    max_channels: int = 512
    dropout_p: float = 0.05
    dropout_min_channels: int = 256
    deepsupervision: bool = False
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        y, skips = VGGUNetEncoder(
            self.max_channels, self.dropout_p, self.dropout_min_channels,
            remat=self.remat, dtype=self.dtype, name="encoder",
        )(x, train)
        y, ds = VGGUNetDecoder(
            self.num_classes, self.max_channels, self.dropout_p,
            self.dropout_min_channels, remat=self.remat, dtype=self.dtype,
            name="decoder",
        )(y, skips, train)
        y = y.astype(jnp.float32)
        if self.deepsupervision:
            heads = []
            for i, t in enumerate(ds):
                heads.append(
                    nn.Conv(
                        self.num_classes, (3, 3), padding="SAME", use_bias=True,
                        dtype=jnp.float32, param_dtype=jnp.float32, name=f"ds_head{i}",
                    )(t.astype(jnp.float32))
                )
            return y, list(reversed(heads))
        return y
