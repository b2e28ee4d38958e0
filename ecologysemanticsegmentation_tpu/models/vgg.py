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

from .common import (
    NearestUpConcatConv,
    StochasticDropout,
    leaky_relu,
    max_pool_2x2,
)

Dtype = Any

# NOTE a save-only-conv-outputs rematerialization policy over the encoder and
# decoder (nn.remat + checkpoint_name tags) was tried and REJECTED: the
# backward replay of a whole region holds its recompute temporaries alongside
# the saved set, and HBM use grew from <15.75G to 20.4G (compile-time OOM) at
# the flagship batch 128 @ 256px config (RESULTS.md round 3,
# experiments/vgg_remat_oom.log).  Don't retry without finer granularity.

# vgg19_bn configuration "E": conv widths with 'M' max-pools.
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

_DECODER_CHANNELS = [512, 512, 512, 512, 512, 256, 256, 128, 64]
_DECODER_UPSAMPLE = [True, False, False, True, False, True, False, True, True]
_BN = dict(momentum=0.9, epsilon=1e-5, param_dtype=jnp.float32)


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
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, list[jax.Array]]:
        skips: list[jax.Array] = []
        dropout_flag = False
        conv_idx = 0
        for spec in VGG19_CFG:
            if spec == "M":
                skips.append(x)
                x = max_pool_2x2(x)
                continue
            width = int(spec)
            if width > self.max_channels:
                break  # truncation rule (reference vgg.py:121-127)
            x = nn.Conv(
                width, (3, 3), padding="SAME", use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{conv_idx}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name=f"bn{conv_idx}", **_BN,
            )(x)
            x = nn.relu(x)
            if width >= self.dropout_min_channels:
                dropout_flag = True
            if dropout_flag and self.dropout_p != 0.0:
                x = StochasticDropout(self.dropout_p, name=f"dropout{conv_idx}")(
                    x, deterministic=not train
                )
            conv_idx += 1
        return x, list(reversed(skips))


class VGGUNetDecoder(nn.Module):
    num_classes: int = 1
    max_channels: int = 512
    dropout_p: float = 0.05
    dropout_min_channels: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, skips: list[jax.Array], train: bool = False
    ) -> tuple[jax.Array, list[jax.Array]]:
        channels, upsample = _decoder_plan(self.max_channels)
        ds_features: list[jax.Array] = []
        skip_idx = 0
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
            x = DeconvNormActivation(
                out_ch, 3, num_blocks=nb, dropout_p=dp, dtype=self.dtype,
                name=f"channel_block{idx}",
            )(x, train)
            if idx != 0:
                x = DeconvNormActivation(
                    out_ch, 1, num_blocks=2, dropout_p=dp, dtype=self.dtype,
                    name=f"conv_block{idx}",
                )(x, train)
        x = DeconvNormActivation(
            self.num_classes, 1, num_blocks=1, dropout_p=0.0, use_bias=True,
            dtype=self.dtype, name="final_conv",
        )(x, train)
        return x, ds_features


class VGGUNet(nn.Module):
    num_classes: int = 1
    max_channels: int = 512
    dropout_p: float = 0.05
    dropout_min_channels: int = 256
    deepsupervision: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        y, skips = VGGUNetEncoder(
            self.max_channels, self.dropout_p, self.dropout_min_channels,
            dtype=self.dtype, name="encoder",
        )(x, train)
        y, ds = VGGUNetDecoder(
            self.num_classes, self.max_channels, self.dropout_p,
            self.dropout_min_channels, dtype=self.dtype, name="decoder",
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
