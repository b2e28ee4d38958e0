"""MBDeconv: inverted-residual *upsampling* block (EfficientNet-style MBConv
mirrored into a decoder block).

The reference explores this idea in dead experimental code
(``model/MBDeconv.py:38-167`` + ``MBDeconvConfig.py`` — script-style, known
bugs: missing ``super().__init__``, ``self.conv_conv_config`` typo, ``exit()``
mid-module; SURVEY.md §2.2 marks it not wired).  This is the working
capability equivalent: expand 1x1 → depthwise 3x3 (with nearest x2 upsample
when ``stride == 2``) → project 1x1, with StochasticDropout on the residual
path — usable as a drop-in decoder stage for an EfficientNetV2-style U-Net.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct, StochasticDropout

Dtype = Any


class MBDeconv(nn.Module):
    features: int
    expand_ratio: int = 4
    stride: int = 1  # 2 = x2 nearest upsample before the depthwise conv
    stochastic_dropout_p: float = 0.05
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        identity = x
        mid = in_ch * self.expand_ratio

        y = ConvBNAct(mid, (1, 1), act=nn.silu, dtype=self.dtype, name="expand")(x, train)
        if self.stride == 2:
            # nearest_x2 + depthwise3x3 as one grouped lhs-dilated conv; the
            # x4-size mid tensor between them never materializes.
            y = (y, None)
        y = ConvBNAct(
            mid, (3, 3), groups=mid, act=nn.silu, dtype=self.dtype, name="depthwise"
        )(y, train)
        y = ConvBNAct(self.features, (1, 1), act=None, dtype=self.dtype, name="project")(
            y, train
        )

        if self.stride == 1 and self.features == in_ch:
            y = StochasticDropout(self.stochastic_dropout_p, name="sd")(
                y, deterministic=not train
            )
            y = y + identity
        return y


class EfficientNetDeconvDecoder(nn.Module):
    """A small MBDeconv-stack decoder: the working form of the reference's
    ``EfficientNetDeconv`` exploration (``model/efficientnet_v2_s.py:8-52``,
    incomplete there)."""

    num_classes: int = 1
    stage_features: tuple[int, ...] = (256, 128, 64, 32)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i, f in enumerate(self.stage_features):
            x = MBDeconv(f, stride=2, dtype=self.dtype, name=f"up{i}")(x, train)
            x = MBDeconv(f, stride=1, dtype=self.dtype, name=f"mix{i}")(x, train)
        return nn.Conv(
            self.num_classes, (3, 3), padding="SAME",
            dtype=jnp.float32, param_dtype=jnp.float32, name="head",
        )(x.astype(jnp.float32))
