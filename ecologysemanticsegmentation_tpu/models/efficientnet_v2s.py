"""EfficientNetV2-S encoder (flax, NHWC) + U-Net assembly.

The reference explores EfficientNetV2-S in an incomplete script
(``model/efficientnet_v2_s.py:8-52`` — loads torchvision weights, prints
shapes, leaves skeleton ``UNet``/``EfficientNetDeconv`` classes unfinished;
``fish_metadata.json:75-80`` lists the backbone as ``"in_progress"``).  This
is the finished capability: the standard V2-S stage plan (FusedMBConv stages
1-3, SE-MBConv stages 4-6) exposing the 5-level feature pyramid, plus
:class:`EfficientNetV2SUNet` wiring it to the MBDeconv decoder from
:mod:`.mbdeconv`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct, StochasticDropout

Dtype = Any

# (block, expand, kernel, stride, features, num_blocks, use_se)
V2S_STAGES = [
    ("fused", 1, 3, 1, 24, 2, False),
    ("fused", 4, 3, 2, 48, 4, False),
    ("fused", 4, 3, 2, 64, 4, False),
    ("mbconv", 4, 3, 2, 128, 6, True),
    ("mbconv", 6, 3, 1, 160, 9, True),
    ("mbconv", 6, 3, 2, 256, 15, True),
]


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="expand")(s)
        return x * nn.sigmoid(s)


class FusedMBConv(nn.Module):
    features: int
    expand_ratio: int
    stride: int = 1
    drop_p: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        identity = x
        mid = in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            y = ConvBNAct(mid, (3, 3), strides=(self.stride,) * 2, act=nn.silu,
                          dtype=self.dtype, name="fused")(x, train)
            y = ConvBNAct(self.features, (1, 1), act=None, dtype=self.dtype,
                          name="project")(y, train)
        else:
            y = ConvBNAct(self.features, (3, 3), strides=(self.stride,) * 2,
                          act=nn.silu, dtype=self.dtype, name="fused")(x, train)
        if self.stride == 1 and self.features == in_ch:
            y = StochasticDropout(self.drop_p, name="sd")(y, deterministic=not train)
            y = y + identity
        return y


class MBConv(nn.Module):
    features: int
    expand_ratio: int
    stride: int = 1
    use_se: bool = True
    drop_p: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        identity = x
        mid = in_ch * self.expand_ratio
        y = ConvBNAct(mid, (1, 1), act=nn.silu, dtype=self.dtype, name="expand")(x, train)
        y = ConvBNAct(mid, (3, 3), strides=(self.stride,) * 2, groups=mid,
                      act=nn.silu, dtype=self.dtype, name="depthwise")(y, train)
        if self.use_se:
            y = SqueezeExcite(max(in_ch // 4, 1), dtype=self.dtype, name="se")(y)
        y = ConvBNAct(self.features, (1, 1), act=None, dtype=self.dtype,
                      name="project")(y, train)
        if self.stride == 1 and self.features == in_ch:
            y = StochasticDropout(self.drop_p, name="sd")(y, deterministic=not train)
            y = y + identity
        return y


class EfficientNetV2SEncoder(nn.Module):
    """Feature pyramid at strides [/2, /4, /8, /16, /32].

    ``depth_multiplier`` scales block counts (1.0 = the full V2-S plan; tests
    use smaller for speed).
    """

    depth_multiplier: float = 1.0
    stochastic_depth_p: float = 0.05
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        x = ConvBNAct(24, (3, 3), strides=(2, 2), act=nn.silu, dtype=self.dtype,
                      name="stem")(x, train)
        features = []
        for si, (kind, expand, k, stride, feat, blocks, use_se) in enumerate(V2S_STAGES):
            blocks = max(1, int(round(blocks * self.depth_multiplier)))
            for b in range(blocks):
                s = stride if b == 0 else 1
                if s == 2:
                    features.append(x)  # pre-downsample tensor = skip level
                cls = FusedMBConv if kind == "fused" else MBConv
                kwargs = dict(
                    features=feat, expand_ratio=expand, stride=s,
                    drop_p=self.stochastic_depth_p, dtype=self.dtype,
                    name=f"stage{si}_block{b}",
                )
                if kind == "mbconv":
                    kwargs["use_se"] = use_se
                x = cls(**kwargs)(x, train)
        features.append(x)  # /32
        return features  # [/2, /4, /8, /16, /32]


class EfficientNetV2SUNet(nn.Module):
    """EfficientNetV2-S U-Net: the model the reference's exploration was
    aiming for, assembled with MBDeconv decoder stages + skip concats."""

    num_classes: int = 1
    depth_multiplier: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from .common import NearestUpConcatConv
        from .mbdeconv import MBDeconv
        from ..ops.resize import upsample_nearest

        feats = EfficientNetV2SEncoder(
            self.depth_multiplier, dtype=self.dtype, name="encoder"
        )(x, train)
        y = feats[-1]
        skips = feats[-2::-1]  # deepest-first
        widths = (160, 96, 64, 32, 24)
        for i, (skip, wdt) in enumerate(zip(skips, widths)):
            # Materialized up+concat on purpose: contracting the low-res
            # operand before upsampling (a fused 1x1 variant) measured 1.4x
            # SLOWER at the 8px stage and 1.9x slower at 128px — the
            # nearest-repeat over the 4x-wider expand output moves more HBM
            # bytes than the concat it saves (RESULTS.md round 3).
            y = upsample_nearest(y, 2)
            y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
            y = MBDeconv(wdt, stride=1, dtype=self.dtype, name=f"dec{i}")(y, train)
        # /2 -> /1 head: nearest-x2 + conv3x3 as one lhs-dilated conv (same
        # "head" kernel/bias parameters as the nn.Conv it replaces).
        y = NearestUpConcatConv(
            self.num_classes, use_bias=True, dtype=jnp.float32, name="head"
        )(y.astype(jnp.float32))
        return y
