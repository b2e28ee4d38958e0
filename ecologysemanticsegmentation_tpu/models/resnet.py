"""ResNet-34/50 encoders (flax.linen, NHWC).

Capability equivalent of the torchvision ResNet encoders the reference pulls
in through ``segmentation_models_pytorch`` (reference ``train_multiclass.py:
347-353`` builds ``smp.DeepLabV3Plus(encoder_name="resnet34")``).  Layer
naming (``conv1``/``bn1``/``layer1..4``/``blockN``/``downsample``) mirrors the
torch state-dict structure so :mod:`.import_torch` can map pretrained weights
1:1.

``output_stride=16`` follows smp's ``make_dilated`` semantics: every strided
conv in the final stage becomes stride 1 and every 3x3 conv in that stage gets
dilation 2 — required for the DeepLabV3+ ASPP input.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import max_pool_3x3_s2

Dtype = Any

_BN = dict(momentum=0.9, epsilon=1e-5, param_dtype=jnp.float32)


class BasicBlock(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), kernel_dilation=(d, d),
            padding=[((k - 1) * d // 2,) * 2] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name, **_BN
        )
        identity = x
        y = conv(self.features, 3, self.strides[0], self.dilation[0], "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.features, 3, 1, self.dilation[0], "conv2")(y)
        y = bn("bn2")(y)
        if identity.shape != y.shape:
            identity = conv(self.features, 1, self.strides[0], 1, "downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, k, s, d, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), kernel_dilation=(d, d),
            padding=[((k - 1) * d // 2,) * 2] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name, **_BN
        )
        identity = x
        y = nn.relu(bn("bn1")(conv(self.features, 1, 1, 1, "conv1")(x)))
        y = nn.relu(
            bn("bn2")(conv(self.features, 3, self.strides[0], self.dilation[0], "conv2")(y))
        )
        y = bn("bn3")(conv(self.features * 4, 1, 1, 1, "conv3")(y))
        if identity.shape != y.shape:
            identity = conv(self.features * 4, 1, self.strides[0], 1, "downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """Returns the 5-level feature pyramid ``[/2, /4, /8, /16, /32|/16d]``."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "basic"  # "basic" (resnet34) | "bottleneck" (resnet50)
    output_stride: int = 32  # 32 (U-Net) | 16 (DeepLabV3+)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        assert self.output_stride in (16, 32)
        block_cls = BasicBlock if self.block == "basic" else Bottleneck

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1", **_BN)(x)
        x = nn.relu(x)
        feat2 = x  # /2
        x = max_pool_3x3_s2(x)

        features = [feat2]
        widths = (64, 128, 256, 512)
        for stage, (num_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            dilate_stage = stage == 3 and self.output_stride == 16
            for b in range(num_blocks):
                stride = 2 if (b == 0 and stage > 0 and not dilate_stage) else 1
                dilation = 2 if dilate_stage else 1
                x = block_cls(
                    features=width,
                    strides=(stride, stride),
                    dilation=(dilation, dilation),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train=train)
            features.append(x)
        return features  # [/2, /4, /8, /16, /32 or /16-dilated]


def resnet34(output_stride: int = 32, dtype: Dtype = jnp.bfloat16) -> ResNetEncoder:
    return ResNetEncoder((3, 4, 6, 3), "basic", output_stride, dtype)


def resnet50(output_stride: int = 32, dtype: Dtype = jnp.bfloat16) -> ResNetEncoder:
    return ResNetEncoder((3, 4, 6, 3), "bottleneck", output_stride, dtype)


ENCODER_FEATURES = {
    "resnet34": (64, 64, 128, 256, 512),
    "resnet50": (64, 256, 512, 1024, 2048),
}
