"""ResNet-encoder U-Net (the reference's commented-out ``smp.Unet`` config,
``train_multiclass.py:338-344`` / README claims of resnet50-Unet experiments).

Decoder: five stages of (x2 nearest upsample -> skip concat -> 2x ConvBNReLU)
with channels (256, 128, 64, 32, 16), then a 3x3 head — the smp Unet layout.
NHWC / bf16; upsampling is nearest (cheap repeat) followed by convs, keeping
everything MXU-shaped.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


from .common import ConvBNAct
from .resnet import ResNetEncoder

Dtype = Any


class UNet(nn.Module):
    num_classes: int = 1
    encoder_name: str = "resnet34"
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block = {"resnet34": "basic", "resnet50": "bottleneck"}[self.encoder_name]
        feats = ResNetEncoder(
            (3, 4, 6, 3), block, output_stride=32, dtype=self.dtype, name="encoder"
        )(x, train=train)
        # feats: [/2, /4, /8, /16, /32]; skips consumed deepest-first.
        y = feats[-1]
        skips = [feats[3], feats[2], feats[1], feats[0], None]

        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            # Fused nearest-x2 + concat([up, skip]) + conv (ConvBNAct tuple
            # form -> NearestUpConcatConv): neither the upsampled tensor nor
            # the concat materializes; parameters are unchanged.
            skip = skip.astype(y.dtype) if skip is not None else None
            y = ConvBNAct(ch, dtype=self.dtype, name=f"decoder{i}_conv1")(
                (y, skip), train)
            y = ConvBNAct(ch, dtype=self.dtype, name=f"decoder{i}_conv2")(y, train)

        y = nn.Conv(
            self.num_classes, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="head",
        )(y)
        return y.astype(jnp.float32)
