"""DeepLabV3+ — the framework's flagship/primary trained model.

Capability equivalent of ``smp.DeepLabV3Plus(encoder_name="resnet34",
classes=len(ORGANS))``, the model the reference actually trains
(reference ``train_multiclass.py:347-353``,
``train_multiclass_sequential_densenetloss.py:434-451``):

* encoder at output_stride 16 (final ResNet stage dilated),
* ASPP with a 1x1 branch, three separable atrous branches (rates 12/24/36),
  and a global-pooling branch, fused to 256 channels,
* decoder: bilinear x4 upsample of ASPP output, concat with 48-channel
  projection of the /4 features (smp order: [aspp, low]), separable 3x3 fuse,
* head: 1x1 conv to ``classes`` (smp's SegmentationHead kernel_size=1) +
  bilinear x4 upsample to input resolution.

TPU notes: NHWC, bf16 compute; the ASPP global-pool branch broadcasts instead
of resizing a 1x1 map (same math, no gather); all upsampling is the einsum
bilinear of :mod:`..ops.resize` so it rides the MXU.

Also provides :class:`DeepLabV3PlusDepthwise` — the reference's
``--depthwiseconv`` variant (``model/deeplabv3plus_depthwise.py:5-28``):
the backbone predicts ``classes * 5`` channels and a trailing 3x3 conv
(Kaiming-normal init) projects back to ``classes``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .common import ConvBNAct, SeparableConvBNAct
from .resnet import ResNetEncoder

Dtype = Any


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (separable-conv variant)."""

    features: int = 256
    atrous_rates: tuple[int, int, int] = (12, 24, 36)
    drop_rate: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        branches = [
            ConvBNAct(self.features, (1, 1), dtype=self.dtype, name="conv1x1")(x, train)
        ]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                SeparableConvBNAct(
                    self.features, dilation=(rate, rate), dtype=self.dtype,
                    name=f"atrous{i}",
                )(x, train)
            )
        # Image-pooling branch: global average -> 1x1 conv/BN/ReLU -> broadcast
        # back (equivalent to the reference's interpolate of a 1x1 map, but a
        # pure broadcast on TPU).
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBNAct(self.features, (1, 1), dtype=self.dtype, name="pool_conv")(
            pooled, train
        )
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))

        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNAct(self.features, (1, 1), dtype=self.dtype, name="project")(y, train)
        y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return y


class DeepLabV3Plus(nn.Module):
    num_classes: int = 1
    encoder_name: str = "resnet34"
    decoder_features: int = 256
    atrous_rates: tuple[int, int, int] = (12, 24, 36)
    aspp_dropout: float = 0.5  # smp hardcodes 0.5; 0 gives a deterministic step
    # When False, skip the final x4 bilinear upsample and return 1/4-resolution
    # logits — the training path folds the upsample + sigmoid into the fused
    # loss kernel (ops/pallas/head_loss.py) so the full-res logit tensor never
    # hits HBM.  Parameters are identical either way (the resize is
    # parameter-free): checkpoints are interchangeable.
    upsample_head: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block = {"resnet34": "basic", "resnet50": "bottleneck"}[self.encoder_name]
        feats = ResNetEncoder(
            (3, 4, 6, 3), block, output_stride=16, dtype=self.dtype, name="encoder"
        )(x, train=train)
        low = feats[1]   # /4 features
        high = feats[4]  # /16 (dilated) features

        y = ASPP(
            self.decoder_features, self.atrous_rates, drop_rate=self.aspp_dropout,
            dtype=self.dtype, name="aspp",
        )(high, train)
        y = SeparableConvBNAct(self.decoder_features, dtype=self.dtype, name="aspp_out")(
            y, train
        )
        y = resize_bilinear(y, low.shape[1:3], align_corners=True)

        low = ConvBNAct(48, (1, 1), dtype=self.dtype, name="low_project")(low, train)
        # Virtual concat: same math/params as concatenating [y(256), low(48)]
        # — smp's channel order, ``torch.cat([aspp_features,
        # high_res_features], 1)`` (decoders/deeplabv3/decoder.py), so real
        # smp state dicts map verbatim — but the lane-unaligned 304-channel
        # tensor never materializes (the measured dominant decoder cost; see
        # SeparableConvBNAct docstring).
        y = SeparableConvBNAct(self.decoder_features, dtype=self.dtype, name="fuse")(
            (y, low), train
        )

        # smp 0.3.3's DeepLabV3Plus SegmentationHead is a 1x1 conv
        # (decoders/deeplabv3/model.py passes kernel_size=1) — the trained
        # reference checkpoint's head has shape (classes, 256, 1, 1).
        y = nn.Conv(
            self.num_classes, (1, 1),
            dtype=self.dtype, param_dtype=jnp.float32, name="head",
        )(y)
        if not self.upsample_head:
            return y.astype(jnp.float32)  # 1/4-res logits for the fused loss
        y = resize_bilinear(y, x.shape[1:3], align_corners=True)
        return y.astype(jnp.float32)  # logits in f32 for stable loss/sigmoid


class DeepLabV3PlusDepthwise(nn.Module):
    """``--depthwiseconv`` variant (reference ``model/deeplabv3plus_depthwise.py``)."""

    num_classes: int = 1
    encoder_name: str = "resnet34"
    depthwise_multiplier: int = 5
    aspp_dropout: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = DeepLabV3Plus(
            num_classes=self.num_classes * self.depthwise_multiplier,
            encoder_name=self.encoder_name,
            aspp_dropout=self.aspp_dropout,
            dtype=self.dtype,
            name="smp_deeplab_model",
        )(x, train=train)
        y = nn.Conv(
            self.num_classes, (3, 3), padding="SAME",
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=jnp.float32, param_dtype=jnp.float32, name="last_layers",
        )(y)
        return y
