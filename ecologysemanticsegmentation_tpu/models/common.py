"""Shared model building blocks (flax.linen, NHWC, bf16-compute/f32-params)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

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
        noise = jax.random.bernoulli(rng, keep, x.shape).astype(x.dtype) / keep
        return x * noise


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
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
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


class SeparableConvBNAct(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 separable conv with BN/act — the ASPP and
    DeepLabV3+ decoder conv type (smp ``SeparableConv2d`` equivalent)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    dilation: tuple[int, int] = (1, 1)
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        pad = [((k - 1) * d // 2,) * 2 for k, d in zip(self.kernel_size, self.dilation)]
        x = nn.Conv(
            in_ch,
            self.kernel_size,
            kernel_dilation=self.dilation,
            feature_group_count=in_ch,
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise",
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


def leaky_relu(x: jax.Array) -> jax.Array:
    """torch nn.LeakyReLU default (negative_slope=0.01)."""
    return nn.leaky_relu(x, negative_slope=0.01)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(kernel_size=3, stride=2, padding=1)`` equivalent."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(2, 2)`` equivalent (VGG)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))
