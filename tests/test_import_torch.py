"""Torch->flax weight importer tests using synthetic torch-layout state dicts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.models import VGGUNetEncoder, resnet34
from ecologysemanticsegmentation_tpu.models.import_torch import (
    resnet_encoder_from_torch,
    strip_smp_deeplab_prefix,
    vgg19_bn_encoder_from_torch,
)


def _fake_resnet34_state_dict(rng):
    """Synthetic torchvision-layout resnet34 state dict (numpy values)."""
    sd = {}

    def conv(name, o, i, k):
        # small scale: unit-variance fakes explode to inf/nan through 34
        # bf16 conv layers; this test checks mapping, not calibration
        sd[f"{name}.weight"] = (0.02 * rng.normal(size=(o, i, k, k))).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.normal(size=c)).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    sizes = [(1, 3, 64), (2, 4, 128), (3, 6, 256), (4, 3, 512)]
    in_ch = 64
    for layer, blocks, width in sizes:
        for b in range(blocks):
            base = f"layer{layer}.{b}"
            conv(f"{base}.conv1", width, in_ch if b == 0 else width, 3)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2", width, width, 3)
            bn(f"{base}.bn2", width)
            if b == 0 and in_ch != width:
                conv(f"{base}.downsample.0", width, in_ch, 1)
                bn(f"{base}.downsample.1", width)
        in_ch = width
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=1000).astype(np.float32)
    return sd


def test_resnet34_import_matches_flax_tree(rng):
    sd = _fake_resnet34_state_dict(rng)
    params, stats = resnet_encoder_from_torch(sd)

    enc = resnet34(output_stride=16)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)

    def tree_shapes(t):
        return {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    expect_p = tree_shapes(variables["params"])
    got_p = tree_shapes(params)
    assert expect_p == got_p, set(expect_p) ^ set(got_p)

    expect_s = tree_shapes(variables["batch_stats"])
    got_s = tree_shapes(stats)
    assert expect_s == got_s

    # converted weights actually run
    out = enc.apply({"params": params, "batch_stats": stats},
                    jnp.ones((1, 64, 64, 3)) * 0.5, train=False)
    assert np.isfinite(np.asarray(out[-1])).all()

    # OIHW -> HWIO layout check on a known kernel
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0),
    )


def _fake_vgg19bn_features(rng, max_channels):
    from ecologysemanticsegmentation_tpu.models.vgg import VGG19_CFG

    sd = {}
    torch_idx = 0
    in_ch = 3
    for spec in VGG19_CFG:
        if spec == "M":
            torch_idx += 1
            continue
        width = int(spec)
        sd[f"features.{torch_idx}.weight"] = rng.normal(size=(width, in_ch, 3, 3)).astype(np.float32)
        sd[f"features.{torch_idx}.bias"] = rng.normal(size=width).astype(np.float32)
        for suffix, shape in [("weight", width), ("bias", width),
                              ("running_mean", width), ("running_var", width)]:
            val = np.abs(rng.normal(size=shape)).astype(np.float32) + 0.5
            sd[f"features.{torch_idx + 1}.{suffix}"] = val
        torch_idx += 3
        in_ch = width
    return sd


@pytest.mark.parametrize("max_channels", [256, 512])
def test_vgg19bn_import_matches_flax_tree(rng, max_channels):
    sd = _fake_vgg19bn_features(rng, max_channels)
    params, stats = vgg19_bn_encoder_from_torch(sd, max_channels=max_channels)

    enc = VGGUNetEncoder(max_channels=max_channels, dropout_p=0.0)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)

    def keys(t):
        return {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert keys(variables["params"]) == keys(params)
    assert keys(variables["batch_stats"]) == keys(stats)

    y, skips = enc.apply({"params": params, "batch_stats": stats},
                         jnp.ones((1, 64, 64, 3)) * 0.1, train=False)
    assert np.isfinite(np.asarray(y)).all()


def test_strip_smp_prefix():
    sd = {
        "smp_deeplab_model.encoder.conv1.weight": 1,
        "smp_deeplab_model.segmentation_head.0.weight": 2,
        "last_layers.weight": 3,
    }
    out = strip_smp_deeplab_prefix(sd)
    assert out == {"encoder.conv1.weight": 1, "last_layers.weight": 3}
