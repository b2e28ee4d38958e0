"""Torch->flax weight importer tests using synthetic torch-layout state dicts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.models import VGGUNetEncoder, resnet34
from ecologysemanticsegmentation_tpu.models.deeplabv3plus import (
    DeepLabV3Plus,
    DeepLabV3PlusDepthwise,
)
from ecologysemanticsegmentation_tpu.models.import_torch import (
    resnet_encoder_from_torch,
    smp_checkpoint_to_variables,
    smp_deeplabv3plus_from_torch,
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


def _fake_smp_deeplabv3plus_state_dict(rng, classes=3, prefix=""):
    """Synthetic smp-0.3.3 DeepLabV3Plus(resnet34) state dict — the key layout
    of the reference's trained checkpoints (``train_multiclass.py:347-353``)."""
    sd = {f"{prefix}encoder.{k}": v
          for k, v in _fake_resnet34_state_dict(rng).items()
          if not k.startswith("fc.")}

    def conv(name, o, i, k):
        sd[f"{prefix}{name}.weight"] = (
            0.02 * rng.normal(size=(o, i, k, k))
        ).astype(np.float32)

    def bn(name, c):
        sd[f"{prefix}{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{prefix}{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{prefix}{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{prefix}{name}.running_var"] = (
            np.abs(rng.normal(size=c)).astype(np.float32) + 0.5
        )

    def sep(name, i, o, bn_name):
        sd[f"{prefix}{name}.0.weight"] = (
            0.02 * rng.normal(size=(i, 1, 3, 3))
        ).astype(np.float32)
        sd[f"{prefix}{name}.1.weight"] = (
            0.02 * rng.normal(size=(o, i, 1, 1))
        ).astype(np.float32)
        bn(bn_name, o)

    conv("decoder.aspp.0.convs.0.0", 256, 512, 1)
    bn("decoder.aspp.0.convs.0.1", 256)
    for i in (1, 2, 3):
        sep(f"decoder.aspp.0.convs.{i}.0", 512, 256, f"decoder.aspp.0.convs.{i}.1")
    conv("decoder.aspp.0.convs.4.1", 256, 512, 1)
    bn("decoder.aspp.0.convs.4.2", 256)
    conv("decoder.aspp.0.project.0", 256, 256 * 5, 1)
    bn("decoder.aspp.0.project.1", 256)
    sep("decoder.aspp.1", 256, 256, "decoder.aspp.2")
    conv("decoder.block1.0", 48, 64, 1)
    bn("decoder.block1.1", 48)
    sep("decoder.block2.0", 256 + 48, 256, "decoder.block2.1")  # smp cat([aspp, low])
    conv("segmentation_head.0", classes, 256, 1)  # smp DeepLabV3Plus head k=1
    sd[f"{prefix}segmentation_head.0.bias"] = rng.normal(size=classes).astype(np.float32)
    return sd


def test_smp_deeplabv3plus_import_matches_flax_tree(rng):
    sd = _fake_smp_deeplabv3plus_state_dict(rng, classes=3)
    params, stats = smp_deeplabv3plus_from_torch(sd)

    model = DeepLabV3Plus(num_classes=3)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def keys(t):
        return {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert keys(variables["params"]) == keys(params), (
        set(keys(variables["params"])) ^ set(keys(params)))
    assert keys(variables["batch_stats"]) == keys(stats)

    # value routing spot-checks: each flax leaf equals the transform of the
    # RIGHT smp key (atrous rate order, sequential indices, head)
    np.testing.assert_array_equal(
        np.asarray(params["aspp"]["atrous1"]["depthwise"]["kernel"]),
        sd["decoder.aspp.0.convs.2.0.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["fuse"]["pointwise"]["kernel"]),
        sd["decoder.block2.0.1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["aspp"]["pool_conv"]["conv"]["kernel"]),
        sd["decoder.aspp.0.convs.4.1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["head"]["kernel"]),
        sd["segmentation_head.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(stats["aspp_out"]["bn"]["mean"]),
        sd["decoder.aspp.2.running_mean"])

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 64, 64, 3)) * 0.5, train=False)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_smp_depthwise_checkpoint_to_variables(rng):
    sd = _fake_smp_deeplabv3plus_state_dict(rng, classes=15, prefix="smp_deeplab_model.")
    sd["last_layers.weight"] = (0.02 * rng.normal(size=(3, 15, 3, 3))).astype(np.float32)
    sd["last_layers.bias"] = rng.normal(size=3).astype(np.float32)

    variables = smp_checkpoint_to_variables(sd)
    model = DeepLabV3PlusDepthwise(num_classes=3)
    expect = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 64, 64, 3)), train=False)

    def keys(t):
        return {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert keys(expect["params"]) == keys(variables["params"]), (
        set(keys(expect["params"])) ^ set(keys(variables["params"])))
    assert keys(expect["batch_stats"]) == keys(variables["batch_stats"])

    out = model.apply(variables, jnp.ones((1, 64, 64, 3)) * 0.5, train=False)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_load_checkpoint_file_accepts_reference_pt(rng, tmp_path):
    """A reference-format torch .pt checkpoint loads straight into the eval
    sweep via load_checkpoint_file (smp layout -> flax trees)."""
    import torch

    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        load_checkpoint_file,
        make_optimizer,
    )

    sd = {k: torch.from_numpy(v) for k, v in
          _fake_smp_deeplabv3plus_state_dict(rng, classes=3).items()}
    path = str(tmp_path / "synthetic_epoch40.pt")
    torch.save(sd, path)

    model = DeepLabV3Plus(num_classes=3)
    template = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3),
                                  make_optimizer())
    state = load_checkpoint_file(path, template)
    assert state is not None
    np.testing.assert_allclose(
        np.asarray(state.params["head"]["bias"]),
        np.asarray(sd["segmentation_head.0.bias"]), rtol=1e-6)

    # wrong-architecture checkpoint -> None (skip contract)
    template1 = create_train_state(DeepLabV3Plus(num_classes=1),
                                   jax.random.PRNGKey(0), (1, 64, 64, 3),
                                   make_optimizer())
    assert load_checkpoint_file(path, template1) is None


def test_strip_smp_prefix():
    sd = {
        "smp_deeplab_model.encoder.conv1.weight": 1,
        "smp_deeplab_model.segmentation_head.0.weight": 2,
        "last_layers.weight": 3,
    }
    out = strip_smp_deeplab_prefix(sd)
    assert out == {"encoder.conv1.weight": 1, "last_layers.weight": 3}
