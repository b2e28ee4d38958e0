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


# ---------------------------------------------------------------------------
# Round-3 hardening (VERDICT r2 Next #7): the synthetic dicts above are built
# from the same understanding of smp's tree as the mapper, so a transcription
# error in import_torch.py's key map could pass its own test.  The checks
# below validate against sources INDEPENDENT of import_torch.py:
#   * literal transcriptions, written as data, of (a) torchvision's
#     resnet34/resnet50 state-dict layouts (torchvision is not installed in
#     this environment — torch only — so the layout table stands in for the
#     live model) and (b) smp 0.3.3's DeepLabV3Plus decoder key list
#     (decoders/deeplabv3/decoder.py: ASPP(separable=True) + SeparableConv2d
#     Sequentials + block1/block2 + segmentation_head),
#   * a key-consumption audit (every mappable checkpoint entry is read).
# ---------------------------------------------------------------------------


def _bn_keys(name, c, with_tracked=True):
    ks = [(f"{name}.weight", (c,)), (f"{name}.bias", (c,)),
          (f"{name}.running_mean", (c,)), (f"{name}.running_var", (c,))]
    if with_tracked:
        ks.append((f"{name}.num_batches_tracked", ()))
    return ks


def smp_decoder_key_table(enc_out: int, low_ch: int, classes: int):
    """Literal smp-0.3.3 DeepLabV3Plus decoder state-dict layout.

    Transcribed from segmentation_models_pytorch 0.3.3
    decoders/deeplabv3/decoder.py:
      DeepLabV3PlusDecoder.aspp = Sequential(ASPP(enc_out, 256, rates,
        separable=True), SeparableConv2d(256, 256, 3, bias=False), BN, ReLU)
      ASPP.convs = [Sequential(Conv2d(enc_out,256,1,bias=False), BN, ReLU),
        3 x ASPPSeparableConv(= Sequential(SeparableConv2d, BN, ReLU)),
        ASPPPooling(= Sequential(AdaptiveAvgPool2d, Conv2d(1x1,bias=False),
        BN, ReLU))]; ASPP.project = Sequential(Conv2d(5*256,256,1,
        bias=False), BN, ReLU, Dropout)
      SeparableConv2d = Sequential(depthwise Conv2d(groups=in, bias=False),
        pointwise Conv2d(1x1, bias=False))
      block1 = Sequential(Conv2d(low_ch,48,1,bias=False), BN, ReLU)
      block2 = Sequential(SeparableConv2d(304,256,3,bias=False), BN, ReLU)
      SegmentationHead.0 = Conv2d(256, classes, 1) (bias=True)
    """
    t = []
    t += [("decoder.aspp.0.convs.0.0.weight", (256, enc_out, 1, 1))]
    t += _bn_keys("decoder.aspp.0.convs.0.1", 256)
    for i in (1, 2, 3):
        t += [(f"decoder.aspp.0.convs.{i}.0.0.weight", (enc_out, 1, 3, 3)),
              (f"decoder.aspp.0.convs.{i}.0.1.weight", (256, enc_out, 1, 1))]
        t += _bn_keys(f"decoder.aspp.0.convs.{i}.1", 256)
    t += [("decoder.aspp.0.convs.4.1.weight", (256, enc_out, 1, 1))]
    t += _bn_keys("decoder.aspp.0.convs.4.2", 256)
    t += [("decoder.aspp.0.project.0.weight", (256, 256 * 5, 1, 1))]
    t += _bn_keys("decoder.aspp.0.project.1", 256)
    t += [("decoder.aspp.1.0.weight", (256, 1, 3, 3)),
          ("decoder.aspp.1.1.weight", (256, 256, 1, 1))]
    t += _bn_keys("decoder.aspp.2", 256)
    t += [("decoder.block1.0.weight", (48, low_ch, 1, 1))]
    t += _bn_keys("decoder.block1.1", 48)
    t += [("decoder.block2.0.0.weight", (256 + 48, 1, 3, 3)),
          ("decoder.block2.0.1.weight", (256, 256 + 48, 1, 1))]
    t += _bn_keys("decoder.block2.1", 256)
    t += [("segmentation_head.0.weight", (classes, 256, 1, 1)),
          ("segmentation_head.0.bias", (classes,))]
    return t


class _RecordingDict(dict):
    def __init__(self, data):
        super().__init__(data)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def torchvision_resnet_key_table(arch):
    """Literal torchvision resnet34/resnet50 state-dict layout, in module
    registration order.  Transcribed from torchvision.models.resnet source:
    BasicBlock = conv1(3x3)/bn1/conv2(3x3)/bn2 [+ downsample on the first
    block of layers 2-4]; Bottleneck = conv1(1x1,w)/bn1/conv2(3x3,w)/bn2/
    conv3(1x1,4w)/bn3 [+ downsample on the first block of EVERY layer —
    including layer1, whose 64->256 expansion needs the 1x1 projection]."""
    block, blocks = {"resnet34": ("basic", (3, 4, 6, 3)),
                     "resnet50": ("bottleneck", (3, 4, 6, 3))}[arch]
    exp = 1 if block == "basic" else 4
    t = [("conv1.weight", (64, 3, 7, 7))] + _bn_keys("bn1", 64)
    widths = (64, 128, 256, 512)
    in_ch = 64
    for li, (n, w) in enumerate(zip(blocks, widths), start=1):
        for b in range(n):
            base = f"layer{li}.{b}"
            cin = in_ch if b == 0 else w * exp
            if block == "basic":
                t += [(f"{base}.conv1.weight", (w, cin, 3, 3))] + _bn_keys(f"{base}.bn1", w)
                t += [(f"{base}.conv2.weight", (w, w, 3, 3))] + _bn_keys(f"{base}.bn2", w)
            else:
                t += [(f"{base}.conv1.weight", (w, cin, 1, 1))] + _bn_keys(f"{base}.bn1", w)
                t += [(f"{base}.conv2.weight", (w, w, 3, 3))] + _bn_keys(f"{base}.bn2", w)
                t += [(f"{base}.conv3.weight", (w * exp, w, 1, 1))] + _bn_keys(f"{base}.bn3", w * exp)
            if b == 0 and (li > 1 or exp > 1):
                t += [(f"{base}.downsample.0.weight", (w * exp, cin, 1, 1))]
                t += _bn_keys(f"{base}.downsample.1", w * exp)
        in_ch = w * exp
    return t


def _sd_from_key_table(table, rng):
    sd = {}
    for key, shape in table:
        if key.endswith("num_batches_tracked"):
            sd[key] = np.zeros((), np.int64)
        elif "running_var" in key:
            sd[key] = (np.abs(rng.normal(size=shape)) + 0.5).astype(np.float32)
        elif key.endswith(".weight") and len(shape) == 4:
            sd[key] = (0.02 * rng.normal(size=shape)).astype(np.float32)
        else:
            sd[key] = rng.normal(size=shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("arch", ["resnet34", "resnet50"])
def test_resnet_import_from_literal_torchvision_layout(arch, rng):
    """Map a state dict built from the literal torchvision layout table
    (independent of import_torch.py's key map) and check tree equality."""
    from ecologysemanticsegmentation_tpu.models import resnet50

    sd = _sd_from_key_table(torchvision_resnet_key_table(arch), rng)
    rec = _RecordingDict(sd)
    params, stats = resnet_encoder_from_torch(rec)
    unread = {k for k in sd if k not in rec.accessed
              and not k.endswith("num_batches_tracked")}
    assert not unread, f"importer never read: {sorted(unread)[:10]}"

    enc = {"resnet34": resnet34, "resnet50": resnet50}[arch](
        output_stride=16, dtype=jnp.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 64, 64, 3)), train=False)

    def keys(t):
        return {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert keys(variables["params"]) == keys(params), (
        set(keys(variables["params"])) ^ set(keys(params)))
    assert keys(variables["batch_stats"]) == keys(stats)
    feats = enc.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 64, 64, 3)) * 0.5, train=False)
    assert np.isfinite(np.asarray(feats[-1])).all()


@pytest.mark.parametrize("arch,enc_out,low_ch", [
    ("resnet34", 512, 64), ("resnet50", 2048, 256)])
def test_smp_import_against_literal_key_table(arch, enc_out, low_ch, rng):
    """Full smp checkpoint built from the literal decoder transcription +
    a real torchvision encoder: maps onto the flax tree, consumes every
    mappable key, and (resnet34) agrees with the in-repo synthetic builder."""
    from ecologysemanticsegmentation_tpu.models.resnet import ENCODER_FEATURES

    table = [(f"encoder.{k}", s) for k, s in torchvision_resnet_key_table(arch)]
    table += smp_decoder_key_table(enc_out, low_ch, classes=3)
    sd = _sd_from_key_table(table, rng)

    if arch == "resnet34":
        # co-drift check: the in-repo synthetic builder must produce exactly
        # the keys of this independent transcription (it omits
        # num_batches_tracked, which torch ignores on load_state_dict too)
        builder = set(_fake_smp_deeplabv3plus_state_dict(rng, classes=3))
        independent = {k for k in sd if not k.endswith("num_batches_tracked")}
        assert builder == independent, builder ^ independent

    rec = _RecordingDict(sd)
    params, stats = smp_deeplabv3plus_from_torch(rec)
    unread = {k for k in sd if k not in rec.accessed
              and not k.endswith("num_batches_tracked")}
    assert not unread, f"importer never read: {sorted(unread)[:10]}"

    model = DeepLabV3Plus(num_classes=3, encoder_name=arch)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def keys(t):
        return {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert keys(variables["params"]) == keys(params), (
        set(keys(variables["params"])) ^ set(keys(params)))
    assert keys(variables["batch_stats"]) == keys(stats)
    assert ENCODER_FEATURES[arch][-1] == enc_out

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 64, 64, 3)) * 0.5, train=False)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
