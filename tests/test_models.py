"""Shape/behavior tests for the model zoo (CPU, small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu import models


def _init_and_run(model, x, train=False):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    if train:
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return out, variables, mutated
    out = model.apply(variables, x, train=False)
    return out, variables, None


@pytest.mark.parametrize("encoder", ["resnet34", "resnet50"])
def test_deeplabv3plus_shapes(encoder):
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    model = models.DeepLabV3Plus(num_classes=3, encoder_name=encoder)
    out, _, _ = _init_and_run(model, x)
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == jnp.float32


def test_deeplabv3plus_depthwise_shape():
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    model = models.DeepLabV3PlusDepthwise(num_classes=3)
    out, variables, _ = _init_and_run(model, x)
    assert out.shape == (2, 64, 64, 3)
    # Backbone head predicts classes * 5 channels (reference depthwise_multiplier).
    inner = variables["params"]["smp_deeplab_model"]["head"]["kernel"]
    assert inner.shape[-1] == 15


def test_unet_shapes():
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out, _, _ = _init_and_run(models.UNet(num_classes=2), x)
    assert out.shape == (2, 64, 64, 2)


@pytest.mark.parametrize("max_channels,expected_skips", [(256, 3), (512, 5)])
def test_vgg_unet_truncation(max_channels, expected_skips):
    """MAXCHANNELS truncates the encoder at the first conv wider than it
    (reference vgg.py:121-127): 256 -> 3 pool levels, 512 -> 5."""
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc = models.VGGUNetEncoder(max_channels=max_channels)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y, skips = enc.apply(variables, x, train=False)
    assert len(skips) == expected_skips
    stride = 2 ** expected_skips
    assert y.shape[1] == 64 // stride
    assert y.shape[-1] == min(max_channels, 512)


@pytest.mark.parametrize("max_channels", [256, 512])
def test_vgg_unet_full(max_channels):
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    model = models.VGGUNet(num_classes=1, max_channels=max_channels)
    out, _, _ = _init_and_run(model, x)
    assert out.shape == (1, 64, 64, 1)


def test_vgg_unet_deepsupervision_heads():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    model = models.VGGUNet(num_classes=2, max_channels=512, deepsupervision=True)
    (out, heads), _, _ = _init_and_run(model, x)
    assert out.shape == (1, 64, 64, 2)
    assert len(heads) == 5
    for h in heads:
        assert h.shape[-1] == 2


def test_train_mode_updates_batch_stats():
    x = jnp.ones((2, 32, 32, 3), jnp.float32) * 0.7
    model = models.DeepLabV3Plus(num_classes=1)
    out, variables, mutated = _init_and_run(model, x, train=True)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed, "train mode must update running BN statistics"


def test_stochastic_dropout_semantics():
    sd = models.StochasticDropout(p=0.5)
    x = jnp.ones((4, 8, 8, 16))
    v = sd.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    out_det = sd.apply(v, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(x))
    out = sd.apply(v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)})
    vals = np.unique(np.asarray(out))
    # survival scaling: zeros and 1/keep survive
    assert set(np.round(vals, 4)).issubset({0.0, 2.0})


def test_build_model_factory():
    m = models.build_model("deeplabv3plus", num_classes=3)
    assert isinstance(m, models.DeepLabV3Plus)
    m = models.build_model("unet", num_classes=1, depthwise=True)
    assert isinstance(m, models.DeepLabV3PlusDepthwise)
    with pytest.raises(ValueError):
        models.build_model("nope")


def test_nearest_up_concat_conv_matches_oracle(rng):
    """NearestUpConcatConv (fused nearest-x2 + concat + conv3x3) must equal
    the composed ops exactly, in both concat orders, with/without skip."""
    import jax.numpy as jnp
    from ecologysemanticsegmentation_tpu.models.common import NearestUpConcatConv
    from ecologysemanticsegmentation_tpu.ops.resize import upsample_nearest

    low = jnp.asarray(rng.rand(2, 8, 9, 5), jnp.float32)
    skip = jnp.asarray(rng.rand(2, 16, 18, 4), jnp.float32)

    for up_first, with_skip in [(True, True), (False, True), (True, False)]:
        m = NearestUpConcatConv(6, use_bias=True, up_first=up_first,
                                dtype=jnp.float32)
        sk = skip if with_skip else None
        v = m.init({"params": jax.random.PRNGKey(0)}, low, sk)
        out = m.apply(v, low, sk)

        k = v["params"]["kernel"]
        b = v["params"]["bias"]
        up = upsample_nearest(low, 2)
        parts = [up] if sk is None else (
            [up, skip] if up_first else [skip, up])
        ref = jax.lax.conv_general_dilated(
            jnp.concatenate(parts, axis=-1), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_nearest_up_depthwise_conv_matches_oracle(rng):
    """NearestUpDepthwiseConv (fused nearest-x2 + depthwise conv3x3) must
    equal the composed ops, with the nn.Conv grouped-kernel layout."""
    import jax.numpy as jnp
    from ecologysemanticsegmentation_tpu.models.common import NearestUpDepthwiseConv
    from ecologysemanticsegmentation_tpu.ops.resize import upsample_nearest

    low = jnp.asarray(rng.rand(2, 8, 9, 5), jnp.float32)
    m = NearestUpDepthwiseConv(use_bias=True, dtype=jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, low)
    out = m.apply(v, low)
    assert v["params"]["kernel"].shape == (3, 3, 1, 5)

    up = upsample_nearest(low, 2)
    ref = jax.lax.conv_general_dilated(
        up, v["params"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=5,
    ) + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
