"""MBDeconv / EfficientNetDeconvDecoder tests (working form of the
reference's dead experimental code, SURVEY §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from ecologysemanticsegmentation_tpu.models import EfficientNetDeconvDecoder, MBDeconv


def test_mbdeconv_upsample_block():
    m = MBDeconv(features=32, stride=2)
    x = jnp.zeros((2, 8, 8, 64))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 16, 16, 32)


def test_mbdeconv_residual_when_same_shape():
    m = MBDeconv(features=16, stride=1, stochastic_dropout_p=0.0)
    x = jnp.ones((1, 8, 8, 16))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_efficientnet_deconv_decoder():
    d = EfficientNetDeconvDecoder(num_classes=3)
    x = jnp.zeros((1, 4, 4, 256))
    v = d.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = d.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 3)  # 4 stages of x2
    assert out.dtype == jnp.float32


def test_efficientnet_v2s_encoder_pyramid():
    from ecologysemanticsegmentation_tpu.models import EfficientNetV2SEncoder

    enc = EfficientNetV2SEncoder(depth_multiplier=0.2)
    x = jnp.zeros((1, 64, 64, 3))
    v = enc.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = enc.apply(v, x, train=False)
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]
    assert feats[-1].shape[-1] == 256


def test_mbdeconv_stride2_fused_matches_round2_params():
    """The stride-2 fused depthwise path keeps the nn.Conv grouped-kernel
    parameter layout (checkpoint compatibility with the materialized form)."""
    m = MBDeconv(features=32, stride=2, dtype=jnp.float32)
    x = jnp.zeros((2, 8, 8, 16))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert v["params"]["depthwise"]["conv"]["kernel"].shape == (3, 3, 1, 64)
    assert m.apply(v, x, train=False).shape == (2, 16, 16, 32)


def test_efficientnet_v2s_unet():
    from ecologysemanticsegmentation_tpu.models import build_model

    m = build_model("efficientnet_v2s_unet", num_classes=2)
    # tiny depth via direct class for test speed
    from ecologysemanticsegmentation_tpu.models import EfficientNetV2SUNet

    m = EfficientNetV2SUNet(num_classes=2, depth_multiplier=0.2)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 2)
    # fused decoder/head keep the materialized form's parameter layout
    assert v["params"]["dec0"]["expand"]["conv"]["kernel"].shape[:3] == (1, 1, 416)
    assert v["params"]["head"]["kernel"].shape == (3, 3, 32, 2)
    assert v["params"]["head"]["bias"].shape == (2,)
