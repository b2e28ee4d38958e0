"""Int8 PTQ serving path (quant.py + Predictor int8=True).

The scheme: per-output-channel symmetric int8 weights x per-tensor int8
activations, calibrated by interception (no model-code changes), applied
only on the serving path.  Reference has no quantization story
(SURVEY.md: serving additions); correctness here means "close to the bf16
forward and structurally quantized".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.quant import (
    MIN_CHANNELS,
    build_qparams,
    calibrate_act_scales,
    quantize_for_serving,
)
from ecologysemanticsegmentation_tpu.train import create_train_state, make_optimizer


@pytest.fixture(scope="module")
def flagship():
    model = build_model(name="deeplabv3plus", num_classes=3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3), make_optimizer())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.bfloat16)
    return model, state, variables, x


def test_calibration_covers_convs_and_pointwise_parts(flagship):
    model, _, variables, x = flagship
    scales = calibrate_act_scales(model, variables, [x])
    assert len(scales) > 30  # resnet34 encoder + ASPP + decoder
    # the decoder fuse is a 2-part virtual concat -> two input scales
    assert scales[("fuse", "pointwise")] and len(scales[("fuse", "pointwise")]) == 2
    assert all(s > 0 for vals in scales.values() for s in vals)


def test_qparams_skip_thin_convs_and_bound_quant_error(flagship):
    model, _, variables, x = flagship
    scales = calibrate_act_scales(model, variables, [x])
    q = build_qparams(variables["params"], scales)
    # stem (cin=3) and head (cout=3) stay bf16
    for path in q:
        k8 = q[path]["k8"]
        assert k8.dtype == np.int8
        assert k8.shape[-2] >= MIN_CHANNELS and k8.shape[-1] >= MIN_CHANNELS
    assert ("encoder", "conv1") not in q  # stem (cin=3)
    assert ("head",) not in q
    # per-channel dequant reconstructs the kernel to within half an lsb
    path = ("encoder", "layer1_block0", "conv1")
    kernel = np.asarray(
        variables["params"]["encoder"]["layer1_block0"]["conv1"]["kernel"],
        np.float32)
    rec = q[path]["k8"].astype(np.float32) * q[path]["dq"]
    assert np.abs(rec - kernel).max() <= np.abs(q[path]["dq"]).max() * 0.5 + 1e-7


def test_int8_forward_close_to_bf16(flagship):
    model, _, variables, x = flagship
    qfn, n = quantize_for_serving(model, variables, [x])
    out_q = np.asarray(jax.jit(qfn)(x), np.float32)
    out_bf = np.asarray(model.apply(variables, x, train=False), np.float32)
    assert n > 30
    assert out_q.shape == out_bf.shape
    d = np.abs(out_q - out_bf)
    assert d.max() < 0.25 and d.mean() < 0.02  # logits; random-init net


@pytest.mark.parametrize("name,kw,min_q", [
    ("unet", {}, 6),
    # max_channels=64 truncates VGG19 to convs 0-1 + a small decoder
    # (reference truncation rule), so only a handful of plain convs remain;
    # the fused NearestUpConcatConv decoder entries stay bf16 by design.
    ("vgg_unet", {"max_channels": 64}, 3),
])
def test_int8_covers_other_zoo_members(name, kw, min_q):
    """The interception-based calibration claims zoo-wide coverage without
    per-model code — verify on two non-flagship families: plain nn.Convs
    quantize, custom fused modules (NearestUpConcatConv) skip cleanly."""
    model = build_model(name=name, num_classes=3, **kw)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, 64, 64, 3), make_optimizer())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.bfloat16)
    qfn, n = quantize_for_serving(model, variables, [x])
    assert n >= min_q
    out_q = np.asarray(jax.jit(qfn)(x), np.float32)
    out_bf = np.asarray(model.apply(variables, x, train=False), np.float32)
    assert out_q.shape == out_bf.shape
    assert np.abs(out_q - out_bf).max() < 0.5  # random-init logits


def test_predictor_int8_lazy_calibration_matches_bf16(flagship):
    from ecologysemanticsegmentation_tpu.predict import Predictor

    model, state, _, _ = flagship
    rng = np.random.RandomState(1)
    images = rng.rand(3, 64, 64, 3).astype(np.float32)
    p_bf = Predictor(model, state, img_size=64, batch_size=4)
    p_q = Predictor(model, state, img_size=64, batch_size=4, int8=True)
    probs_bf = p_bf(images)
    probs_q = p_q(images)  # calibrates on this first batch
    assert p_q.n_quantized and p_q.n_quantized > 30
    assert probs_q.shape == probs_bf.shape
    # probabilities are sigmoid-squashed: tight agreement expected
    assert np.abs(probs_q - probs_bf).max() < 0.1
    assert np.abs(probs_q - probs_bf).mean() < 0.01
    # second call reuses the compiled program (no recalibration)
    again = p_q(images)
    np.testing.assert_array_equal(again, probs_q)
