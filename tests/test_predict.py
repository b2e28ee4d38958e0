"""Serving Predictor tests."""

import numpy as np

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.predict import Predictor
from ecologysemanticsegmentation_tpu.train import create_train_state, make_optimizer, save_checkpoint


def _mini_predictor(tmp_path, **kw):
    model = build_model("unet", num_classes=2)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3), make_optimizer())
    save_checkpoint(str(tmp_path), "p", 3, state)
    return Predictor.from_checkpoint(
        str(tmp_path / "p_epoch3.ckpt"), num_classes=2, model_name="unet",
        img_size=32, batch_size=4, **kw,
    )


def test_predictor_padding_and_shapes(tmp_path, rng):
    p = _mini_predictor(tmp_path)
    out = p(rng.rand(6, 32, 32, 3).astype(np.float32))  # 6 -> batches of 4+pad
    assert out.shape == (6, 32, 32, 2)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_predictor_uint8_resize_single(tmp_path, rng):
    p = _mini_predictor(tmp_path)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)  # single HWC, wrong size
    out = p(img)
    assert out.shape == (1, 32, 32, 2)


def test_predictor_threshold(tmp_path, rng):
    p = _mini_predictor(tmp_path, threshold=0.5)
    out = p(rng.rand(2, 32, 32, 3).astype(np.float32))
    assert set(np.unique(out)).issubset({0.0, 1.0})
