"""Gradient accumulation (``make_optimizer(grad_accum=K)`` / ``--grad_accum``).

optax.MultiSteps averages K micro-batch gradients into one Adam update.
Invariants tested: no parameter motion mid-accumulation; K identical
micro-batches produce exactly the single-step update (average of identical
gradients is that gradient); the injected learning rate reaches the inner
optimizer through the MultiSteps wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

IMG = 64


def _setup(grad_accum: int):
    model = build_model("unet", num_classes=3, dtype=jnp.float32)
    tx = make_optimizer(1e-3, grad_accum=grad_accum)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=False)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(2, IMG, IMG, 3) > 0.5).astype(np.float32)),
    }
    return state, step, batch


def _max_delta(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_no_update_mid_accumulation():
    state, step, batch = _setup(grad_accum=2)
    init_params = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
    args = (jax.random.PRNGKey(1), 0.3, jnp.ones(3), 1e-3, jnp.ones(2))
    state, metrics = step(state, batch, *args)
    assert _max_delta(state.params, init_params) == 0.0  # zero update emitted
    assert np.isfinite(float(metrics["loss"]))
    state, _ = step(state, batch, *args)
    assert _max_delta(state.params, init_params) > 0.0  # K-th step applies


def test_identical_microbatches_equal_single_step():
    """avg of K identical gradients == that gradient, so K accumulated steps
    on the same batch must land exactly where one grad_accum=1 step does.
    (Same rng => same dropout masks; augment off => same inputs.)"""
    state1, step1, batch = _setup(grad_accum=1)
    stateK, stepK, _ = _setup(grad_accum=2)
    args = (jax.random.PRNGKey(1), 0.3, jnp.ones(3), 1e-3, jnp.ones(2))
    state1, m1 = step1(state1, batch, *args)
    stateK, _ = stepK(stateK, batch, *args)
    stateK, mK = stepK(stateK, batch, *args)
    # (g + g) / 2 rounds once more than g itself: allow a few f32 ulps
    assert _max_delta(state1.params, stateK.params) < 1e-6
    assert abs(float(m1["loss"]) - float(mK["loss"])) < 1e-6
    assert float(mK["lr"]) == float(np.float32(1e-3))


def test_lr_injection_reaches_inner_optimizer():
    """A second accumulated update at a 10x lr must move params ~10x more."""
    def run(lr):
        state, step, batch = _setup(grad_accum=2)
        init = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
        args = (jax.random.PRNGKey(1), 0.3, jnp.ones(3), lr, jnp.ones(2))
        state, _ = step(state, batch, *args)
        state, _ = step(state, batch, *args)
        return _max_delta(state.params, init)

    d_small, d_big = run(1e-4), run(1e-3)
    assert 5.0 < d_big / d_small < 20.0  # Adam step-1 magnitude ~ lr
