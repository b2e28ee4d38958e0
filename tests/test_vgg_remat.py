"""Per-stage rematerialization of the VGG U-Net (``remat=True``).

The remat option must be a pure execution-plan change: identical parameter
tree (checkpoints interchangeable) and bit-identical loss/gradients/
batch-stats against the default execution, including through the real
train step (dropout RNG is threaded into each remat region, so the
backward replay regenerates the same masks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _grad_run(remat: bool, deepsupervision: bool = False):
    m = build_model("vgg_unet", num_classes=3, max_channels=256,
                    deepsupervision=deepsupervision, remat=remat)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               jnp.ones((1, 64, 64, 3)), train=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)

    def loss_fn(p):
        out, upd = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(7)},
        )
        if deepsupervision:
            out = out[0] + sum(jnp.mean(h) for h in out[1])
        return jnp.sum(out.astype(jnp.float32) ** 2), upd

    (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    return v, float(loss), grads, upd


def _max_delta(a, b):
    return max(
        float(jnp.max(jnp.abs(x - y)))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_remat_bit_identical_grads():
    v0, l0, g0, u0 = _grad_run(remat=False)
    v1, l1, g1, u1 = _grad_run(remat=True)
    assert jax.tree_util.tree_structure(v0["params"]) == jax.tree_util.tree_structure(
        v1["params"]
    ), "remat changed the parameter tree (checkpoints would break)"
    assert l0 == l1
    assert _max_delta(g0, g1) == 0.0
    assert _max_delta(u0, u1) == 0.0


def test_remat_bit_identical_with_deepsupervision():
    _, l0, g0, _ = _grad_run(remat=False, deepsupervision=True)
    _, l1, g1, _ = _grad_run(remat=True, deepsupervision=True)
    assert l0 == l1
    assert _max_delta(g0, g1) == 0.0


@pytest.mark.parametrize("max_channels", [256, 512])
def test_remat_train_step_identical(max_channels):
    """Through the full jitted train step at f32 the remat execution plan is
    equivalent to one ulp (remat's ``prevent_cse`` barriers change XLA's
    fusion layout, which at bf16 shifts rounding at region boundaries —
    measured loss delta ~3e-4; at f32 the plans agree to float noise, and
    the unjitted bf16 comparison above is exactly bitwise)."""
    img = 64
    models = [build_model("vgg_unet", num_classes=3, max_channels=max_channels,
                          remat=r, dtype=jnp.float32) for r in (False, True)]
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, img, img, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(2, img, img, 3) > 0.5).astype(np.float32)),
    }
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)
    losses = []
    params = []
    for m in models:
        tx = make_optimizer(1e-3)
        state = create_train_state(m, jax.random.PRNGKey(0), (1, img, img, 3), tx)
        step = make_train_step(m, tx, augment=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(2), 0.3,
                              gates3, 1e-3, jitters)
        losses.append(float(metrics["loss"]))
        params.append(state.params)
    assert abs(losses[0] - losses[1]) < 1e-6
    # Adam's first step is ~sign(g)*lr: one-ulp f32 reduction-order
    # differences at near-zero-gradient elements perturb or flip individual
    # updates (worst case |delta| = 2*lr), so post-optimizer params are only
    # bounded, not bitwise (same rationale as the DP trajectory check in
    # __graft_entry__).  The bitwise statement is the unjitted tests above.
    assert _max_delta(params[0], params[1]) <= 2 * 1e-3 + 1e-6


def test_remat_checkpoint_interchangeable(tmp_path):
    """A checkpoint written while training with remat=True restores into the
    remat=False model (and vice versa): identical parameter paths make the
    execution plan a free choice at load time."""
    from ecologysemanticsegmentation_tpu.train import (
        load_checkpoint_file,
        save_checkpoint,
    )

    img = 64
    m_remat = build_model("vgg_unet", num_classes=3, max_channels=256, remat=True)
    tx = make_optimizer(1e-3)
    state = create_train_state(m_remat, jax.random.PRNGKey(0), (1, img, img, 3), tx)
    path = save_checkpoint(str(tmp_path), "expt", 0, state)

    m_plain = build_model("vgg_unet", num_classes=3, max_channels=256, remat=False)
    template = create_train_state(m_plain, jax.random.PRNGKey(1), (1, img, img, 3), tx)
    restored = load_checkpoint_file(path, template)
    assert restored is not None
    assert _max_delta(restored.params, state.params) == 0.0

    x = jnp.asarray(np.random.RandomState(0).rand(1, img, img, 3), jnp.float32)
    out_plain = m_plain.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats}, x)
    out_remat = m_remat.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x)
    assert float(jnp.max(jnp.abs(out_plain - out_remat))) == 0.0
