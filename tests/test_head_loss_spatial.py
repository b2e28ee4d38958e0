"""Spatially-partitioned fused head loss (head_sums_spatial / shard_map).

On the 8-device virtual CPU mesh (conftest): labels row-sharded over the
``model`` axis, 1/4-res logits replicated, per-shard partial sums psum'd.
Both shard bodies are exercised — the jnp reference and the actual Pallas
kernels under ``interpret=True`` — against the global single-device
reference, values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecologysemanticsegmentation_tpu.ops.pallas.head_loss import (
    head_sums_reference,
    head_sums_spatial,
)
from ecologysemanticsegmentation_tpu.parallel import create_mesh

B, h, w, C = 8, 16, 16, 3
H = W = 64


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))
    labels = jnp.asarray((rng.rand(B, H, W, C) > 0.5).astype(np.float32))
    return logits, labels


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(8, model_parallel=2)


@pytest.mark.parametrize("body", ["reference", "pallas_interpret"])
def test_spatial_matches_global(data, mesh, body):
    logits, labels = data
    want = head_sums_reference(logits, labels)
    kw = (dict(use_pallas=False) if body == "reference"
          else dict(use_pallas=True, interpret=True))
    got = head_sums_spatial(logits, labels, mesh, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("body", ["reference", "pallas_interpret"])
def test_spatial_gradients_match_global(data, mesh, body):
    logits, labels = data
    cot = jnp.asarray(np.random.RandomState(1).randn(8, C).astype(np.float32))
    kw = (dict(use_pallas=False) if body == "reference"
          else dict(use_pallas=True, interpret=True))

    def f_global(x):
        return jnp.sum(head_sums_reference(x, labels)[:7] * cot[:7])

    def f_spatial(x):
        return jnp.sum(head_sums_spatial(x, labels, mesh, **kw)[:7] * cot[:7])

    g_want = jax.grad(f_global)(logits)
    g_got = jax.grad(f_spatial)(logits)
    denom = np.abs(np.asarray(g_want)).max()
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-5 * max(denom, 1.0))


def test_spatial_train_step_matches_unpartitioned(mesh):
    """Full train step with spatial_mesh set vs the plain lowres step: same
    loss and same updated params (jnp shard body on CPU)."""
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.parallel import (
        batch_sharding,
        replicated_sharding,
    )
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    img = 64
    model = build_model("deeplabv3plus", num_classes=3,
                        encoder_name="resnet34", upsample_head=False,
                        dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(8, img, img, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(8, img, img, 3) > 0.5).astype(np.float32)),
    }
    args = (jax.random.PRNGKey(2), 0.3, jnp.ones(3), 1e-3, jnp.ones(2))

    losses, params = [], []
    for spatial in (None, mesh):
        tx = make_optimizer(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, img, img, 3), tx)
        step = make_train_step(model, tx, augment=False, lowres_head=True,
                               spatial_mesh=spatial)
        b = batch
        if spatial is not None:
            state = jax.device_put(state, replicated_sharding(mesh))
            bsh = batch_sharding(mesh, spatial=True)
            b = {k: jax.device_put(v, bsh) for k, v in batch.items()}
            with mesh:
                state, metrics = step(state, b, *args)
        else:
            state, metrics = step(state, b, *args)
        losses.append(float(metrics["loss"]))
        params.append(jax.device_get(state.params))
    assert np.isfinite(losses[0])
    assert abs(losses[0] - losses[1]) < 1e-5 * max(abs(losses[0]), 1.0)
    deltas = [
        float(np.max(np.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(params[0]),
                        jax.tree_util.tree_leaves(params[1]))
    ]
    assert max(deltas) <= 2e-3 + 1e-6  # Adam step-1 bound (cf. test_vgg_remat)


@pytest.mark.parametrize("body", ["reference", "pallas_interpret"])
def test_loss_sums_spatial_matches_global(data, mesh, body):
    """The flat loss-sums reduction under shard_map (full-resolution loss
    paths' --spatial_partition form): values and gradients match the global
    reduction for both shard bodies."""
    from ecologysemanticsegmentation_tpu.ops.pallas.loss_sums import (
        loss_sums_nhwc,
        loss_sums_nhwc_spatial,
    )

    logits, labels = data
    probs = jax.nn.sigmoid(
        jnp.asarray(np.random.RandomState(3).randn(B, H, W, C), jnp.float32))
    want = loss_sums_nhwc(probs, labels, use_pallas=False)
    use_pallas = body == "pallas_interpret"
    kw = dict(use_pallas=use_pallas, interpret=use_pallas)
    got = loss_sums_nhwc_spatial(probs, labels, mesh, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)

    cot = jnp.asarray(np.random.RandomState(4).randn(8, C).astype(np.float32))

    def f_global(p):
        return jnp.sum(loss_sums_nhwc(p, labels, use_pallas=False)[:7] * cot[:7])

    def f_spatial(p):
        return jnp.sum(loss_sums_nhwc_spatial(
            p, labels, mesh, **kw)[:7] * cot[:7])

    g_want = jax.grad(f_global)(probs)
    g_got = jax.grad(f_spatial)(probs)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-5)


def test_spatial_context_reroutes_and_restores(data, mesh):
    """Inside spatial_mesh_context, loss_sums_nhwc produces the shard_map'd
    result; outside, the plain reduction — and the context is reentrancy-safe
    (the shard body's inner call does not recurse)."""
    from ecologysemanticsegmentation_tpu.ops.pallas.loss_sums import (
        loss_sums_nhwc,
        spatial_mesh_context,
    )

    _, labels = data
    probs = jax.nn.sigmoid(
        jnp.asarray(np.random.RandomState(5).randn(B, H, W, C), jnp.float32))
    want = loss_sums_nhwc(probs, labels, use_pallas=False)
    with spatial_mesh_context(mesh):
        got = loss_sums_nhwc(probs, labels, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)
    # fully restored after the context
    from ecologysemanticsegmentation_tpu.ops.pallas import loss_sums as m
    assert m._SPATIAL_STACK == []


def test_spatial_sequential_train_step(mesh):
    """The sequential composite loss path trains under --spatial_partition:
    one step on the virtual mesh with spatial_mesh matches the
    unpartitioned step."""
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.parallel import (
        batch_sharding,
        replicated_sharding,
    )
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    img = 64
    model = build_model("deeplabv3plus", num_classes=3,
                        encoder_name="resnet34", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(8, img, img, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(8, img, img, 3) > 0.5).astype(np.float32)),
    }
    args = (jax.random.PRNGKey(2), 0.3, jnp.ones(3), 1e-3, jnp.ones(2))
    losses = []
    for spatial in (None, mesh):
        tx = make_optimizer(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, img, img, 3), tx)
        step = make_train_step(model, tx, augment=False,
                               composite_mode="sequential",
                               spatial_mesh=spatial)
        b = batch
        if spatial is not None:
            state = jax.device_put(state, replicated_sharding(mesh))
            bsh = batch_sharding(mesh, spatial=True)
            b = {k: jax.device_put(v, bsh) for k, v in batch.items()}
            with mesh:
                state, metrics = step(state, b, *args)
        else:
            state, metrics = step(state, b, *args)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[0])
    assert abs(losses[0] - losses[1]) < 1e-5 * max(abs(losses[0]), 1.0)
