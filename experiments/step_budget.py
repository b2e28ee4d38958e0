"""Per-component step-time budget on the real chip (VERDICT r1 weak #2/#3).

Times isolated jitted subgraphs of the batch-128 training step so the
optimization targets are measured, not inferred from XLA cost analysis.
Every timing forces a device->host scalar fetch (block_until_ready does not
block on the remote axon platform).

Usage:  python experiments/step_budget.py [batch]
Writes /tmp/step_budget.json and prints one JSON line per component.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import sys
import time


IMG = 256
ORGANS = 3


def timeit(fn, *args, steps=10, warmup=2, fetch=None):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out if fetch is None else fetch(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _fetch(out if fetch is None else fetch(out))
    return (time.perf_counter() - t0) / steps * 1000.0


def _fetch(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    # fetch ONE scalar derived from the last leaf (cheap through the relay)
    float(leaves[-1].reshape(-1)[0])


def main(batch_size=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.data.augment import augment_batch
    from ecologysemanticsegmentation_tpu.losses import seven_losses_lowres
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from ecologysemanticsegmentation_tpu.train.trainer import _prepare_labels

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch_size, IMG, IMG, 3), jnp.float32)
    labels = jnp.asarray(
        (rng.rand(batch_size, IMG, IMG, ORGANS) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)

    model = build_model("deeplabv3plus", num_classes=ORGANS,
                        encoder_name="resnet34", upsample_head=False)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, key, (1, IMG, IMG, 3), tx)

    budget = {"batch_size": batch_size}

    # 1. device augmentation alone
    aug = jax.jit(lambda k, im, lb: augment_batch(k, im, lb))
    budget["augment_ms"] = timeit(aug, key, images, labels)
    print(json.dumps({"augment_ms": budget["augment_ms"]}))

    # 2. model forward (train mode, lowres head), loss excluded
    @jax.jit
    def fwd(params, bstats, im):
        out, _ = model.apply({"params": params, "batch_stats": bstats},
                             im.astype(jnp.bfloat16), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key})
        return out

    budget["fwd_ms"] = timeit(fwd, state.params, state.batch_stats, images)
    print(json.dumps({"fwd_ms": budget["fwd_ms"]}))

    # 3. fused loss from fixed lowres logits (fwd only)
    logits = fwd(state.params, state.batch_stats, images)
    prep = jax.jit(_prepare_labels)
    labels_p = prep(labels)

    loss_only = jax.jit(lambda lg, lb: seven_losses_lowres(lg, lb)[1])
    budget["loss_fwd_ms"] = timeit(loss_only, logits, labels_p)
    print(json.dumps({"loss_fwd_ms": budget["loss_fwd_ms"]}))

    # 4. fwd + loss + backward (grads wrt params), no optimizer
    def fwd_loss(params, bstats, im, lb):
        out, _ = model.apply({"params": params, "batch_stats": bstats},
                             im.astype(jnp.bfloat16), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": key})
        seven = seven_losses_lowres(out, lb)
        return seven[6] + seven[1] + seven[4] + seven[5]

    grad_fn = jax.jit(jax.value_and_grad(fwd_loss))
    budget["fwd_bwd_ms"] = timeit(
        grad_fn, state.params, state.batch_stats, images, labels_p,
        fetch=lambda o: o[0])
    print(json.dumps({"fwd_bwd_ms": budget["fwd_bwd_ms"]}))

    # 5. optimizer update alone (reuse grads)
    _, grads = grad_fn(state.params, state.batch_stats, images, labels_p)

    @jax.jit
    def adam(opt_state, params, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state

    budget["adam_ms"] = timeit(adam, state.opt_state, state.params, grads,
                               fetch=lambda o: o[0])
    print(json.dumps({"adam_ms": budget["adam_ms"]}))

    # 6. the full shipped train step (donated state -> rebuild each call is
    # wrong; instead chain states like bench.py does)
    step = make_train_step(model, tx, augment=True, lowres_head=True)
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)
    batch = {"image": images, "label": labels}
    st = state
    for i in range(3):
        st, m = step(st, batch, jax.random.PRNGKey(i), 0.3, gates3, 3e-4, jitters)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 15
    for i in range(n):
        st, m = step(st, batch, jax.random.PRNGKey(i), 0.3, gates3, 3e-4, jitters)
    float(m["loss"])
    budget["full_step_ms"] = (time.perf_counter() - t0) / n * 1000.0
    print(json.dumps({"full_step_ms": budget["full_step_ms"]}))

    budget["unaccounted_ms"] = round(
        budget["full_step_ms"] - budget["augment_ms"] - budget["fwd_bwd_ms"]
        - budget["adam_ms"], 2)
    with open("/tmp/step_budget.json", "w") as f:
        json.dump(budget, f, indent=1)
    print(json.dumps(budget))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
