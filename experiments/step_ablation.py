"""Component-level step-time ablation on the real TPU chip.

Times each piece of the flagship train step separately so perf work attacks
measured costs, not guesses (VERDICT round-1: the "bandwidth roofline"
claim from XLA cost analysis must be replaced by measurement).

Methodology: every timing forces a device->host scalar fetch per step
(block_until_ready does not block on the axon relay); dispatch floor through
the relay is ~3.7 ms/call and is reported alongside.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/step_ablation.py
Appends one JSON line per measurement to experiments/step_ablation.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ecologysemanticsegmentation_tpu.data.augment import augment_batch
from ecologysemanticsegmentation_tpu.losses import seven_losses
from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

IMG = 256
ORGANS = 3
BATCH = int(os.environ.get("ABL_BATCH", 128))
STEPS = int(os.environ.get("ABL_STEPS", 10))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "step_ablation.jsonl")


def record(name, ms, extra=None):
    row = {"name": name, "ms": round(ms, 2), "batch": BATCH,
           "img_per_sec": round(BATCH * 1000 / ms, 1), **(extra or {})}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def bench(fn, fetch, warmup=2, steps=STEPS):
    for i in range(warmup):
        out = fn(i)
    _ = fetch(out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = fn(warmup + i)
    _ = fetch(out)
    dt = time.perf_counter() - t0
    return 1000 * dt / steps


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32))
    batch = {"image": images, "label": labels}
    gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    model = build_model("deeplabv3plus", num_classes=ORGANS, encoder_name="resnet34")
    tx = make_optimizer(3e-4)

    # 1. full step (augment on) — the bench.py configuration
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step_aug = make_train_step(model, tx, augment=True)
    holder = {"s": state}

    def run_full(i):
        holder["s"], m = step_aug(holder["s"], batch, jax.random.PRNGKey(i),
                                  0.3, gates3, 3e-4, jitters)
        return m

    record("full_step_augment_on", bench(run_full, lambda m: float(m["loss"])))

    # 2. full step, augment off
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step_noaug = make_train_step(model, tx, augment=False)
    holder = {"s": state}

    def run_noaug(i):
        holder["s"], m = step_noaug(holder["s"], batch, jax.random.PRNGKey(i),
                                    0.3, gates3, 3e-4, jitters)
        return m

    record("full_step_augment_off", bench(run_noaug, lambda m: float(m["loss"])))

    # 3. augmentation alone
    def run_aug(i):
        img, msk = augment_batch(jax.random.PRNGKey(i), images, labels)
        return img

    record("augment_only", bench(run_aug, lambda im: float(im[0, 0, 0, 0])))

    # 4. forward + loss value (no grad, no optimizer)
    variables = model.init({"params": jax.random.PRNGKey(0)}, images[:1], train=False)

    @jax.jit
    def fwd_loss(v, x, g, bg):
        out = model.apply(v, x.astype(jnp.bfloat16), train=False)
        probs = jax.nn.sigmoid(out.astype(jnp.float32))
        seven = seven_losses(probs, g, bg)
        return seven[1] + seven[4] + seven[5] + seven[6]

    record("fwd_plus_loss_no_grad",
           bench(lambda i: fwd_loss(variables, images, labels, 0.3), float))

    # 5. forward only
    @jax.jit
    def fwd(v, x):
        return model.apply(v, x.astype(jnp.bfloat16), train=False)

    record("fwd_only", bench(lambda i: fwd(variables, images),
                             lambda o: float(o[0, 0, 0, 0])))

    # 6. loss path only (sigmoid + 7-loss tuple + grad wrt probs input)
    logits = jnp.asarray(rng.randn(BATCH, IMG, IMG, ORGANS), jnp.bfloat16)

    @jax.jit
    def loss_only_grad(lg, g, bg):
        def f(lg_):
            probs = jax.nn.sigmoid(lg_.astype(jnp.float32))
            seven = seven_losses(probs, g, bg)
            return seven[1] + seven[4] + seven[5] + seven[6]
        val, grad = jax.value_and_grad(f)(lg)
        return val

    record("loss_path_with_grad",
           bench(lambda i: loss_only_grad(logits, labels, 0.3), float))

    # 7. dispatch floor
    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    record("dispatch_floor", bench(lambda i: tiny(z), float))


if __name__ == "__main__":
    main()
