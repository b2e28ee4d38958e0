"""Round-3 perf levers, measured on the real TPU chip (VERDICT r2 Next #1).

Isolates, in the bench.py configuration (lowres_head + fused head-loss,
batch 128 @ 256px):

  1. baseline full step (re-measure),
  2. the cost of ``_prepare_labels`` (binarize + union transform) by
     replacing it with identity — the candidate for folding into the fused
     head-loss kernel,
  3. multi-step dispatch: ``k_steps=8`` lax.scan (amortizes the ~3.7 ms
     relay floor + ~3 ms measured per-step device IDLE).

Methodology: device->host scalar fetch closes each timing window
(block_until_ready does not block on the axon relay).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r3_perf.py
Appends JSON lines to experiments/r3_perf.jsonl.
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

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from ecologysemanticsegmentation_tpu.train import trainer as trainer_mod

IMG = 256
ORGANS = 3
BATCH = int(os.environ.get("ABL_BATCH", 128))
STEPS = int(os.environ.get("ABL_STEPS", 20))
K = int(os.environ.get("ABL_K", 8))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_perf.jsonl")


def record(name, ms, extra=None):
    row = {"name": name, "ms": round(ms, 2), "batch": BATCH,
           "img_per_sec": round(BATCH * 1000 / ms, 1), **(extra or {})}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def bench(fn, fetch, warmup=3, steps=STEPS):
    for i in range(warmup):
        out = fn(i)
    _ = fetch(out)
    t0 = time.perf_counter()
    for i in range(steps):
        out = fn(warmup + i)
    _ = fetch(out)
    dt = time.perf_counter() - t0
    return 1000 * dt / steps


def fresh_state(model, tx):
    return create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray(
            (rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
    }
    gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    model = build_model("deeplabv3plus", num_classes=ORGANS,
                        encoder_name="resnet34", upsample_head=False)
    tx = make_optimizer(3e-4)
    which = os.environ.get("ABL_ONLY", "base,noprep,scan").split(",")

    # 1. baseline: the exact bench.py step
    if "base" in which:
        step = make_train_step(model, tx, augment=True, lowres_head=True)
        holder = {"s": fresh_state(model, tx)}

        def run(i):
            holder["s"], m = step(holder["s"], batch, jax.random.PRNGKey(i),
                                  0.3, gates3, 3e-4, jitters)
            return m

        record("baseline_lowres_step", bench(run, lambda m: float(m["loss"])))

    # 2. label-prep ablation: identity in place of binarize+union
    if "noprep" in which:
        orig = trainer_mod._prepare_labels
        trainer_mod._prepare_labels = lambda x: x
        try:
            step_np = make_train_step(model, tx, augment=True, lowres_head=True)
            holder = {"s": fresh_state(model, tx)}

            def run_np(i):
                holder["s"], m = step_np(holder["s"], batch,
                                         jax.random.PRNGKey(i),
                                         0.3, gates3, 3e-4, jitters)
                return m

            record("no_label_prep", bench(run_np, lambda m: float(m["loss"])))
        finally:
            trainer_mod._prepare_labels = orig

    # 3. K-step scan dispatch
    if "scan" in which:
        unroll = int(os.environ.get("ABL_UNROLL", 1))
        stacked = {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch.items()}
        stacked = {k: jnp.asarray(v) for k, v in stacked.items()}  # materialize
        stepk = make_train_step(model, tx, augment=True, lowres_head=True,
                                k_steps=K, scan_unroll=unroll)
        holder = {"s": fresh_state(model, tx)}

        def run_k(i):
            holder["s"], m = stepk(holder["s"], stacked, jax.random.PRNGKey(i),
                                   0.3, gates3, 3e-4, jitters)
            return m

        ms = bench(run_k, lambda m: float(m["loss"][-1]),
                   warmup=2, steps=max(4, STEPS // K))
        record(f"scan_k{K}_u{unroll}", ms / K,
               {"k_steps": K, "unroll": unroll, "dispatch_ms": round(ms, 2)})


if __name__ == "__main__":
    main()
