"""Round-3 ceiling accounting + bf16-input-feed A/B (VERDICT r2 Next #1).

Produces the data for the stage-by-stage speed-of-light table:

  1. XLA cost analysis (FLOPs + bytes accessed) of the full bench step and
     of isolated stages (augment, encoder fwd, fwd+bwd, optimizer, head
     loss), each with its 100%-efficiency floor at v5e peaks
     (197 TFLOP/s bf16 MXU, 819 GB/s HBM).
  2. A/B: feeding the step bf16 images instead of f32 (halves augmentation
     read bandwidth + batch H2D; [0,1] images from uint8/255 round-trip
     bf16's 8 mantissa bits with <=0.2% error).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r3_ceiling.py
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

from ecologysemanticsegmentation_tpu.data.augment import augment_batch
from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

IMG = 256
ORGANS = 3
BATCH = 128
PEAK_TFLOPS = 197.0     # v5e bf16 MXU
PEAK_GBS = 819.0        # v5e HBM
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_perf.jsonl")


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = float(c.get("flops", 0.0))
    bytes_ = float(c.get("bytes accessed", 0.0))
    return {
        "gflop": round(flops / 1e9, 1),
        "gbytes": round(bytes_ / 1e9, 3),
        "floor_ms_mxu": round(flops / (PEAK_TFLOPS * 1e9), 2),
        "floor_ms_hbm": round(bytes_ / (PEAK_GBS * 1e6), 2),
    }


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32)
    labels = jnp.asarray(
        (rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32))
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    model = build_model("deeplabv3plus", num_classes=ORGANS,
                        encoder_name="resnet34", upsample_head=False)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=True, lowres_head=True)
    batch = {"image": images, "label": labels}

    which = os.environ.get("CEIL_ONLY", "cost,bf16").split(",")

    if "cost" in which:
        # full step
        record({"name": "cost_full_step", **cost(
            lambda s, b, r: step(s, b, r, 0.3, gates3, 3e-4, jitters),
            state, batch, jax.random.PRNGKey(0))})
        # augmentation alone
        record({"name": "cost_augment", **cost(
            lambda r, im, lb: augment_batch(r, im, lb),
            jax.random.PRNGKey(0), images, labels)})
        # encoder+decoder forward alone (bf16 images)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def fwd(v, x):
            return model.apply(v, x, train=False)

        record({"name": "cost_model_fwd", **cost(
            fwd, variables, images.astype(jnp.bfloat16))})

        # fwd+bwd (grad wrt params of the mean logit — isolates model autodiff)
        def fwdbwd(p, bs, x):
            def f(p_):
                out = model.apply({"params": p_, "batch_stats": bs}, x,
                                  train=False)
                return jnp.mean(out.astype(jnp.float32))
            return jax.grad(f)(p)

        record({"name": "cost_model_fwd_bwd", **cost(
            fwdbwd, state.params, state.batch_stats,
            images.astype(jnp.bfloat16))})

        # optimizer alone
        def opt(s, grads):
            updates, opt_state = tx.update(grads, s.opt_state, s.params)
            import optax
            return optax.apply_updates(s.params, updates), opt_state

        record({"name": "cost_optimizer", **cost(opt, state, state.params)})

        # fused head loss
        from ecologysemanticsegmentation_tpu.losses import seven_losses_lowres

        lg = jnp.zeros((BATCH, IMG // 4, IMG // 4, ORGANS), jnp.float32)

        def hl(lg_, g):
            def f(l):
                seven = seven_losses_lowres(l, g)
                return seven[1] + seven[4] + seven[5] + seven[6]
            return jax.grad(f)(lg_)

        record({"name": "cost_head_loss_bwd", **cost(hl, lg, labels)})

    if "bf16" in which:
        # A/B: bf16 image feed through the SAME step
        def bench(feed_batch, tag):
            st = create_train_state(model, jax.random.PRNGKey(0),
                                    (1, IMG, IMG, 3), tx)
            holder = {"s": st}

            def run(i):
                holder["s"], m = step(holder["s"], feed_batch,
                                      jax.random.PRNGKey(i), 0.3, gates3,
                                      3e-4, jitters)
                return m

            for i in range(3):
                out = run(i)
            float(out["loss"])
            t0 = time.perf_counter()
            for i in range(20):
                out = run(3 + i)
            float(out["loss"])
            ms = 1000 * (time.perf_counter() - t0) / 20
            record({"name": tag, "ms": round(ms, 2), "batch": BATCH,
                    "img_per_sec": round(BATCH * 1000 / ms, 1)})

        bench(batch, "feed_f32_baseline")
        batch16 = {"image": images.astype(jnp.bfloat16),
                   "label": labels.astype(jnp.bfloat16)}
        bench(batch16, "feed_bf16")


if __name__ == "__main__":
    main()
