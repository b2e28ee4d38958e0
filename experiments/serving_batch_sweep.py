"""Serving batch-size sweep (ROADMAP item): baked bf16 vs int8 PTQ.

For each batch size, times the shipped Predictor forward program shapes
(weights baked as constants, BN folded, sigmoid epilogue) on the real chip
and reports img/s + per-image latency.  Serving deployments pick the batch
from this curve: small batches are relay/dispatch-bound, large ones
HBM-bound.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/serving_batch_sweep.py
Appends to experiments/r3_perf.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ecologysemanticsegmentation_tpu.models import build_model, fold_batchnorm
from ecologysemanticsegmentation_tpu.quant import quantize_for_serving
from ecologysemanticsegmentation_tpu.train import create_train_state, make_optimizer

IMG, ORGANS = 256, 3
BATCHES = (8, 16, 32, 64, 128, 256)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_perf.jsonl")


def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def bench(fn, x, steps=30):
    for _ in range(3):
        out = fn(x)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(x)
    float(out[0, 0, 0, 0])
    return 1000 * (time.perf_counter() - t0) / steps


def main():
    model = build_model("deeplabv3plus", num_classes=ORGANS, encoder_name="resnet34")
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3),
                               make_optimizer())
    p, bs, _ = fold_batchnorm(state.params, state.batch_stats)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, p),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, bs)}
    rng = np.random.RandomState(0)
    calib = jnp.asarray(rng.rand(32, IMG, IMG, 3), jnp.bfloat16)
    qfn, n_q = quantize_for_serving(model, variables, [calib])
    print(f"quantized {n_q} convs", flush=True)

    for batch in BATCHES:
        x = jnp.asarray(rng.rand(batch, IMG, IMG, 3), jnp.float32)

        @jax.jit
        def f_bf(images):
            out = model.apply(variables, images.astype(jnp.bfloat16), train=False)
            return jax.nn.sigmoid(out.astype(jnp.float32))

        @jax.jit
        def f_q(images):
            return jax.nn.sigmoid(qfn(images.astype(jnp.bfloat16)).astype(jnp.float32))

        ms_bf = bench(f_bf, x)
        ms_q = bench(f_q, x)
        record({"name": "serving_sweep", "batch": batch,
                "bf16_ms": round(ms_bf, 2), "bf16_img_per_sec": round(batch * 1000 / ms_bf, 1),
                "int8_ms": round(ms_q, 2), "int8_img_per_sec": round(batch * 1000 / ms_q, 1),
                "int8_speedup": round(ms_bf / ms_q, 2)})


if __name__ == "__main__":
    main()
