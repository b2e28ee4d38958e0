"""Relative perf anchor: the torch reference's train step vs ours, same host CPU.

bench.py's ``vs_baseline`` divides by a *documented assumption* (600 img/s for
the torch reference on an H100) because the reference publishes no numbers and
this host has no GPU.  This experiment tightens the story with a measured
RELATIVE anchor on hardware both sides can run: the raw-torch DeepLabV3+
mirror (proven numerically identical to the flax flagship in
tests/test_model_torch_parity.py) executing the reference's real loss code
(tests/reference_oracle.py) + Adam, vs the framework's f32 CPU train step —
identical architecture, losses, batch and image size, one CPU core.

This measures framework overhead/graph quality, not TPU-vs-GPU hardware.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/torch_cpu_anchor.py
Writes experiments/torch_cpu_anchor.json.
"""

from __future__ import annotations

import datetime
import json
import subprocess
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import torch

torch.set_num_threads(1)  # single-core host; keep both sides at 1 thread

from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from reference_oracle import load_reference_losses
from experiments.dice_parity import torch_losses_fn
from experiments.torch_mirror import TorchDeepLabV3Plus

IMG = int(os.environ.get("ANCHOR_IMG", 128))
BATCH = int(os.environ.get("ANCHOR_BATCH", 4))
ORGANS = 3
STEPS = int(os.environ.get("ANCHOR_STEPS", 5))


def torch_step_time():
    lf = load_reference_losses()
    net = TorchDeepLabV3Plus(ORGANS)
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=3e-4)
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.rand(BATCH, 3, IMG, IMG), dtype=torch.float32)
    y = torch.tensor((rng.rand(BATCH, ORGANS, IMG, IMG) > 0.5).astype(np.float32))

    def one_step():
        opt.zero_grad()
        out = torch.sigmoid(net(x))
        # reference train_multiclass.py:260-262 per-organ recursion + :145 gate
        seven = torch_losses_fn(lf, out, y)
        total = seven[6] + seven[1] + seven[4] + seven[5]
        total.backward()
        opt.step()
        return float(total.detach())

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(STEPS):
        one_step()
    return (time.perf_counter() - t0) / STEPS


def jax_step_time():
    model = build_model("deeplabv3plus", num_classes=ORGANS,
                        encoder_name="resnet34", dtype=jnp.float32)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=False)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5
                              ).astype(np.float32)),
    }
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)
    state, m = step(state, batch, jax.random.PRNGKey(1), 0.0, gates3, 3e-4, jitters)
    float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, batch, jax.random.PRNGKey(i), 0.0, gates3, 3e-4, jitters)
    float(m["loss"])
    return (time.perf_counter() - t0) / STEPS


def main():
    tj = jax_step_time()
    print(json.dumps({"jax_cpu_step_s": round(tj, 3)}))
    tt = torch_step_time()
    print(json.dumps({"torch_cpu_step_s": round(tt, 3)}))
    result = {
        "img": IMG, "batch": BATCH, "steps": STEPS, "threads": 1,
        "torch_cpu_img_per_s": round(BATCH / tt, 3),
        "jax_cpu_img_per_s": round(BATCH / tj, 3),
        "jax_over_torch": round(tt / tj, 3),
        "note": "same arch/losses/optimizer, f32, one CPU core; relative "
                "framework anchor — not a TPU-vs-GPU claim",
        # provenance consumed by bench.py's cpu_anchor_recorded field
        "recorded": datetime.date.today().isoformat() + " " + subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip(),
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "torch_cpu_anchor.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
