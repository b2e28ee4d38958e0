"""Measure the PyTorch reference's train-step rate on THIS host's CPU.

The reference publishes no numbers and this host has no GPU, so bench.py's
``vs_baseline`` divides by a documented H100 assumption.  This script adds a
*measured relative anchor* on shared hardware: the same architecture
(raw-torch DeepLabV3+ mirror == smp model), the reference's executed loss
code, full fwd+bwd+Adam at 256px — on the host CPU, vs the JAX framework
step on the same CPU.  The TPU/CPU ratio is then hardware speedup with the
framework factored out.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/torch_anchor.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np
import torch

from experiments.torch_mirror import TorchDeepLabV3Plus
from reference_oracle import load_reference_losses

IMG = 256
ORGANS = 3
BATCH = int(os.environ.get("ANCHOR_BATCH", 4))
STEPS = int(os.environ.get("ANCHOR_STEPS", 5))


def torch_step_ms():
    lf = load_reference_losses()
    net = TorchDeepLabV3Plus(num_classes=ORGANS, dropout=0.5)
    opt = torch.optim.Adam(net.parameters(), lr=3e-4)
    rng = np.random.RandomState(0)
    x = torch.from_numpy(rng.rand(BATCH, 3, IMG, IMG).astype(np.float32))
    g = torch.from_numpy((rng.rand(BATCH, ORGANS, IMG, IMG) > 0.5).astype(np.float32))
    net.train()

    def step():
        opt.zero_grad()
        out = torch.sigmoid(net(x))
        bce = lf.cross_entropy_loss(out, g, bce=True, background_weight=0)
        _, gd, tw, fd = lf.classification_dice_loss(out, g, factor=10,
                                                    background_weight=0)
        loss = bce + gd + tw + fd
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    return 1000 * (time.perf_counter() - t0) / STEPS


def jax_cpu_step_ms():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    model = build_model("deeplabv3plus", num_classes=ORGANS)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=False)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
    }
    g3 = jnp.ones(3, jnp.float32)
    j2 = jnp.ones(2, jnp.float32)
    holder = {"s": state}

    def run(i):
        holder["s"], m = step(holder["s"], batch, jax.random.PRNGKey(i), 0.3, g3, 3e-4, j2)
        return m

    m = run(0)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        m = run(1 + i)
    float(m["loss"])
    return 1000 * (time.perf_counter() - t0) / STEPS


if __name__ == "__main__":
    tm = torch_step_ms()
    print(json.dumps({"name": "torch_reference_cpu_step", "ms": round(tm, 1),
                      "batch": BATCH, "img_per_sec": round(BATCH * 1000 / tm, 2)}),
          flush=True)
    jm = jax_cpu_step_ms()
    print(json.dumps({"name": "jax_framework_cpu_step", "ms": round(jm, 1),
                      "batch": BATCH, "img_per_sec": round(BATCH * 1000 / jm, 2),
                      "jax_over_torch_cpu": round(tm / jm, 3)}), flush=True)
