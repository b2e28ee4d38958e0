"""The VERDICT r3 #2 residual experiment: is the attributed non-model slack
(augmentation VPU + label prep + layout copies + relay gap) really the only
thing between 1,850 img/s and the claimed "~2,400 practically reachable"?

Three legs, each the bench.py shipped configuration (flagship DeepLabV3+
resnet34, lowres fused head-loss, batch 128 @ 256px, bf16) with pieces
removed:

1. ``full``      — the shipped step (device augmentation + label prep).
2. ``no_augment``— augment=False (label prep still in-step).
3. ``residual``  — augment=False AND ``_prepare_labels`` monkeypatched to
                   identity (labels fed PRE-prepared so the loss math is
                   unchanged): the step is purely model fwd/bwd + fused
                   head-loss + Adam + relay dispatch.

If leg 3 lands near 69.4 - (augment 5.5 + labels ~0.3) ~= 63.5 ms, the
augment+label share is exactly what the profile books, and the remaining
residual is components measured at their ceilings (encoder convs 70-88% MXU
== the Pallas-prototype shape ceiling; decoder fuse at 84% HBM peak;
optimizer fused).  Reaching 2,400 img/s (53.3 ms) would then require ~10 ms
out of THAT residual — i.e. the "~2,400" claim must be retracted.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_residual.py
Appends JSON lines to experiments/r4_residual.jsonl.
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
from ecologysemanticsegmentation_tpu.train import trainer as _trainer

IMG = 256
ORGANS = 3
BATCH = int(os.environ.get("R4_BATCH", 128))
STEPS = int(os.environ.get("R4_STEPS", 20))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r4_residual.jsonl")


def record(name, ms, extra=None):
    row = {"name": name, "ms": round(ms, 2), "batch": BATCH,
           "img_per_sec": round(BATCH * 1000 / ms, 1), **(extra or {})}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def run_leg(name, augment, identity_labels, batch):
    model = build_model("deeplabv3plus", num_classes=ORGANS,
                        encoder_name="resnet34", upsample_head=False)
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=augment, lowres_head=True)
    gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    saved = _trainer._prepare_labels
    if identity_labels:
        # The patch must stay in effect through the FIRST CALL (trace time).
        _trainer._prepare_labels = lambda labels: labels
    try:
        m = None
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i), 0.3,
                            gates3, 3e-4, jitters)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, m = step(state, batch, jax.random.PRNGKey(10 + i), 0.3,
                            gates3, 3e-4, jitters)
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / STEPS
    finally:
        _trainer._prepare_labels = saved
    record(name, dt * 1000, {"loss": round(loss, 4)})


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32)
    labels_raw = jnp.asarray(
        (rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32))
    batch = {"image": images, "label": labels_raw}
    # Pre-prepared labels for the residual leg: same math as _prepare_labels
    # so the in-step loss operands are comparable.
    prepared = _trainer._prepare_labels(labels_raw)
    batch_prepared = {"image": images, "label": prepared}

    legs = os.environ.get("R4_LEGS", "full,no_augment,residual").split(",")
    name = os.environ.get("R4_NAME", "")  # suffix for A/B rows
    if "full" in legs:
        run_leg("full" + name, augment=True, identity_labels=False, batch=batch)
    if "no_augment" in legs:
        run_leg("no_augment" + name, augment=False, identity_labels=False,
                batch=batch)
    if "residual" in legs:
        run_leg("residual" + name, augment=False, identity_labels=True,
                batch=batch_prepared)


if __name__ == "__main__":
    main()
