"""Large-image training throughput (ROADMAP scaling item).

The flagship step at IMGSIZE 512 and 1024 on one v5e chip: 512 uses the
fused head-loss kernel's single-tile path, 1024 the row-blocked path
(ops/pallas/head_loss.py).  Batch scaled to keep the activation footprint
inside HBM.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/large_image_bench.py
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

ORGANS = 3
CASES = ((512, 32), (1024, 8))
# LIB_CASES=512 (comma list) restricts the sweep — the risky
# augmentation-on remote compile only needs the 512px case.
_sel = os.environ.get("LIB_CASES")
if _sel:
    keep = {int(x) for x in _sel.split(",") if x}
    CASES = tuple(c for c in CASES if c[0] in keep)
# The 512px augment=True remote compile was pathological (>60 min) until the
# HLO-constant fix (ops/resize.py iota-built operands); it now compiles in
# minutes and runs at 290 img/s (large_image_bench_augment.log).  Default
# stays augment=False so the sweep isolates the model + head-loss path;
# LIB_AUGMENT=1 measures the full step.
AUGMENT = bool(int(os.environ.get("LIB_AUGMENT", "0")))


def main():
    for img, batch in CASES:
        model = build_model("deeplabv3plus", num_classes=ORGANS,
                            encoder_name="resnet34", upsample_head=False)
        tx = make_optimizer(3e-4)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, img, img, 3), tx)
        step = make_train_step(model, tx, augment=AUGMENT, lowres_head=True)
        rng = np.random.RandomState(0)
        b = {
            "image": jnp.asarray(rng.rand(batch, img, img, 3), jnp.float32),
            "label": jnp.asarray(
                (rng.rand(batch, img, img, ORGANS) > 0.5).astype(np.float32)),
        }
        gates3 = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
        jitters = jnp.ones((2,), jnp.float32)
        try:
            for i in range(3):
                state, metrics = step(state, b, jax.random.PRNGKey(i), 0.3,
                                      gates3, jnp.float32(3e-4), jitters)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for i in range(10):
                state, metrics = step(state, b, jax.random.PRNGKey(10 + i), 0.3,
                                      gates3, jnp.float32(3e-4), jitters)
            float(metrics["loss"])
            ms = (time.perf_counter() - t0) * 100
            print(json.dumps({"name": f"train_{img}px", "batch": batch,
                              "step_ms": round(ms, 1),
                              "img_per_sec": round(batch * 1000 / ms, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"name": f"train_{img}px", "batch": batch,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
