"""A/B: VGG19-BN U-Net train step with and without per-stage remat.

The whole-region remat policy OOM'd HBM (RESULTS.md round 3); this measures
the per-stage form (models/vgg.py ``remat=True``): each encoder pool-stage
and each decoder block is its own remat region saving only tagged conv
outputs + dropout masks, so BN/activation intermediates drop out of the
residual set while the replay working set stays bounded.

Same methodology as experiments/zoo_bench.py (full jitted step,
device->host scalar fetch for timing).  Batch defaults to 128 @ 256px.

Run: python experiments/vgg_remat_bench.py [steps]
Env: VGG_REMAT_BATCH=N  override the batch size (default 128)
     VGG_REMAT_IMG=N    override the image size (default 256)
     VGG_REMAT_ONLY=0|1 run a single leg (0 = plain, 1 = remat)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import sys
import time

IMG = int(_os.environ.get("VGG_REMAT_IMG", "256"))
ORGANS = 3
BATCH = int(_os.environ.get("VGG_REMAT_BATCH", "128"))
ONLY = _os.environ.get("VGG_REMAT_ONLY")  # "0"/"1" to run a single leg


def main(steps=15, warmup=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
        "label": jnp.asarray(
            (rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
    }
    gates3 = jnp.ones((3,), jnp.float32)
    jitters = jnp.ones((2,), jnp.float32)

    if ONLY is None:
        legs = (False, True)
    elif ONLY in ("0", "1"):
        legs = (ONLY == "1",)
    else:
        raise SystemExit(f"VGG_REMAT_ONLY must be '0' or '1', got {ONLY!r}")
    for remat in legs:
        model = build_model("vgg_unet", num_classes=ORGANS, remat=remat)
        tx = make_optimizer(3e-4)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, IMG, IMG, 3), tx)
        step = make_train_step(model, tx, augment=True)
        try:
            for i in range(warmup):
                state, m = step(state, batch, jax.random.PRNGKey(i), 0.3,
                                gates3, 3e-4, jitters)
            float(m["loss"])
            t0 = time.perf_counter()
            for i in range(steps):
                state, m = step(state, batch, jax.random.PRNGKey(100 + i), 0.3,
                                gates3, 3e-4, jitters)
            float(m["loss"])
            dt = (time.perf_counter() - t0) / steps
            row = {"model": "vgg19bn_unet", "remat": remat,
                   "img_per_sec": round(BATCH / dt, 1),
                   "step_ms": round(dt * 1000, 2), "batch": BATCH, "img": IMG}
        except Exception as e:
            row = {"model": "vgg19bn_unet", "remat": remat,
                   "error": f"{type(e).__name__}: {e}"[:6000]}
        print(json.dumps(row), flush=True)
        with open("/tmp/vgg_remat_bench.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
