"""Model-zoo train-step throughput on the real chip.

bench.py measures only the flagship; this sweeps the other trained/usable
zoo configurations with the same methodology (full jitted step: device
augmentation + fwd/bwd + 7-loss tuple + Adam, batch 128 @ 256px bf16,
device->host scalar fetch per timing — block_until_ready lies on axon).

Run: python experiments/zoo_bench.py [steps]
Appends one JSON line per model to /tmp/zoo_bench.jsonl and prints them.
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
BATCH = 128

CONFIGS = [
    # (label, build kwargs, train-step kwargs)
    ("deeplabv3plus+fused_head", dict(name="deeplabv3plus", upsample_head=False),
     dict(lowres_head=True)),
    ("deeplabv3plus_depthwise", dict(name="deeplabv3plus_depthwise"), {}),
    ("unet_resnet34", dict(name="unet"), {}),
    ("vgg19bn_unet", dict(name="vgg_unet"), {}),
    ("efficientnet_v2s_unet", dict(name="efficientnet_v2s_unet"), {}),
]


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

    only = _os.environ.get("ZOO_ONLY")
    for label, bkw, skw in CONFIGS:
        if only and only not in label:
            continue
        model = build_model(num_classes=ORGANS, **bkw)
        tx = make_optimizer(3e-4)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
        step = make_train_step(model, tx, augment=True, **skw)
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
            row = {"model": label, "img_per_sec": round(BATCH / dt, 1),
                   "step_ms": round(dt * 1000, 2), "batch": BATCH, "img": IMG}
        except Exception as e:  # keep sweeping
            row = {"model": label, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row), flush=True)
        with open("/tmp/zoo_bench.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
