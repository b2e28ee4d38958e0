"""Step-cost of AUGMENT_PER_SAMPLE=1 (reference per-sample granularity).

The quality A/B (aug_per_sample_ab.py) settled that batch-uniform parameters
cost nothing in Dice; this measures what the per-sample OPTION costs in
step time when a user turns it on (under vmap the batch-level lax.cond
gates become selects, so every step pays the crop/rotate/flip gathers).

Spawns one subprocess per variant (the flag is read at import time).

Run: python experiments/aug_per_sample_cost.py [steps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

CHILD = r"""
import json, sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, {repo!r})
from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state, make_optimizer, make_train_step)
from ecologysemanticsegmentation_tpu.data import augment as A

IMG, ORGANS, BATCH, STEPS = 256, 3, 128, {steps}
model = build_model("deeplabv3plus", num_classes=ORGANS,
                    encoder_name="resnet34", upsample_head=False)
tx = make_optimizer(3e-4)
state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
step = make_train_step(model, tx, augment=True, lowres_head=True)
rng = np.random.RandomState(0)
batch = {{"image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
          "label": jnp.asarray((rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5
                                ).astype(np.float32))}}
g3, jt = jnp.ones(3), jnp.ones(2)
for i in range(3):
    state, m = step(state, batch, jax.random.PRNGKey(i), 0.3, g3, 3e-4, jt)
float(m["loss"])
t0 = time.perf_counter()
for i in range(STEPS):
    state, m = step(state, batch, jax.random.PRNGKey(100 + i), 0.3, g3, 3e-4, jt)
float(m["loss"])
dt = (time.perf_counter() - t0) / STEPS
print(json.dumps({{"per_sample": A.PER_SAMPLE,
                   "img_per_sec": round(BATCH / dt, 1),
                   "step_ms": round(dt * 1000, 2)}}))
"""


def main(steps=15):
    for flag in ("0", "1"):
        env = dict(os.environ)
        env["AUGMENT_PER_SAMPLE"] = flag
        parts = [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        env["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(parts))
        code = CHILD.format(repo=REPO, steps=steps)
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=3000)
        line = (proc.stdout.strip().splitlines() or ["<no output>"])[-1]
        print(f"AUGMENT_PER_SAMPLE={flag}: {line}", flush=True)
        if proc.returncode != 0:
            print(proc.stderr[-1500:], flush=True)
        with open("/tmp/aug_per_sample_cost.jsonl", "a") as f:
            f.write(json.dumps({"flag": flag, "out": line}) + "\n")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
