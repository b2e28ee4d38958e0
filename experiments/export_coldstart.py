"""Serving cold-start A/B: checkpoint load vs AOT export artifact.

Measures, in FRESH subprocesses (no shared jit caches), the wall time from
process start to the first served batch for:

  (a) ``Predictor.from_checkpoint`` — flax model build + trace + lower +
      XLA compile + first batch;
  (b) ``Predictor.from_exported``  — deserialize StableHLO + XLA compile +
      first batch (no model code, no tracing/lowering).

The artifact can't skip the backend compile, so the delta is the Python
tracing/lowering/model-construction share of cold-start.  Usage::

    python experiments/export_coldstart.py [img_size] [batch]

Writes the artifact to a temp dir; prints one summary line per variant.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16

SETUP = f"""
import time
t0 = time.perf_counter()
import numpy as np
import jax
if "{{platform}}":
    jax.config.update("jax_platforms", "{{platform}}")
x = np.random.RandomState(0).rand({BATCH}, {IMG}, {IMG}, 3).astype(np.float32)
"""

CKPT_BODY = SETUP + f"""
from ecologysemanticsegmentation_tpu.predict import Predictor
p = Predictor.from_checkpoint(
    r"{{ckpt}}", num_classes=3, model_name="deeplabv3plus",
    img_size={IMG}, batch_size={BATCH})
out = np.asarray(p(x))
print("COLDSTART from_checkpoint %.2f s (out %s)"
      % (time.perf_counter() - t0, out.shape))
"""

EXPORT_BODY = SETUP + f"""
from ecologysemanticsegmentation_tpu.predict import Predictor
q = Predictor.from_exported(r"{{art}}")
out = np.asarray(q(x))
print("COLDSTART from_exported  %.2f s (out %s)"
      % (time.perf_counter() - t0, out.shape))
"""


def main() -> None:
    platform = os.environ.get("COLDSTART_PLATFORM", "")
    tmp = tempfile.mkdtemp(prefix="export_coldstart_")
    ckpt = os.path.join(tmp, "m_epoch1.ckpt")
    art = os.path.join(tmp, "serve.stablehlo")

    # Build the checkpoint + artifact once (not timed).
    prep = SETUP.format(platform=platform) + f"""
from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state, make_optimizer, save_checkpoint)
from ecologysemanticsegmentation_tpu.predict import Predictor
model = build_model("deeplabv3plus", num_classes=3)
state = create_train_state(model, jax.random.PRNGKey(0),
                           (1, {IMG}, {IMG}, 3), make_optimizer())
save_checkpoint(r"{tmp}", "m", 1, state)
Predictor(model, state, img_size={IMG}, batch_size={BATCH}).export_compiled(r"{art}")
print("prepared", r"{ckpt}", r"{art}")
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]))
    for label, code in [
        ("prep", prep),
        ("ckpt", CKPT_BODY.format(platform=platform, ckpt=ckpt)),
        ("export", EXPORT_BODY.format(platform=platform, art=art)),
    ]:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        tail = [l for l in r.stdout.splitlines() if l.strip()][-1:] or ["<no output>"]
        print(f"[{label}] {tail[0]}")
        if r.returncode != 0:
            print(r.stderr[-2000:])
            raise SystemExit(f"{label} failed rc={r.returncode}")
    size_mb = os.path.getsize(art) / 1e6
    print(f"artifact: {size_mb:.1f} MB")


if __name__ == "__main__":
    main()
