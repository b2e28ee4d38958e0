"""A/B: decoder pointwise contraction as dot_general vs 1x1 conv (layout copies).

hlo_stats attribution (round-3 profile, /tmp/profile_hlo_stats.json): the
step's two largest pure layout copies sit around the decoder ``fuse`` stage —

* ``copy.653``: bf16[128,64,256,64] {2,3,1,0}->{0,2,3,1} after
  ``convolution_convert_fusion.3`` (tf op ``convert_element_type``),
  0.85 ms/step;
* ``copy.654``: bf16[128,64,64,256] {3,0,2,1}->{0,3,2,1} feeding
  ``transpose(...)/fuse/pointwise/dot_general``, 0.81 ms/step.

Together ~1.67 ms of the 69.4 ms step (~2.4%).  Hypothesis: XLA assigns the
``dot_general`` in ``_PointwiseConv`` (models/common.py) a feature-major
layout its conv neighbors don't share; expressing the same contraction as a
1x1 ``conv_general_dilated`` keeps it inside the conv layout domain and the
copies vanish.  CAUTION from RESULTS round 3: isolated layout wins routinely
fail in context — this measures the FULL train step.

Run: python experiments/pointwise_layout_ab.py [steps]
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

IMG = 256
ORGANS = 3
BATCH = 128


def _make_conv1x1_class():
    """_PointwiseConv with the per-part contraction as a 1x1 conv (identical
    math and parameter layout; different XLA layout domain).  Defined as a
    proper subclass because flax's @compact marker is set at class creation."""
    from flax import linen as nn

    from ecologysemanticsegmentation_tpu.models import common

    class _PointwiseConv1x1(common._PointwiseConv):
        @nn.compact
        def __call__(self, x):
            parts = x if isinstance(x, (tuple, list)) else (x,)
            cin = sum(p.shape[-1] for p in parts)
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (1, 1, cin, self.features), jnp.float32,
            )
            out, off = None, 0
            for p in parts:
                pc = p.shape[-1]
                w = kernel[:, :, off:off + pc].astype(self.dtype)  # (1,1,pc,F)
                term = jax.lax.conv_general_dilated(
                    p.astype(self.dtype), w, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                out = term if out is None else out + term
                off += pc
            return out

    return _PointwiseConv1x1


def run(variant: str, steps: int, warmup: int = 3):
    from ecologysemanticsegmentation_tpu.models import common
    from ecologysemanticsegmentation_tpu.models import build_model
    from ecologysemanticsegmentation_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    orig = common._PointwiseConv
    if variant == "conv1x1":
        # SeparableConvBNAct looks _PointwiseConv up in the module globals at
        # call time; the param path comes from name="pointwise", so the
        # subclass swap is parameter-compatible.  The patch must stay active
        # through the first jitted CALL (trace time).
        common._PointwiseConv = _make_conv1x1_class()
    try:
        model = build_model("deeplabv3plus", num_classes=ORGANS,
                            encoder_name="resnet34", upsample_head=False)
        tx = make_optimizer(3e-4)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, IMG, IMG, 3), tx)
        step = make_train_step(model, tx, augment=True, lowres_head=True)
        rng = np.random.RandomState(0)
        batch = {
            "image": jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32),
            "label": jnp.asarray(
                (rng.rand(BATCH, IMG, IMG, ORGANS) > 0.5).astype(np.float32)),
        }
        gates3 = jnp.ones((3,), jnp.float32)
        jitters = jnp.ones((2,), jnp.float32)
        for i in range(warmup):
            state, m = step(state, batch, jax.random.PRNGKey(i), 0.3,
                            gates3, 3e-4, jitters)
        float(m["loss"])  # patch must stay active through the first call
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, batch, jax.random.PRNGKey(100 + i), 0.3,
                            gates3, 3e-4, jitters)
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / steps
        row = {"variant": variant, "img_per_sec": round(BATCH / dt, 1),
               "step_ms": round(dt * 1000, 2), "loss": round(loss, 5)}
    except Exception as e:
        row = {"variant": variant, "error": f"{type(e).__name__}: {e}"[:300]}
    finally:
        common._PointwiseConv = orig
    print(json.dumps(row), flush=True)
    with open("/tmp/pointwise_layout_ab.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main(steps=15):
    a = run("dot_general", steps)
    b = run("conv1x1", steps)
    if "img_per_sec" in a and "img_per_sec" in b:
        print(f"delta: {b['step_ms'] - a['step_ms']:+.2f} ms "
              f"({b['img_per_sec'] - a['img_per_sec']:+.1f} img/s); "
              f"losses {a['loss']} vs {b['loss']}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
