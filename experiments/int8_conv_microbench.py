"""Go/no-go for int8 PTQ serving: is XLA's int8 conv lowering on this v5e
actually faster than bf16?

v5e peak is 394.7 int8 TOPS vs 197 bf16 TFLOP/s (2x), but only if the
lowering hits the MXU's int8 mode.  Times the serving path's representative
conv shapes (resnet34 encoder @ 256px batch 128 + the decoder pointwise
fuse) three ways:

  bf16:  bf16 x bf16 -> bf16 (today's serving path)
  int8:  int8 x int8 -> int32, then the realistic requant epilogue
         (per-channel f32 scale, clip, cast back to int8)
  int8_raw: int8 conv alone (no epilogue) — isolates the conv cost

Training int8 measured neutral-or-worse (RESULTS round 2); this is the
inference half ROADMAP lists as untested.

Run: python experiments/int8_conv_microbench.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import time

# (name, (B, H, W, Cin), kernel hw, Cout, dilation)
SHAPES = [
    ("layer1_3x3", (128, 64, 64, 64), 3, 64, 1),
    ("layer2_3x3", (128, 32, 32, 128), 3, 128, 1),
    ("layer3_3x3", (128, 16, 16, 256), 3, 256, 1),
    ("layer4_3x3_d2", (128, 16, 16, 512), 3, 512, 2),
    ("fuse_1x1", (128, 64, 64, 304), 1, 256, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.RandomState(0)

    def timeit(fn, *args, steps=20, warmup=3):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        float(out)  # force host fetch — block_until_ready lies on axon
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(out)
        return (time.perf_counter() - t0) / steps * 1000.0

    for name, ishape, khw, cout, dil in SHAPES:
        cin = ishape[-1]
        x_f = rng.rand(*ishape).astype(np.float32) * 2 - 1
        k_f = rng.rand(khw, khw, cin, cout).astype(np.float32) * 2 - 1
        x_bf = jnp.asarray(x_f, jnp.bfloat16)
        k_bf = jnp.asarray(k_f, jnp.bfloat16)
        x_i8 = jnp.asarray(np.clip(x_f * 127, -127, 127).astype(np.int8))
        k_i8 = jnp.asarray(np.clip(k_f * 127, -127, 127).astype(np.int8))
        scale = jnp.asarray(rng.rand(cout).astype(np.float32) * 1e-4)
        pad = "SAME"
        d = (dil, dil)

        @jax.jit
        def f_bf16(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), pad, rhs_dilation=d, dimension_numbers=dn)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def f_i8_raw(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), pad, rhs_dilation=d, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.sum(y).astype(jnp.float32)

        @jax.jit
        def f_i8(x, k, s):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), pad, rhs_dilation=d, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) * s), -127, 127
                          ).astype(jnp.int8)
            return jnp.sum(yq.astype(jnp.float32))

        row = {"shape": name,
               "bf16_ms": round(timeit(f_bf16, x_bf, k_bf), 3),
               "int8_raw_ms": round(timeit(f_i8_raw, x_i8, k_i8), 3),
               "int8_requant_ms": round(timeit(f_i8, x_i8, k_i8, scale), 3)}
        row["speedup_raw"] = round(row["bf16_ms"] / row["int8_raw_ms"], 2)
        row["speedup_requant"] = round(row["bf16_ms"] / row["int8_requant_ms"], 2)
        print(json.dumps(row), flush=True)
        with open("/tmp/int8_microbench.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
