"""Floor-free int8-vs-bf16 conv rate measurement.

v1 (int8_conv_microbench.py) was dispatch-floor-bound below ~1.5 ms/call,
masking everything but layer4.  Here each timed call runs a chain of K=8
convs inside one jit (output requantized and fed back in), so per-conv cost
is (call_ms - floor)/8 and the floor contribution is ~2%.

Run: python experiments/int8_conv_microbench2.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import time

K = 8
# (name, (B, H, W, C), kernel hw, dilation) — square in/out channels so the
# chain feeds back; covers the serving path's conv population.
SHAPES = [
    ("layer1_3x3_64", (128, 64, 64, 64), 3, 1),
    ("layer2_3x3_128", (128, 32, 32, 128), 3, 1),
    ("layer3_3x3_256", (128, 16, 16, 256), 3, 1),
    ("layer4_3x3_512_d2", (128, 16, 16, 512), 3, 2),
    ("pw_1x1_256", (128, 64, 64, 256), 1, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.RandomState(0)

    def timeit(fn, *args, steps=10, warmup=3):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        float(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(out)
        return (time.perf_counter() - t0) / steps * 1000.0

    for name, ishape, khw, dil in SHAPES:
        c = ishape[-1]
        x_f = rng.rand(*ishape).astype(np.float32) * 2 - 1
        k_f = (rng.rand(khw, khw, c, c).astype(np.float32) * 2 - 1) / c
        x_bf = jnp.asarray(x_f, jnp.bfloat16)
        k_bf = jnp.asarray(k_f, jnp.bfloat16)
        x_i8 = jnp.asarray(np.clip(x_f * 127, -127, 127).astype(np.int8))
        k_i8 = jnp.asarray(np.clip(k_f * c * 127, -127, 127).astype(np.int8))
        scale = jnp.full((c,), 1.0 / (127.0 * 8 * c), jnp.float32)
        d = (dil, dil)

        @jax.jit
        def f_bf16(x, k):
            def body(_, y):
                return jax.lax.conv_general_dilated(
                    y, k, (1, 1), "SAME", rhs_dilation=d, dimension_numbers=dn)
            y = jax.lax.fori_loop(0, K, body, x)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def f_i8(x, k, s):
            def body(_, y):
                y32 = jax.lax.conv_general_dilated(
                    y, k, (1, 1), "SAME", rhs_dilation=d, dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return jnp.clip(jnp.round(y32.astype(jnp.float32) * s),
                                -127, 127).astype(jnp.int8)
            y = jax.lax.fori_loop(0, K, body, x)
            return jnp.sum(y.astype(jnp.float32))

        t_bf = timeit(f_bf16, x_bf, k_bf)
        t_i8 = timeit(f_i8, x_i8, k_i8, scale)
        row = {"shape": name, "K": K,
               "bf16_ms_per_conv": round(t_bf / K, 3),
               "int8_requant_ms_per_conv": round(t_i8 / K, 3),
               "speedup": round(t_bf / t_i8, 2)}
        print(json.dumps(row), flush=True)
        with open("/tmp/int8_microbench2.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
