"""Space-to-depth stem experiment: exact re-parameterization of the ResNet
7x7/stride-2 stem conv as a 4x4/stride-1 conv on 2x2-space-to-depth input.

The 3-channel 7x7/2 conv is MXU-hostile (contraction dim 7*7*3 with cin=3
padded to lane width).  Zero-padding the kernel to 8x8 (one extra row/col on
the LEFT) and shifting the input padding by +1 makes every output tap align
to one 2x2 input cell, so the conv factors EXACTLY through space-to-depth:

    y = conv7x7_s2(pad(x, 3), K7)
      = conv4x4_s1(s2d2(pad(x, (4,4))), K8.reshape(4,2,4,2,3,F)
                                           .transpose(0,2,1,3,4,5)
                                           .reshape(4,4,12,F))[:, :H/2, :W/2]

(derivation: output o reads input i = 2o-4+k for the padded kernel index
k in [0,8); writing i = 2m+r gives m = o-2+t, r = k%2 for BOTH parities —
a clean 4-tap window on the s2d grid.)

Measures fwd and fwd+bwd step time of stem-only and reports max|delta|.
Run on the TPU:  python experiments/stem_s2d.py [batch]
"""

from __future__ import annotations

import json
import sys
import time


def s2d_stem(x, k7):
    """Exact s2d form of conv7x7/2(pad 3) for NHWC x and HWIO k7 (7,7,3,F)."""
    import jax.numpy as jnp
    from jax import lax

    b, h, w, c = x.shape
    f = k7.shape[-1]
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k_s2d = (
        k8.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, f)
    )
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    hs, ws = (h + 8) // 2, (w + 8) // 2
    xs = xp.reshape(b, hs, 2, ws, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hs, ws, 4 * c)
    y = lax.conv_general_dilated(
        xs, k_s2d, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y[:, : h // 2, : w // 2, :]


def main(batch=128, img=256, steps=15, warmup=3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, img, img, 3), jnp.bfloat16)
    k7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)

    def ref_stem(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ya = jax.jit(ref_stem)(x, k7).astype(jnp.float32)
    yb = jax.jit(s2d_stem)(x, k7).astype(jnp.float32)
    delta = float(jnp.max(jnp.abs(ya - yb)))
    rel = delta / float(jnp.max(jnp.abs(ya)))
    print(json.dumps({"max_abs_delta": delta, "max_rel": rel}))

    def timeit(fn, *args):
        for _ in range(warmup):
            out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        return round((time.perf_counter() - t0) / steps * 1000.0, 3)

    results = {"batch": batch}
    results["fwd_7x7_ms"] = timeit(jax.jit(lambda x, k: ref_stem(x, k).sum()), x, k7)
    results["fwd_s2d_ms"] = timeit(jax.jit(lambda x, k: s2d_stem(x, k).sum()), x, k7)

    def grad_of(stem):
        def loss(k, x):
            return stem(x, k).sum().astype(jnp.float32)
        return jax.jit(lambda k, x: jax.grad(loss)(k, x).sum())

    results["fwdbwd_7x7_ms"] = timeit(grad_of(ref_stem), k7, x)
    results["fwdbwd_s2d_ms"] = timeit(grad_of(s2d_stem), k7, x)
    print(json.dumps(results))
    with open("/tmp/stem_s2d.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
