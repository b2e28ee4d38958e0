"""Maxpool-backward experiment: XLA lowers the gradient of reduce_window_max
through select_and_scatter (measured 1.1 ms/step in the train-step profile,
509 GB/s — sequential window scan).  Candidate: an equality-mask backward —
dx[p] = sum_k 1{x[p] == y[w(p,k)]} * dy[w]/nties[w] — which is pure fused
elementwise work over dilated-pad up-grids (no scatter).

Ties: select_and_scatter routes the gradient to the FIRST max of each window;
the mask form splits it evenly among tied maxima (both are valid subgradients
and conserve gradient mass; ties are common at ReLU zeros).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/maxpool_bwd.py
"""

from __future__ import annotations

import json
import sys
import time


def mp_fwd(x):
    import flax.linen as nn
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def mp_bwd_mask(x, y, dy):
    """Equality-mask backward for 3x3/stride-2/pad-1 max pooling (NHWC)."""
    import jax.numpy as jnp
    from jax import lax

    b, h, w, c = x.shape
    oh, ow = y.shape[1:3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)

    # nties[w] = #window positions equal to the max
    nt = None
    for ky in range(3):
        for kx in range(3):
            piece = lax.slice(xp, (0, ky, kx, 0),
                              (b, ky + 2 * oh - 1, kx + 2 * ow - 1, c),
                              (1, 2, 2, 1))
            eq = (piece == y).astype(dy.dtype)
            nt = eq if nt is None else nt + eq
    val = dy / nt

    # dilated-pad window quantities onto the padded-input grid (index 2w+k)
    def up(a):
        # dilated pad to the (h+2, w+2) padded-input grid: window w at index 2w
        return lax.pad(a, jnp.asarray(0, a.dtype),
                       ((0, 0, 0), (0, h + 3 - 2 * oh, 1),
                        (0, w + 3 - 2 * ow, 1), (0, 0, 0)))

    yu = up(y)
    vu = up(jnp.ones_like(y))
    du = up(val)

    dx = None
    for ky in range(3):
        for kx in range(3):
            # window value seen by padded-input position q at tap (ky,kx)
            # lives at up-grid index q - k; shift by -k with leading zeros
            sl = lambda a: jnp.pad(
                a[:, : h + 2 - ky, : w + 2 - kx, :],
                ((0, 0), (ky, 0), (kx, 0), (0, 0)))
            term = (xp == sl(yu)).astype(dy.dtype) * sl(vu) * sl(du)
            dx = term if dx is None else dx + term
    return dx[:, 1 : h + 1, 1 : w + 1, :]


def main(batch=128, h=128, c=64, steps=15, warmup=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    x = jnp.asarray(np.maximum(rng.randn(batch, h, h, c), 0), jnp.bfloat16)
    dy = jnp.asarray(rng.randn(batch, h // 2, h // 2, c), jnp.bfloat16)

    # correctness vs select_and_scatter (up to tie-splitting differences):
    # compare against f32 VJP on tie-free data
    xf = jnp.asarray(rng.rand(4, 16, 16, 8) , jnp.float32)  # continuous: no ties
    dyf = jnp.asarray(rng.randn(4, 8, 8, 8), jnp.float32)
    y_, vjp = jax.vjp(mp_fwd, xf)
    (dx_ref,) = vjp(dyf)
    dx_mask = mp_bwd_mask(xf, y_, dyf)
    err = float(jnp.max(jnp.abs(dx_ref - dx_mask)))
    print(json.dumps({"tie_free_max_err": err}))

    def timeit(fn, *args):
        for _ in range(warmup):
            out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        return round((time.perf_counter() - t0) / steps * 1000.0, 3)

    f_ref = jax.jit(lambda x, dy: jax.vjp(mp_fwd, x)[1](dy)[0].sum())
    def masked(x, dy):
        y = mp_fwd(x)
        return mp_bwd_mask(x, y, dy).sum()
    f_mask = jax.jit(masked)

    res = {
        "select_and_scatter_ms": timeit(f_ref, x, dy),
        "mask_bwd_ms": timeit(f_mask, x, dy),
    }
    print(json.dumps(res))
    with open("/tmp/maxpool_bwd.json", "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
