"""Attack the decoder's align_corners=True x4 upsample (~1.7 ms of layout ops).

Profile (RESULTS round 3, hlo_stats): the einsum-pair lowering of
`resize_bilinear(..., align_corners=True)` at deeplabv3plus.py:106 books a
~854 us fwd convert_element_type copy (resize.py:129) and a ~866 us bwd
`pw,nowc->nopc` transpose fusion (resize.py:126).  align_corners=True is NOT
shift-invariant, so the `_upsample_convt` FIR path cannot cover it.

Candidates measured here on the call-site shape (batch 128, 16x16 -> 64x64,
C=256, bf16), fwd and fwd+bwd:

  A einsum_pair       — shipped path (f32 accum + astype)
  B einsum_pair_bf16  — same contractions, bf16 result type (no convert pass)
  C combined_dense    — ONE dot: y = M @ x with M = kron(Mh, Mw) (4096 x 256)
                        baked constant; reshapes collapse adjacent row-major
                        dims so no layout moves; bwd is one M^T dot.
  D combined_dense_bf16 — C with M pre-cast to bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/resize_ac_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ecologysemanticsegmentation_tpu.ops.resize import _interp_matrix, resize_bilinear

B, H, W, C, OH, OW = 128, 16, 16, 256, 64, 64


def timeit(fn, *args, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / steps * 1000.0


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    mh = _interp_matrix(OH, H, True)
    mw = _interp_matrix(OW, W, True)
    m_comb = np.einsum("oh,pw->ophw", mh, mw).reshape(OH * OW, H * W)
    m32 = jnp.asarray(m_comb)
    m16 = jnp.asarray(m_comb, jnp.bfloat16)

    def fa(x):
        return resize_bilinear(x, (OH, OW), align_corners=True)

    def fb(x):
        y = jnp.einsum("oh,nhwc->nowc", jnp.asarray(mh, jnp.bfloat16), x)
        return jnp.einsum("pw,nowc->nopc", jnp.asarray(mw, jnp.bfloat16), y)

    def fc(x):
        y = jnp.einsum("qk,nkc->nqc", m32, x.reshape(B, H * W, C),
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(B, OH, OW, C)

    def fd(x):
        y = jnp.einsum("qk,nkc->nqc", m16, x.reshape(B, H * W, C))
        return y.reshape(B, OH, OW, C)

    ref = np.asarray(fa(x), np.float32)
    for name, f in (("einsum_pair", fa), ("einsum_pair_bf16", fb),
                    ("combined_dense", fc), ("combined_dense_bf16", fd)):
        fwd = jax.jit(lambda x, f=f: jnp.sum(f(x).astype(jnp.float32)))
        fwdbwd = jax.jit(jax.grad(
            lambda x, f=f: jnp.sum(f(x).astype(jnp.float32) ** 2)))

        t_f = timeit(fwd, x)
        t_fb = timeit(lambda x: jnp.sum(fwdbwd(x).astype(jnp.float32)), x)
        err = float(np.abs(np.asarray(f(x), np.float32) - ref).max())
        row = {"name": name, "fwd_ms": round(t_f, 3),
               "fwdbwd_ms": round(t_fb, 3), "max_abs_vs_shipped": round(err, 6)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
