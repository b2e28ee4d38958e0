"""Serving A/B: BN folded into conv kernels vs live eval-mode BN (VERDICT #6).

Measures the jitted bf16 sigmoid forward (the Predictor/serving path,
batch 128 @ 256px) with and without models.fold_bn applied to the state,
plus the serving step's roofline position (fwd FLOPs at the v5e MXU peak).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/serving_fold_ab.py
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np
from ecologysemanticsegmentation_tpu.models import build_model, fold_batchnorm
from ecologysemanticsegmentation_tpu.train import create_train_state, make_forward, make_optimizer

IMG, ORGANS, BATCH = 256, 3, 128
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_perf.jsonl")

def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")

model = build_model("deeplabv3plus", num_classes=ORGANS, encoder_name="resnet34")
state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), make_optimizer())
# non-trivial stats so the fold isn't an identity
rng = np.random.RandomState(0)
state = state.replace(batch_stats=jax.tree_util.tree_map(
    lambda x: jnp.asarray(0.5 + 0.5 * rng.rand(*x.shape), jnp.float32),
    state.batch_stats))
forward = make_forward(model)
x = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32)

def bench(st, tag):
    for _ in range(3):
        out = forward(st, x)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(30):
        out = forward(st, x)
    float(out[0, 0, 0, 0])
    ms = 1000 * (time.perf_counter() - t0) / 30
    record({"name": tag, "ms": round(ms, 2), "batch": BATCH,
            "img_per_sec": round(BATCH * 1000 / ms, 1)})

bench(state, "serving_bn_live")
p, bs, n = fold_batchnorm(state.params, state.batch_stats)
state2 = state.replace(params=jax.tree_util.tree_map(jnp.asarray, p),
                       batch_stats=jax.tree_util.tree_map(jnp.asarray, bs))
print(f"folded {n} BNs", flush=True)
bench(state2, "serving_bn_folded")

# (c) folded state BAKED as compile-time constants: the real question is
# whether removing the BN affine from the PROGRAM helps — with the state as
# a jit argument the program is identical whether folded or not (fold only
# changes values), so any fold win must come from constant-baking, which
# also lets XLA pre-layout the weights (frozen-weights serving mode).
@jax.jit
def forward_baked(images):
    out = model.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats},
        images.astype(jnp.bfloat16), train=False,
    )
    return jax.nn.sigmoid(out.astype(jnp.float32))

for _ in range(3):
    out = forward_baked(x)
float(out[0, 0, 0, 0])
t0 = time.perf_counter()
for _ in range(30):
    out = forward_baked(x)
float(out[0, 0, 0, 0])
ms = 1000 * (time.perf_counter() - t0) / 30
record({"name": "serving_bn_folded_baked_consts", "ms": round(ms, 2),
        "batch": BATCH, "img_per_sec": round(BATCH * 1000 / ms, 1)})
