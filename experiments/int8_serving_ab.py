"""Serving A/B: bf16 baked-consts forward vs int8 PTQ forward (quant.py).

Mirrors the shipped Predictor path exactly: BN folded into conv kernels,
weights baked as compile-time constants, sigmoid epilogue — then the same
with the calibrated int8 interceptor (per-channel int8 weights x per-tensor
int8 activations on the MXU double-rate path).  Batch 128 @ 256px, flagship
DeepLabV3+/resnet34.  Also records the probability-space quantization error
on the bench batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/int8_serving_ab.py
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np
from ecologysemanticsegmentation_tpu.models import build_model, fold_batchnorm
from ecologysemanticsegmentation_tpu.train import create_train_state, make_optimizer
from ecologysemanticsegmentation_tpu.quant import quantize_for_serving

IMG, ORGANS, BATCH = 256, 3, 128
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r3_perf.jsonl")

def record(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")

model = build_model("deeplabv3plus", num_classes=ORGANS, encoder_name="resnet34")
state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), make_optimizer())
rng = np.random.RandomState(0)
state = state.replace(batch_stats=jax.tree_util.tree_map(
    lambda x: jnp.asarray(0.5 + 0.5 * rng.rand(*x.shape), jnp.float32),
    state.batch_stats))
p, bs, n = fold_batchnorm(state.params, state.batch_stats)
print(f"folded {n} BNs", flush=True)
variables = {"params": jax.tree_util.tree_map(jnp.asarray, p),
             "batch_stats": jax.tree_util.tree_map(jnp.asarray, bs)}
x = jnp.asarray(rng.rand(BATCH, IMG, IMG, 3), jnp.float32)

def bench(fn, tag):
    for _ in range(3):
        out = fn(x)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(30):
        out = fn(x)
    float(out[0, 0, 0, 0])
    ms = 1000 * (time.perf_counter() - t0) / 30
    record({"name": tag, "ms": round(ms, 2), "batch": BATCH,
            "img_per_sec": round(BATCH * 1000 / ms, 1)})
    return out

@jax.jit
def forward_bf16(images):
    out = model.apply(variables, images.astype(jnp.bfloat16), train=False)
    return jax.nn.sigmoid(out.astype(jnp.float32))

probs_bf = bench(forward_bf16, "serving_bf16_baked")

qfn, n_q = quantize_for_serving(model, variables, [x.astype(jnp.bfloat16)])
print(f"quantized {n_q} convs", flush=True)

@jax.jit
def forward_int8(images):
    return jax.nn.sigmoid(qfn(images.astype(jnp.bfloat16)).astype(jnp.float32))

probs_q = bench(forward_int8, "serving_int8_ptq")

d = np.abs(np.asarray(probs_q, np.float32) - np.asarray(probs_bf, np.float32))
record({"name": "serving_int8_prob_err", "n_quantized": n_q,
        "max_abs": round(float(d.max()), 5), "mean_abs": round(float(d.mean()), 6)})
