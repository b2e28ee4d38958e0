"""A/B: batch-uniform vs per-sample augmentation parameters (VERDICT r2 #5).

The shipped pipeline draws geometric parameters, warp gates and OneOf branch
choices once per BATCH (data/augment.py performance design); the reference
draws them per SAMPLE.  Per-op math parity is tested
(tests/test_augment_parity.py) — this experiment quantifies the remaining
question: does the within-batch correlation of augmentation noise change
what the model LEARNS?

Method: train the flagship on the synthetic fixture twice from identical
weights/data/seeds, differing ONLY in parameter granularity:
  A: shipped augment_batch (batch-uniform),
  B: augment_batch vmapped over singleton batches with per-sample keys —
     identical op math, per-sample parameters (lax.cond/switch become
     multi-branch selects under vmap; semantics unchanged).
Scored with the reference Dice protocol at several epochs, over N_SEEDS
seed replicates.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/aug_per_sample_ab.py
Appends to experiments/aug_per_sample_ab.json.
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

from ecologysemanticsegmentation_tpu.data.augment import augment_batch
from ecologysemanticsegmentation_tpu.data.synthetic import get_synthetic_data
from ecologysemanticsegmentation_tpu.models import build_model
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from ecologysemanticsegmentation_tpu.train import trainer as trainer_mod
from ecologysemanticsegmentation_tpu.train.schedules import (
    cosine_annealing_warm_restarts,
    curriculum_gates,
)

ORGANS = ("whole_body", "ventral_side", "dorsal_side")
IMG = 64
BATCH = 8
N_TRAIN = 96
N_TEST = 24
EPOCHS = int(os.environ.get("AB_EPOCHS", 60))
N_SEEDS = int(os.environ.get("AB_SEEDS", 2))
EVAL_EVERY = 20
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "aug_per_sample_ab.json")


def augment_per_sample(rng, images, labels):
    """The shipped pipeline with PER-SAMPLE parameters: vmap over singleton
    batches, one fresh key per sample."""
    keys = jax.random.split(rng, images.shape[0])

    def one(k, im, lb):
        im2, lb2 = augment_batch(k, im[None], lb[None])
        return im2[0], lb2[0]

    return jax.vmap(one)(keys, images, labels)


def build_data(seed):
    def stack(ds, n):
        xs, ys = [], []
        for i in range(n):
            img, mask, _ = ds[i]
            xs.append(img)
            ys.append(mask)
        return (np.stack(xs).astype(np.float32), np.stack(ys).astype(np.float32))

    tr = get_synthetic_data(img_shape=IMG, organs=ORGANS, num_samples=N_TRAIN,
                            seed=seed)
    te = get_synthetic_data(img_shape=IMG, organs=ORGANS, num_samples=N_TEST,
                            seed=11 + seed)
    return stack(tr, N_TRAIN), stack(te, N_TEST)


def run(variant: str, seed: int):
    (xtr, ytr), (xte, yte) = build_data(seed)
    model = build_model("deeplabv3plus", num_classes=len(ORGANS))
    tx = make_optimizer(3e-4)
    state = create_train_state(model, jax.random.PRNGKey(3 + seed),
                               (1, IMG, IMG, 3), tx)
    # NOTE: the patch must stay active until after the first step CALL —
    # jit traces the body (and thus reads the augment symbol) at first
    # invocation, not at make_train_step time.
    orig = trainer_mod.augment_batch
    if variant == "per_sample":
        trainer_mod.augment_batch = augment_per_sample
    step = make_train_step(model, tx, augment=True)
    eval_step = make_eval_step(model)
    lr_at = cosine_annealing_warm_restarts(3e-4, t_0=100)
    perms = [np.random.RandomState(1234 + seed + e).permutation(N_TRAIN)
             for e in range(EPOCHS)]
    jitters = jnp.ones((2,), jnp.float32)
    history = {}
    t0 = time.time()
    for epoch in range(EPOCHS):
        g = curriculum_gates(epoch)
        gates3 = jnp.asarray([g["focal_dice_w"], g["bce_l_w"],
                              g["generalized_dice_w"]], jnp.float32)
        for si, s in enumerate(range(0, N_TRAIN - BATCH + 1, BATCH)):
            idx = perms[epoch][s:s + BATCH]
            batch = {"image": jnp.asarray(xtr[idx]), "label": jnp.asarray(ytr[idx])}
            state, _ = step(
                state, batch,
                jax.random.fold_in(jax.random.PRNGKey(99 + seed), epoch * 1000 + si),
                jnp.float32(0.0), gates3, jnp.float32(lr_at(epoch)), jitters,
            )
        if (epoch + 1) % EVAL_EVERY == 0 or epoch == EPOCHS - 1:
            scores, nb = np.zeros(len(ORGANS)), 0
            for s in range(0, N_TEST, BATCH):
                out = eval_step(state, {"image": jnp.asarray(xte[s:s + BATCH]),
                                        "label": jnp.asarray(yte[s:s + BATCH])})
                scores += np.asarray(out["dice"])
                nb += 1
            history[epoch + 1] = (scores / nb).tolist()
            print(f"[{variant} seed{seed}] epoch {epoch+1}: "
                  f"dice={np.round(scores / nb, 4)} ({time.time()-t0:.0f}s)",
                  flush=True)
    trainer_mod.augment_batch = orig
    return history


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {"config": {"img": IMG, "batch": BATCH, "epochs": EPOCHS,
                          "n_train": N_TRAIN, "n_test": N_TEST,
                          "organs": ORGANS, "n_seeds": N_SEEDS}}
    for seed in range(N_SEEDS):
        for variant in ("batch_uniform", "per_sample"):
            results[f"{variant}_seed{seed}"] = run(variant, seed)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)

    print("\n=== final-epoch whole_body Dice ===")
    deltas = []
    for seed in range(N_SEEDS):
        a = results[f"batch_uniform_seed{seed}"][EPOCHS]
        b = results[f"per_sample_seed{seed}"][EPOCHS]
        deltas.append(b[0] - a[0])
        print(f"seed {seed}: batch_uniform {a[0]:.4f}  per_sample {b[0]:.4f}  "
              f"delta {b[0]-a[0]:+.4f}  (all organs delta "
              f"{np.round(np.subtract(b, a), 4)})")
    print(f"mean whole_body delta (per_sample - batch_uniform): "
          f"{np.mean(deltas):+.4f}")


if __name__ == "__main__":
    main()
