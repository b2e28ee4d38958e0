"""Int8 PTQ quality check on TRAINED weights (not random init).

The serving A/B (int8_serving_ab.py) measures speed at 256px but its
random-init + randomized-batch-stats net saturates the sigmoid, so its
probability-space error readout is uninformative.  Here: train the flagship
on the synthetic fixture with the shipped bf16 train step (same protocol as
experiments/dice_parity.py variant B), then serve the test split through the
bf16 Predictor and the int8 Predictor and compare

* per-organ Dice (reference protocol: mean -dice_loss(probs, gt, bg=0)),
* probability-space |delta| stats on non-saturated trained outputs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/int8_quality.py
Writes experiments/int8_quality.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.data.synthetic import get_synthetic_data
from ecologysemanticsegmentation_tpu.losses import dice_score
from ecologysemanticsegmentation_tpu.models import DeepLabV3Plus
from ecologysemanticsegmentation_tpu.predict import Predictor
from ecologysemanticsegmentation_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from ecologysemanticsegmentation_tpu.train.schedules import (
    BackgroundWeightSchedule,
    cosine_annealing_warm_restarts,
    curriculum_gates,
)

ORGANS = ("whole_body", "ventral_side", "dorsal_side")
IMG, BATCH, N_TRAIN, N_TEST = 64, 8, 96, 24
EPOCHS = int(os.environ.get("Q_EPOCHS", 60))
BASE_LR = 3e-4


def stack(ds):
    imgs, masks = [], []
    for i in range(len(ds)):
        img, mask, _ = ds[i]
        imgs.append(img)
        masks.append(mask)
    return np.stack(imgs).astype(np.float32), np.stack(masks).astype(np.float32)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    xtr, ytr = stack(get_synthetic_data(img_shape=IMG, organs=ORGANS, num_samples=N_TRAIN, seed=0))
    xte, yte = stack(get_synthetic_data(img_shape=IMG, organs=ORGANS, num_samples=N_TEST, seed=11))

    model = DeepLabV3Plus(num_classes=len(ORGANS))
    tx = make_optimizer(BASE_LR)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, IMG, IMG, 3), tx)
    step = make_train_step(model, tx, augment=False)
    eval_step = make_eval_step(model)
    lr_at = cosine_annealing_warm_restarts(BASE_LR, t_0=100)
    bg_sched = BackgroundWeightSchedule(5000, seed=42)
    jitters = jnp.ones((2,), jnp.float32)
    perms = [np.random.RandomState(1234 + e).permutation(N_TRAIN) for e in range(EPOCHS)]

    t0 = time.time()
    for epoch in range(EPOCHS):
        gates = curriculum_gates(epoch)
        gates3 = jnp.asarray(
            [gates["focal_dice_w"], gates["bce_l_w"], gates["generalized_dice_w"]],
            jnp.float32)
        for si, s in enumerate(range(0, N_TRAIN - BATCH + 1, BATCH)):
            idx = perms[epoch][s : s + BATCH]
            state, _ = step(
                state, {"image": jnp.asarray(xtr[idx]), "label": jnp.asarray(ytr[idx])},
                jax.random.fold_in(jax.random.PRNGKey(99), epoch * 1000 + si),
                jnp.float32(bg_sched(epoch)), gates3, jnp.float32(lr_at(epoch)), jitters)
        if (epoch + 1) % 20 == 0:
            out = eval_step(state, {"image": jnp.asarray(xte[:BATCH]),
                                    "label": jnp.asarray(yte[:BATCH])})
            print(f"epoch {epoch+1}: dice={np.round(np.asarray(out['dice']), 4)} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---------------------------------------------------------------- serving
    calib = [xtr[i * BATCH : (i + 1) * BATCH] for i in range(2)]
    p_bf = Predictor(model, state, img_size=IMG, batch_size=BATCH)
    p_q = Predictor(model, state, img_size=IMG, batch_size=BATCH, int8=True,
                    calibration_images=calib)
    probs_bf = p_bf(xte)
    probs_q = p_q(xte)

    def organ_dice(probs):
        scores, nb = np.zeros(len(ORGANS)), 0
        for s in range(0, N_TEST, BATCH):
            scores += np.asarray(dice_score(jnp.asarray(probs[s : s + BATCH]),
                                            jnp.asarray(yte[s : s + BATCH])))
            nb += 1
        return (scores / nb).tolist()

    d = np.abs(probs_q - probs_bf)
    row = {
        "epochs": EPOCHS, "img": IMG, "n_quantized": p_q.n_quantized,
        "dice_bf16": organ_dice(probs_bf), "dice_int8": organ_dice(probs_q),
        "prob_err_max": round(float(d.max()), 5),
        "prob_err_mean": round(float(d.mean()), 6),
    }
    row["dice_delta_max"] = round(
        float(np.abs(np.array(row["dice_bf16"]) - np.array(row["dice_int8"])).max()), 5)
    print(json.dumps(row), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "int8_quality.json"), "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
