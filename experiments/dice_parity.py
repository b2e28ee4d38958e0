"""End-to-end Dice-parity experiment: JAX flagship vs the PyTorch reference.

Trains the SAME architecture (DeepLabV3+ resnet34, 3 organs) from IDENTICAL
initial weights on the SAME synthetic fixture batches with the reference's
EXECUTED loss code (loaded from /root/reference via tests/reference_oracle.py)
on the torch side and the framework's losses on the JAX side, then evaluates
both with the reference's Dice protocol
(test_multiclass.py:80-82: per-organ mean of -dice_loss(pred, gt, bg=0)).

Two variants:
  A ("exact"): f32 both sides, ASPP dropout 0 — matched trajectories; shows
    the loss/optimizer/model math is the same.
  B ("production"): the framework's real bf16 train step (make_train_step)
    vs the torch mirror with dropout 0.5 — shows the shipped path converges
    to equivalent Dice.

Protocol matched to the reference trainer (train_multiclass.py):
  union-set label transform (:110), sigmoid -> losses_fn(outputs, labels)
  with the per-organ recursion arg swap (:260-262), loss =
  focal_dice_w*fd + bce_l_w*bce + generalized_dice_w*(gd+tw) (:145),
  Adam lr 3e-4 (:362) with CosineAnnealingWarmRestarts(T_0=100) (:81),
  background-weight schedule over num_epochs=5000 (:50-72).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/dice_parity.py
Writes experiments/dice_parity_results.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
import torch

from ecologysemanticsegmentation_tpu.losses import (
    dice_score,
    return_union_sets_descending_order,
    seven_losses,
)
from ecologysemanticsegmentation_tpu.models import DeepLabV3Plus
from ecologysemanticsegmentation_tpu.data.synthetic import get_synthetic_data
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
from reference_oracle import load_reference_losses
from experiments.torch_mirror import TorchDeepLabV3Plus

ORGANS = ("whole_body", "ventral_side", "dorsal_side")
IMG = 64
BATCH = 8
N_TRAIN = 96
N_TEST = 24
EPOCHS = int(os.environ.get("PARITY_EPOCHS", 40))
# PARITY_SEED offsets every seed (data, init, perms) for robustness reruns
SEED = int(os.environ.get("PARITY_SEED", 0))
EVAL_EVERY = 10
BASE_LR = 3e-4


# ---------------------------------------------------------------- data
def build_data():
    def stack(ds):
        imgs, masks = [], []
        for i in range(len(ds)):
            img, mask, _ = ds[i]
            imgs.append(img)
            masks.append(mask)
        return np.stack(imgs).astype(np.float32), np.stack(masks).astype(np.float32)

    train = get_synthetic_data(img_shape=IMG, organs=ORGANS, num_samples=N_TRAIN, seed=SEED)
    test = get_synthetic_data(img_shape=IMG, organs=ORGANS, num_samples=N_TEST, seed=11 + SEED)
    xtr, ytr = stack(train)
    xte, yte = stack(test)
    # union-set training targets, precomputed once (reference applies the
    # transform per batch at train_multiclass.py:110; it is deterministic)
    ytr_union = np.asarray(return_union_sets_descending_order(jnp.asarray(ytr)))
    return xtr, ytr, ytr_union, xte, yte


def epoch_perms(epochs: int, n: int, seed: int | None = None):
    seed = 1234 + SEED if seed is None else seed
    rng = np.random.RandomState(seed)
    return [rng.permutation(n) for _ in range(epochs)]


# ---------------------------------------------------------------- torch side
def torch_losses_fn(lf, x, g, background_weight=0.0):
    """Reference losses_fn, executed path, tensor-returning
    (train_multiclass.py:253-275 incl. the recursion arg swap at :261)."""
    if g.shape[1] > 1:
        per = [
            torch_losses_fn(lf, g[:, i : i + 1], x[:, i : i + 1])
            for i in range(g.shape[1])
        ]
        return [sum(v) for v in zip(*per)]
    bce = lf.cross_entropy_loss(x, g, bce=True, background_weight=background_weight)
    ce = lf.cross_entropy_loss(x, g, bce=False, background_weight=background_weight)
    fl = lf.focal_loss(x, g, factor=1, background_weight=background_weight)
    d, gd, tw, fd = lf.classification_dice_loss(
        x, g, factor=10, background_weight=background_weight
    )
    return [ce, bce, fl, d, gd, tw, fd]


def eval_torch(lf, net, xte, yte):
    net.eval()
    scores = np.zeros(len(ORGANS))
    nb = 0
    with torch.no_grad():
        for s in range(0, len(xte), BATCH):
            x = torch.from_numpy(xte[s : s + BATCH].transpose(0, 3, 1, 2))
            g = torch.from_numpy(yte[s : s + BATCH].transpose(0, 3, 1, 2))
            p = torch.sigmoid(net(x))
            for o in range(len(ORGANS)):
                scores[o] += -float(
                    lf.dice_loss(p[:, o : o + 1], g[:, o : o + 1], background_weight=0)
                )
            nb += 1
    return scores / nb


def train_torch(lf, variables, data, perms, dropout: float, tag: str):
    xtr, _, ytr_union, xte, yte = data
    net = TorchDeepLabV3Plus(num_classes=len(ORGANS), dropout=dropout)
    net.load_from_flax(variables)
    torch.manual_seed(7)
    opt = torch.optim.Adam(net.parameters(), lr=BASE_LR)
    lr_at = cosine_annealing_warm_restarts(BASE_LR, t_0=100)
    bg_sched = BackgroundWeightSchedule(5000, seed=42)
    history, first_losses = {}, []
    t0 = time.time()
    for epoch in range(EPOCHS):
        gates = curriculum_gates(epoch)
        bg = bg_sched(epoch)
        for pg in opt.param_groups:
            pg["lr"] = lr_at(epoch)
        net.train()
        for s in range(0, N_TRAIN - BATCH + 1, BATCH):
            idx = perms[epoch][s : s + BATCH]
            x = torch.from_numpy(xtr[idx].transpose(0, 3, 1, 2))
            g = torch.from_numpy(ytr_union[idx].transpose(0, 3, 1, 2))
            opt.zero_grad()
            out = torch.sigmoid(net(x))
            ce, bce, fl, d, gd, tw, fd = torch_losses_fn(lf, out, g, background_weight=bg)
            loss = (
                gates["focal_dice_w"] * fd
                + gates["bce_l_w"] * bce
                + gates["generalized_dice_w"] * (gd + tw)
            )
            loss.backward()
            opt.step()
            if len(first_losses) < 10:
                first_losses.append(float(loss))
        if (epoch + 1) % EVAL_EVERY == 0 or epoch == EPOCHS - 1:
            dice = eval_torch(lf, net, xte, yte)
            history[epoch + 1] = dice.tolist()
            print(f"[torch-{tag}] epoch {epoch+1}: dice={np.round(dice, 4)} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return {"history": history, "first_losses": first_losses}


# ---------------------------------------------------------------- jax side
def train_jax_f32(variables, data, perms, tag: str):
    """Variant A: f32, no dropout, custom step assembled from framework parts."""
    xtr, _, ytr_union, xte, yte = data
    model = DeepLabV3Plus(num_classes=len(ORGANS), aspp_dropout=0.0, dtype=jnp.float32)
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=BASE_LR)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)
    lr_at = cosine_annealing_warm_restarts(BASE_LR, t_0=100)
    bg_sched = BackgroundWeightSchedule(5000, seed=42)

    @jax.jit
    def step(params, batch_stats, opt_state, x, g, bg, gates3, lr):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            seven = seven_losses(probs, g, bg)
            loss = gates3[0] * seven[6] + gates3[1] * seven[1] + gates3[2] * (
                seven[4] + seven[5]
            )
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def eval_fn(params, batch_stats, x, g):
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
        return dice_score(jax.nn.sigmoid(out.astype(jnp.float32)), g)

    history, first_losses = {}, []
    t0 = time.time()
    for epoch in range(EPOCHS):
        gates = curriculum_gates(epoch)
        gates3 = jnp.asarray(
            [gates["focal_dice_w"], gates["bce_l_w"], gates["generalized_dice_w"]],
            jnp.float32,
        )
        bg = jnp.float32(bg_sched(epoch))
        lr = jnp.float32(lr_at(epoch))
        for s in range(0, N_TRAIN - BATCH + 1, BATCH):
            idx = perms[epoch][s : s + BATCH]
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(xtr[idx]), jnp.asarray(ytr_union[idx]), bg, gates3, lr,
            )
            if len(first_losses) < 10:
                first_losses.append(float(loss))
        if (epoch + 1) % EVAL_EVERY == 0 or epoch == EPOCHS - 1:
            scores = np.zeros(len(ORGANS))
            nb = 0
            for s in range(0, len(xte), BATCH):
                scores += np.asarray(
                    eval_fn(params, batch_stats, jnp.asarray(xte[s : s + BATCH]),
                            jnp.asarray(yte[s : s + BATCH]))
                )
                nb += 1
            dice = scores / nb
            history[epoch + 1] = dice.tolist()
            print(f"[jax-{tag}] epoch {epoch+1}: dice={np.round(dice, 4)} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return {"history": history, "first_losses": first_losses}


def train_jax_framework(variables, data, perms, tag: str):
    """Variant B: the shipped bf16 train step (make_train_step, augment off)."""
    xtr, ytr, _, xte, yte = data
    model = DeepLabV3Plus(num_classes=len(ORGANS))  # bf16, dropout 0.5
    tx = make_optimizer(BASE_LR)
    state = create_train_state(model, jax.random.PRNGKey(SEED), (1, IMG, IMG, 3), tx)
    # identical initial weights
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, augment=False)
    eval_step = make_eval_step(model)
    lr_at = cosine_annealing_warm_restarts(BASE_LR, t_0=100)
    bg_sched = BackgroundWeightSchedule(5000, seed=42)
    jitters = jnp.ones((2,), jnp.float32)
    history = {}
    t0 = time.time()
    for epoch in range(EPOCHS):
        gates = curriculum_gates(epoch)
        gates3 = jnp.asarray(
            [gates["focal_dice_w"], gates["bce_l_w"], gates["generalized_dice_w"]],
            jnp.float32,
        )
        for si, s in enumerate(range(0, N_TRAIN - BATCH + 1, BATCH)):
            idx = perms[epoch][s : s + BATCH]
            batch = {"image": jnp.asarray(xtr[idx]), "label": jnp.asarray(ytr[idx])}
            state, _ = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(99), epoch * 1000 + si),
                jnp.float32(bg_sched(epoch)), gates3, jnp.float32(lr_at(epoch)), jitters,
            )
        if (epoch + 1) % EVAL_EVERY == 0 or epoch == EPOCHS - 1:
            scores = np.zeros(len(ORGANS))
            nb = 0
            for s in range(0, len(xte), BATCH):
                out = eval_step(state, {"image": jnp.asarray(xte[s : s + BATCH]),
                                        "label": jnp.asarray(yte[s : s + BATCH])})
                scores += np.asarray(out["dice"])
                nb += 1
            dice = scores / nb
            history[epoch + 1] = dice.tolist()
            print(f"[jax-{tag}] epoch {epoch+1}: dice={np.round(dice, 4)} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return {"history": history}


def main():
    lf = load_reference_losses()
    assert lf is not None, "reference loss oracle unavailable"
    print(f"devices: {jax.devices()}", flush=True)
    data = build_data()
    perms = epoch_perms(EPOCHS, N_TRAIN)

    # identical f32 initial weights for every run
    init_model = DeepLabV3Plus(num_classes=len(ORGANS), aspp_dropout=0.0,
                               dtype=jnp.float32)
    variables = init_model.init(
        {"params": jax.random.PRNGKey(3 + SEED)}, jnp.zeros((1, IMG, IMG, 3)), train=False
    )
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))

    results = {"config": {"img": IMG, "batch": BATCH, "n_train": N_TRAIN,
                          "n_test": N_TEST, "epochs": EPOCHS, "organs": ORGANS,
                          "lr": BASE_LR}}
    results["jax_exact"] = train_jax_f32(variables, data, perms, "exact")
    results["torch_exact"] = train_torch(lf, variables, data, perms, 0.0, "exact")
    results["jax_production"] = train_jax_framework(variables, data, perms, "production")
    results["torch_production"] = train_torch(lf, variables, data, perms, 0.5, "production")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "dice_parity_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

    print("\n=== whole_body Dice (final epoch) ===")
    for k in ("jax_exact", "torch_exact", "jax_production", "torch_production"):
        h = results[k]["history"]
        final = h[max(h, key=int)]
        print(f"{k:>18}: {final[0]:.4f}  (all organs: {np.round(final, 4)})")
    je = results["jax_exact"]["history"][EPOCHS][0]
    te = results["torch_exact"]["history"][EPOCHS][0]
    print(f"\nexact-variant whole_body delta: {abs(je - te):.4f} (target ±0.005)")


if __name__ == "__main__":
    main()
