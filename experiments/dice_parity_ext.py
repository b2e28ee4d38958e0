"""Extended end-to-end Dice parity: the three BASELINE configs round 2 left
unmeasured (VERDICT r2 Next #2), plus a resolution-drift check.

Same harness discipline as dice_parity.py — IDENTICAL initial weights,
IDENTICAL batches, the torch side runs the reference's EXECUTED loss code
(tests/reference_oracle.py) — applied to:

  single_organ : ORGANS=whole_body (the reference's DEFAULT config,
      dataset/fish/__init__.py:19) with the background-weight schedule LIVE
      (single-organ losses_fn keeps the swapped (outputs, labels) argument
      roles AND receives background_weight — the multi-organ recursion drops
      both; train_multiclass.py:50-72,260).  The schedule is built over
      SCHED_N=50 epochs so its 1.6N/5 and 2N/5 breakpoints land inside the
      40-epoch run.  Exact (f32) + production (shipped bf16 step) variants.
  sequential   : the sequential trainer's executed multi-organ loss —
      per-organ 7-tuples + the cross-organ term losses_fn(g1-g2, |x1-x2|)
      (train_multiclass_sequential_densenetloss.py:279-290), lr 1e-3
      (ReduceLROnPlateau(patience=50) cannot fire inside 40 epochs, so both
      sides hold lr constant), predictions union-REVERSED before Dice
      scoring (test_multiclass_sequential_densenetloss.py:66).
  depthwise    : --depthwiseconv (DeepLabV3PlusDepthwise: inner model with
      classes*5 outputs + trailing 3x3 projection), trained under the
      sequential protocol (its reference home).
  flagship128  : the round-2 flagship 3-organ config at IMG=128 (vs the
      measured 64) to derisk resolution-dependent drift.

Run one config:
  PARITY_CONFIG=single_organ PYTHONPATH=/root/repo:/root/.axon_site \
      python experiments/dice_parity_ext.py
Appends to experiments/dice_parity_ext_results.json (key = config name).
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
import torch.nn as nn

from ecologysemanticsegmentation_tpu.losses import (
    dice_score,
    return_union_sets_descending_order,
    sequential_cross_organ_losses,
    seven_losses,
)
from ecologysemanticsegmentation_tpu.models import DeepLabV3Plus, DeepLabV3PlusDepthwise
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

CONFIG = os.environ.get("PARITY_CONFIG", "single_organ")
SEED = int(os.environ.get("PARITY_SEED", 0))
BATCH = 8
N_TRAIN = 96
N_TEST = 24
EVAL_EVERY = 10

CFG = {
    # organs, img, epochs, lr, protocol, sched_n (bg schedule horizon)
    "single_organ": dict(organs=("whole_body",), img=64, epochs=40, lr=3e-4,
                         protocol="multiclass", sched_n=50),
    "sequential": dict(organs=("whole_body", "ventral_side", "dorsal_side"),
                       img=64, epochs=40, lr=1e-3, protocol="sequential",
                       sched_n=5000),
    "depthwise": dict(organs=("whole_body", "ventral_side", "dorsal_side"),
                      img=64, epochs=40, lr=1e-3, protocol="sequential",
                      sched_n=5000, depthwise=True),
    "flagship128": dict(organs=("whole_body", "ventral_side", "dorsal_side"),
                        img=128, epochs=int(os.environ.get("PARITY_EPOCHS", 30)),
                        lr=3e-4, protocol="multiclass", sched_n=5000),
}[CONFIG]

ORGANS = CFG["organs"]
IMG = CFG["img"]
EPOCHS = int(os.environ.get("PARITY_EPOCHS", CFG["epochs"]))
BASE_LR = CFG["lr"]
PROTOCOL = CFG["protocol"]
DEPTHWISE = CFG.get("depthwise", False)


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
    ytr_union = np.asarray(return_union_sets_descending_order(jnp.asarray(ytr)))
    return xtr, ytr, ytr_union, xte, yte


def epoch_perms(epochs: int, n: int):
    rng = np.random.RandomState(1234 + SEED)
    return [rng.permutation(n) for _ in range(epochs)]


def lr_at_fn():
    if PROTOCOL == "multiclass":
        return cosine_annealing_warm_restarts(BASE_LR, t_0=100)
    # sequential: ReduceLROnPlateau(factor .75, patience 50) cannot trigger
    # inside a 40-epoch run -> constant lr on both sides (documented above)
    return lambda epoch: BASE_LR


# ---------------------------------------------------------------- torch side
class TorchDeepLabV3PlusDepthwise(nn.Module):
    """Mirror of the --depthwiseconv wrapper (reference
    model/deeplabv3plus_depthwise.py:5-28): inner model with classes*5
    outputs + trailing 3x3 conv back to classes."""

    def __init__(self, num_classes: int, dropout: float = 0.0, mult: int = 5):
        super().__init__()
        self.smp_deeplab_model = TorchDeepLabV3Plus(
            num_classes=num_classes * mult, dropout=dropout)
        self.last_layers = nn.Conv2d(num_classes * mult, num_classes, 3, padding=1)

    def forward(self, x):
        return self.last_layers(self.smp_deeplab_model(x))

    def load_from_flax(self, variables) -> None:
        p = variables["params"]
        inner = {"params": p["smp_deeplab_model"],
                 "batch_stats": variables["batch_stats"]["smp_deeplab_model"]}
        self.smp_deeplab_model.load_from_flax(inner)
        k = np.asarray(p["last_layers"]["kernel"])  # HWIO -> OIHW
        self.last_layers.weight.data = torch.from_numpy(
            k.transpose(3, 2, 0, 1).copy())
        self.last_layers.bias.data = torch.from_numpy(
            np.asarray(p["last_layers"]["bias"]).copy())


def torch_losses_fn(lf, x, g, background_weight=0.0):
    """Reference losses_fn, executed path (train_multiclass.py:253-275;
    multi-organ recursion restores (gt, pred) and DROPS background_weight)."""
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


def torch_sequential_losses_fn(lf, x, g):
    """The sequential trainer's EXECUTED loss
    (train_multiclass_sequential_densenetloss.py:279-290): per-organ tuples
    summed + cross-organ losses_fn(g1-g2, |x1-x2|) added once."""
    base = torch_losses_fn(lf, x, g)
    cross = torch_losses_fn(lf, g[:, 1:2] - g[:, 2:3],
                            torch.abs(x[:, 1:2] - x[:, 2:3]))
    return [b + c for b, c in zip(base, cross)]


def torch_union_reverse(p):
    """Union-reverse on predictions before scoring (utils/subsets_union.py:23-28,
    exclude index 0), NCHW torch tensors."""
    out = p.clone()
    for idx in range(p.shape[1] - 2, 0, -1):
        out[:, idx] = torch.abs(out[:, idx] - out[:, idx + 1])
    return out


def eval_torch(lf, net, xte, yte):
    net.eval()
    scores = np.zeros(len(ORGANS))
    nb = 0
    with torch.no_grad():
        for s in range(0, len(xte), BATCH):
            x = torch.from_numpy(xte[s : s + BATCH].transpose(0, 3, 1, 2))
            g = torch.from_numpy(yte[s : s + BATCH].transpose(0, 3, 1, 2))
            p = torch.sigmoid(net(x))
            if PROTOCOL == "sequential" and len(ORGANS) > 1:
                p = torch_union_reverse(p)
            for o in range(len(ORGANS)):
                scores[o] += -float(
                    lf.dice_loss(p[:, o : o + 1], g[:, o : o + 1], background_weight=0)
                )
            nb += 1
    return scores / nb


def build_torch_net(dropout: float):
    if DEPTHWISE:
        return TorchDeepLabV3PlusDepthwise(num_classes=len(ORGANS), dropout=dropout)
    return TorchDeepLabV3Plus(num_classes=len(ORGANS), dropout=dropout)


def train_torch(lf, variables, data, perms, dropout: float, tag: str):
    xtr, _, ytr_union, xte, yte = data
    net = build_torch_net(dropout)
    net.load_from_flax(variables)
    torch.manual_seed(7)
    opt = torch.optim.Adam(net.parameters(), lr=BASE_LR)
    lr_at = lr_at_fn()
    bg_sched = BackgroundWeightSchedule(CFG["sched_n"], seed=42)
    history, bg_log = {}, []
    t0 = time.time()
    for epoch in range(EPOCHS):
        gates = curriculum_gates(epoch)
        bg = bg_sched(epoch)
        bg_log.append(round(float(bg), 4))
        for pg in opt.param_groups:
            pg["lr"] = lr_at(epoch)
        net.train()
        for s in range(0, N_TRAIN - BATCH + 1, BATCH):
            idx = perms[epoch][s : s + BATCH]
            x = torch.from_numpy(xtr[idx].transpose(0, 3, 1, 2))
            g = torch.from_numpy(ytr_union[idx].transpose(0, 3, 1, 2))
            opt.zero_grad()
            out = torch.sigmoid(net(x))
            if PROTOCOL == "sequential":
                ce, bce, fl, d, gd, tw, fd = torch_sequential_losses_fn(lf, out, g)
            else:
                ce, bce, fl, d, gd, tw, fd = torch_losses_fn(
                    lf, out, g, background_weight=bg)
            loss = (
                gates["focal_dice_w"] * fd
                + gates["bce_l_w"] * bce
                + gates["generalized_dice_w"] * (gd + tw)
            )
            loss.backward()
            opt.step()
        if (epoch + 1) % EVAL_EVERY == 0 or epoch == EPOCHS - 1:
            dice = eval_torch(lf, net, xte, yte)
            history[epoch + 1] = dice.tolist()
            print(f"[torch-{tag}] epoch {epoch+1}: dice={np.round(dice, 4)} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return {"history": history, "bg_weights": bg_log}


# ---------------------------------------------------------------- jax side
def build_jax_model_f32():
    if DEPTHWISE:
        return DeepLabV3PlusDepthwise(num_classes=len(ORGANS), aspp_dropout=0.0,
                                      dtype=jnp.float32)
    return DeepLabV3Plus(num_classes=len(ORGANS), aspp_dropout=0.0,
                         dtype=jnp.float32)


def jax_union_reverse(p):
    return return_union_sets_descending_order(p, reverse=True)


def train_jax_f32(variables, data, perms, tag: str):
    xtr, _, ytr_union, xte, yte = data
    model = build_jax_model_f32()
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=BASE_LR)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)
    lr_at = lr_at_fn()
    bg_sched = BackgroundWeightSchedule(CFG["sched_n"], seed=42)

    @jax.jit
    def step(params, batch_stats, opt_state, x, g, bg, gates3, lr):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            if PROTOCOL == "sequential":
                seven = sequential_cross_organ_losses(probs, g)
            else:
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
        p = jax.nn.sigmoid(out.astype(jnp.float32))
        if PROTOCOL == "sequential" and len(ORGANS) > 1:
            p = jax_union_reverse(p)
        return dice_score(p, g)

    history = {}
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
    return {"history": history}


def train_jax_framework(variables, data, perms, tag: str):
    """Production variant: the SHIPPED bf16 train step + eval step (only run
    for single_organ — the one config where bg is live end-to-end)."""
    xtr, ytr, _, xte, yte = data
    model = DeepLabV3Plus(num_classes=len(ORGANS))  # bf16, dropout 0.5
    tx = make_optimizer(BASE_LR)
    state = create_train_state(model, jax.random.PRNGKey(SEED), (1, IMG, IMG, 3), tx)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, augment=False)
    eval_step = make_eval_step(model)
    lr_at = lr_at_fn()
    bg_sched = BackgroundWeightSchedule(CFG["sched_n"], seed=42)
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
    print(f"config={CONFIG} organs={ORGANS} img={IMG} epochs={EPOCHS} "
          f"lr={BASE_LR} protocol={PROTOCOL} depthwise={DEPTHWISE}", flush=True)
    data = build_data()
    perms = epoch_perms(EPOCHS, N_TRAIN)

    init_model = build_jax_model_f32()
    variables = init_model.init(
        {"params": jax.random.PRNGKey(3 + SEED)}, jnp.zeros((1, IMG, IMG, 3)),
        train=False,
    )
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))

    results = {"config": {"name": CONFIG, "img": IMG, "batch": BATCH,
                          "n_train": N_TRAIN, "n_test": N_TEST, "epochs": EPOCHS,
                          "organs": ORGANS, "lr": BASE_LR, "protocol": PROTOCOL,
                          "depthwise": DEPTHWISE, "sched_n": CFG["sched_n"],
                          "seed": SEED}}
    results["jax_exact"] = train_jax_f32(variables, data, perms, "exact")
    results["torch_exact"] = train_torch(lf, variables, data, perms, 0.0, "exact")
    if CONFIG == "single_organ":
        results["jax_production"] = train_jax_framework(variables, data, perms,
                                                        "production")
        results["torch_production"] = train_torch(lf, variables, data, perms,
                                                  0.5, "production")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "dice_parity_ext_results.json")
    all_results = {}
    if os.path.exists(out):
        with open(out) as f:
            all_results = json.load(f)
    key = CONFIG if SEED == 0 else f"{CONFIG}_seed{SEED}"
    all_results[key] = results
    with open(out, "w") as f:
        json.dump(all_results, f, indent=1)

    print(f"\n=== {CONFIG}: whole_body Dice (final epoch) ===")
    for k in [k for k in ("jax_exact", "torch_exact", "jax_production",
                          "torch_production") if k in results]:
        h = results[k]["history"]
        final = h[max(h, key=int)]
        print(f"{k:>18}: {final[0]:.4f}  (all organs: {np.round(final, 4)})")
    je = results["jax_exact"]["history"][EPOCHS][0]
    te = results["torch_exact"]["history"][EPOCHS][0]
    print(f"\n{CONFIG} exact whole_body delta: {abs(je - te):.4f} (target ±0.005)")


if __name__ == "__main__":
    main()
