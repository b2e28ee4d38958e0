"""Sequential/"densenet-loss" trainer CLI:
``python -m ecologysemanticsegmentation_tpu.train_multiclass_sequential_densenetloss``.

Variant-trainer parity (reference
``train_multiclass_sequential_densenetloss.py``):

* ``composite_flag = len(ORGANS) > 1`` selects the script's multi-organ loss
  (``:45``).  What that *executes* is the cross-organ term added to organ 1
  (``:285``, provided by :func:`..losses.sequential_cross_organ_losses`);
  its set-theory composite branch (``:304-362``) is unreachable dead code —
  see the loss docstrings and PARITY.md,
* ``num_epochs=11000``, lr 1e-3, ``ReduceLROnPlateau(factor=0.75,
  patience=50)`` stepped on val loss (``:81``),
* checkpoints every 5 epochs (``:156-158``; the reference saves inside the
  batch loop — we save at epoch end, same cadence),
* loss = ``bce*bce_w + focal_dice_w*fdice + gdice_w*(gdice+twersky)``
  (``:151``),
* divergence guard: non-empty-prediction assert on val outputs
  ("gradient descent gave no positives! aborting", ``:246``),
* ``--depthwiseconv`` selects the DeepLabV3PlusDepthwise head; warm-starting
  depthwise from vanilla checkpoints is provided by
  ``models.import_torch.strip_smp_deeplab_prefix``-style param remap
  (``:392-414``).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch_size", default=7, type=int)
    ap.add_argument("--start_epoch", default=0, type=int)
    ap.add_argument("--lr", default=0.001, type=float)
    ap.add_argument("--num_epochs", default=11000, type=int)
    ap.add_argument("--early_stop_epoch", default=400, type=int)
    ap.add_argument("--depthwiseconv", action="store_true")
    ap.add_argument("--dataset", default="registry", choices=["registry", "synthetic"])
    ap.add_argument("--models_dir", default="models")
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument("--no_augment", action="store_true")
    ap.add_argument("--ckpt", default="msgpack", choices=["msgpack", "orbax"],
                    help="Checkpoint backend: msgpack = reference filename "
                         "layout; orbax = async preemption-safe writes")
    ap.add_argument("--grad_accum", default=1, type=int,
                    help="Average this many micro-batch gradients into "
                         "one Adam update (large-image configs where HBM "
                         "caps the per-step batch); resume with the same "
                         "value")
    ap.add_argument("--spatial_partition", default=1, type=int,
                    help="shard image rows over a mesh 'model' axis of this "
                         "size (GSPMD spatial partitioning for IMGSIZE >> 256; "
                         "1 = pure data parallelism).  The loss reductions "
                         "shard explicitly too (loss_sums spatial_mesh_context)")
    return ap


def train(args=None):
    args = args if args is not None else build_argparser().parse_args()
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .config import EnvConfig
    from .data import Batcher, device_prefetch, get_split_datasets
    from .models import build_model
    from .parallel import batch_sharding, create_mesh, local_batch_to_global, replicated_sharding
    from .train import (
        BackgroundWeightSchedule,
        ReduceLROnPlateau,
        create_train_state,
        curriculum_gates,
        make_checkpointer,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    cfg = EnvConfig.from_env()
    composite_flag = cfg.num_classes > 1
    print(f"Organs: {list(cfg.organs)} (composite set-theory losses: {composite_flag})")
    if composite_flag:
        assert cfg.num_classes == 3, (
            "sequential composite losses hardcode the 3-organ "
            "whole_body/ventral_side/dorsal_side structure (reference :304-362)"
        )

    mesh = create_mesh(model_parallel=getattr(args, "spatial_partition", 1))
    batch_size = local_batch_to_global(args.batch_size, mesh)

    train_ds, val_ds, _ = get_split_datasets(cfg, synthetic=args.dataset == "synthetic")
    assert len(train_ds) > 0, "empty training dataset"

    model = build_model(
        "deeplabv3plus", num_classes=cfg.num_classes, encoder_name=args.encoder,
        depthwise=args.depthwiseconv,
    )
    tx = make_optimizer(args.lr, grad_accum=getattr(args, "grad_accum", 1))
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(model, rng, (1, cfg.img_size, cfg.img_size, 3), tx)

    save_dir = cfg.checkpoint_dir(args.models_dir)
    ckptr = make_checkpointer(args.ckpt, save_dir, cfg.expt_name)
    start_epoch, state = ckptr.restore(
        state, epoch=None if args.start_epoch == 0 else args.start_epoch
    )
    state = jax.device_put(state, replicated_sharding(mesh))

    train_step = make_train_step(
        model, tx,
        composite_mode="sequential" if composite_flag else "none",
        augment=not args.no_augment,
        spatial_mesh=(mesh if getattr(args, "spatial_partition", 1) > 1
                      else None),
    )
    eval_step = make_eval_step(model, apply_union_reverse=False)

    plateau = ReduceLROnPlateau(args.lr, factor=0.75, patience=50)
    bg_schedule = BackgroundWeightSchedule(args.num_epochs, seed=args.seed)

    loader = Batcher(train_ds, batch_size, shuffle=True, seed=args.seed, pad_final=True)
    val_loader = Batcher(val_ds, 1, shuffle=False) if len(val_ds) else None

    lr = args.lr
    for epoch in range(start_epoch + 1, args.num_epochs):
        train_ds.set_augment_flag(True)
        bg_weight = bg_schedule(epoch + 1)
        gates = curriculum_gates(epoch)
        gates3 = jnp.asarray(
            [gates["focal_dice_w"], gates["bce_l_w"], gates["generalized_dice_w"]],
            jnp.float32,
        )
        t0, images_seen, ep_loss, n_batches = time.time(), 0, 0.0, 0
        # Early-stop jitters belong only to the reference's unreachable
        # composite branch; the executed loss takes none (placeholder ones).
        jitters = jnp.ones((2,), jnp.float32)
        for i, batch in enumerate(
            device_prefetch(iter(loader), sharding=batch_sharding(
                mesh, spatial=getattr(args, "spatial_partition", 1) > 1))
        ):
            step_rng = jax.random.fold_in(rng, epoch * 1_000_003 + i)
            state, metrics = train_step(
                state,
                {"image": batch["image"], "label": batch["label"]},
                step_rng, bg_weight, gates3, lr, jitters,
            )
            ep_loss += float(metrics["loss"])
            n_batches += 1
            # n_real excludes wrap-around padding in the final batch.
            images_seen += batch.get("n_real", batch["image"].shape[0])
        dt = time.time() - t0
        if n_batches:
            print(
                f"Epoch {epoch + 1}: loss {ep_loss / n_batches:.6f} "
                f"({images_seen / dt:.1f} img/s, lr={lr:.2e}, bg={bg_weight:.3f})"
            )

        if epoch % 5 == 0:
            ckptr.save(epoch, state)

        if val_loader is not None:
            train_ds.set_augment_flag(False)
            val_loss, n_val = 0.0, 0
            for batch in val_loader:
                out = eval_step(state, {"image": batch["image"], "label": batch["label"]})
                # Divergence guard (reference :246).
                assert float(np.asarray(out["probs"]).sum()) > 0, (
                    "gradient descent gave no positives! aborting"
                )
                val_loss += float(out["bce"])
                n_val += 1
            val_loss /= max(n_val, 1)
            lr = plateau.step(val_loss)
            print("Val Loss: %.8f!" % val_loss)

    ckptr.save(args.num_epochs - 1, state)
    ckptr.finalize()
    print("finished training")
    return state


if __name__ == "__main__":
    train()
    import os
    import sys

    if "grpc" in sys.modules:
        # grpc (pulled in by orbax) can abort CPython interpreter teardown;
        # everything is flushed/finalized by now — exit hard with success.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
