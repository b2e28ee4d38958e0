"""Main trainer CLI: ``python -m ecologysemanticsegmentation_tpu.train_multiclass``.

CLI/behavior parity with the reference's primary entry point
(``ecology_semantic_segmentation/train_multiclass.py``):

* flags ``--batch_size`` (default 7) ``--start_epoch`` ``--lr`` (3e-4);
  env ``EXPTNAME``/``ORGANS``/``IMGSIZE``/``MAXCHANNELS``/``SAMPLE``,
* DeepLabV3+ (resnet34) with ``classes=len(ORGANS)`` (reference ``:347-353``),
* union-set label transform on targets (``:110``),
* loss = ``focal_dice_w*fd + bce_w*bce + gdice_w*(gd+tw)`` with the epoch
  curriculum gates (``:92-100,145``) and the randomized background-weight
  schedule (``:50-72``),
* CosineAnnealingWarmRestarts(T_0=100) stepped per epoch (``:81,241``),
* checkpoint every 10 epochs to
  ``models/<EXPT>/channels<MC>/img<SZ>/<EXPT>_epoch<N>.ckpt`` + glob/argmax
  resume (``:163-165,305-335``),
* per-epoch val loop with BCE val loss and 10 val-image PNG triplet dumps to
  ``val_images/<epoch>/`` (``:174-239``).

TPU-native differences: decode-only host pipeline + on-device augmentation;
one jitted train step; data-parallel over all visible devices via a
``(data, model)`` mesh (degrades to a single chip).  Extra flags
(``--num_epochs``, ``--dataset synthetic``, ``--models_dir``) support
smoke-runs without the external data directory.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch_size", default=7, type=int,
                    help="Global batch size (reference default 7; README suggests 54)")
    ap.add_argument("--start_epoch", default=0, type=int,
                    help="Resume from a specific epoch (0 = latest checkpoint)")
    ap.add_argument("--lr", default=0.0003, type=float, help="Adam learning rate")
    ap.add_argument("--num_epochs", default=5000, type=int)
    ap.add_argument("--early_stop_epoch", default=500, type=int)
    ap.add_argument("--dataset", default="registry", choices=["registry", "synthetic"],
                    help="'synthetic' = in-memory fixture dataset, no data dir needed")
    ap.add_argument("--models_dir", default="models")
    ap.add_argument("--model", default="deeplabv3plus")
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--platform", default=None,
                    help="Force a JAX platform (e.g. cpu) — the env var is pinned in some containers")
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument("--log_every", default=None, type=int)
    ap.add_argument("--no_augment", action="store_true")
    ap.add_argument("--deepsupervision", action="store_true",
                    help="Train vgg_unet with side heads + BCE label pyramids "
                         "(completes the reference's empty deepsupervision.py)")
    ap.add_argument("--ckpt", default="msgpack", choices=["msgpack", "orbax"],
                    help="Checkpoint backend: msgpack = reference filename "
                         "layout; orbax = async preemption-safe writes")
    ap.add_argument("--spatial_partition", default=1, type=int,
                    help="shard image rows over a mesh 'model' axis of this "
                         "size (GSPMD spatial partitioning for IMGSIZE >> 256; "
                         "1 = pure data parallelism)")
    ap.add_argument("--no_fused_head_loss", action="store_true",
                    help="Disable folding the head's x4 upsample + sigmoid "
                         "into the fused loss kernel (on by default for "
                         "multi-organ deeplabv3plus; parameters and "
                         "checkpoints are identical either way)")
    ap.add_argument("--grad_accum", default=1, type=int,
                    help="Average this many micro-batch gradients into "
                         "one Adam update (large-image configs where HBM "
                         "caps the per-step batch); resume with the same "
                         "value")
    ap.add_argument("--remat", action="store_true",
                    help="Per-stage rematerialization for vgg_unet (trades "
                         "recompute for HBM activation traffic; numerics "
                         "and checkpoints unchanged)")
    ap.add_argument("--aot_cache", default=None, metavar="DIR",
                    help="Cache the lowered train step as a StableHLO "
                         "artifact in DIR: repeat runs of the same config "
                         "skip Python trace/lowering (the dominant "
                         "cold-start cost; see train/aot.py). Single-device "
                         "runs only; keyed by config+jax version+platform")
    return ap


def save_val_triplets(out_dir: str, epoch: int, j: int, image, labels, probs, organs):
    """Reference val-image dump: ``val_images/<epoch>/<j>_{img,gt_organN,pred_organN}.png``
    (``train_multiclass.py:207-236``)."""
    from .data import imops

    d = os.path.join(out_dir, str(epoch))
    os.makedirs(d, exist_ok=True)
    base = os.path.join(d, str(j))
    imops.imwrite_bgr(base + "_img.png",
                      (np.asarray(image)[..., ::-1] * 255).astype(np.uint8))
    for idx in range(len(organs)):
        imops.imwrite_bgr(base + f"_gt_organ{idx}.png",
                          (np.clip(np.asarray(labels[..., idx]), 0, 1) * 255).astype(np.uint8))
        imops.imwrite_bgr(base + f"_pred_organ{idx}.png",
                          (np.asarray(probs[..., idx]) * 255).astype(np.uint8))


def train(args=None):
    args = args if args is not None else build_argparser().parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from .config import EnvConfig
    from .data import Batcher, device_prefetch, get_split_datasets
    from .losses import LOSS_NAMES
    from .models import build_model
    from .parallel import batch_sharding, create_mesh, local_batch_to_global, replicated_sharding
    from .train import (
        BackgroundWeightSchedule,
        cosine_annealing_warm_restarts,
        create_train_state,
        curriculum_gates,
        make_checkpointer,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    cfg = EnvConfig.from_env()
    print(f"Organs: {list(cfg.organs)}")

    mesh = create_mesh(model_parallel=args.spatial_partition)
    if args.spatial_partition > 1:
        print(f"spatial partitioning: image rows over model axis of "
              f"{args.spatial_partition}")
    batch_size = local_batch_to_global(args.batch_size, mesh)
    if batch_size != args.batch_size:
        print(f"batch_size {args.batch_size} -> {batch_size} (multiple of data axis)")

    train_ds, val_ds, _ = get_split_datasets(cfg, synthetic=args.dataset == "synthetic")
    assert len(train_ds) > 0, "empty training dataset — check data dir or use --dataset synthetic"

    model_name = "vgg_unet" if args.deepsupervision else args.model
    # Fused head-loss: train on 1/4-res logits (upsample+sigmoid folded into
    # the Pallas loss kernel).  Parameters are identical to the full-res
    # model, so eval/checkpoints use the ordinary upsampling view.
    lowres = (
        model_name == "deeplabv3plus"
        and cfg.num_classes > 1
        and not args.deepsupervision
        and not getattr(args, "no_fused_head_loss", False)
    )
    model = build_model(
        model_name, num_classes=cfg.num_classes, encoder_name=args.encoder,
        max_channels=cfg.max_channels, deepsupervision=args.deepsupervision,
        upsample_head=not lowres, remat=getattr(args, "remat", False),
    )
    eval_model = model if not lowres else build_model(
        model_name, num_classes=cfg.num_classes, encoder_name=args.encoder,
        max_channels=cfg.max_channels, deepsupervision=args.deepsupervision,
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

    def _build_step():
        return make_train_step(
            model, tx, augment=not args.no_augment,
            deepsupervision=args.deepsupervision, lowres_head=lowres,
            spatial_mesh=mesh if (lowres and args.spatial_partition > 1) else None,
        )

    aot_dir = getattr(args, "aot_cache", None)
    if aot_dir and (jax.device_count() > 1 or args.spatial_partition > 1):
        print("--aot_cache is single-device only (sharded programs carry "
              "mesh state the artifact does not); running uncached")
        aot_dir = None
    if aot_dir and "axon" in getattr(
            jax.devices()[0].client, "platform_version", ""):
        # Measured on this relay platform (experiments/aot_train_ab.jsonl):
        # the relay's program cache serves normal jit (~76-82 s warm) but
        # misses deserialized StableHLO artifacts (402-1,057 s), while the
        # client-side lowering the cache avoids costs only ~4 s here — the
        # artifact path is a net LOSS through a remote-compile relay. It
        # stays available for directly-attached TPU hosts, where client
        # lowering dominates cold-start (serving A/B: 842.9 -> 25.4 s).
        print("--aot_cache on a relay-mediated backend is a measured net "
              "loss (see RESULTS.md round 5); proceeding anyway")
    if aot_dir:
        from .train.aot import cached_train_step

        key_cfg = dict(
            model=model_name, encoder=args.encoder,
            num_classes=cfg.num_classes, max_channels=cfg.max_channels,
            img_size=cfg.img_size, batch_size=batch_size,
            augment=not args.no_augment, deepsupervision=args.deepsupervision,
            lowres=lowres, remat=getattr(args, "remat", False),
            grad_accum=getattr(args, "grad_accum", 1),
        )
        example = (
            state,
            {"image": jax.ShapeDtypeStruct(
                 (batch_size, cfg.img_size, cfg.img_size, 3), jnp.float32),
             "label": jax.ShapeDtypeStruct(
                 (batch_size, cfg.img_size, cfg.img_size, cfg.num_classes),
                 jnp.float32)},
            jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((), jnp.float32),       # bg_weight
            jax.ShapeDtypeStruct((3,), jnp.float32),     # gates3
            jax.ShapeDtypeStruct((), jnp.float32),       # lr
            jax.ShapeDtypeStruct((2,), jnp.float32),     # jitters
        )
        train_step, aot_status = cached_train_step(
            _build_step, key_cfg, aot_dir, example)
        print(f"aot_cache: {aot_status} ({aot_dir})")
    else:
        train_step = _build_step()
    # DS models evaluate too (main head; make_eval_step drops the side
    # heads) — a capability you can't evaluate is half a capability.
    eval_step = make_eval_step(eval_model)

    lr_at = cosine_annealing_warm_restarts(args.lr, t_0=100)
    bg_schedule = BackgroundWeightSchedule(args.num_epochs, seed=args.seed)
    no_jitters = jnp.ones((2,), jnp.float32)

    loader = Batcher(train_ds, batch_size, shuffle=True, seed=args.seed, pad_final=True)
    val_loader = Batcher(val_ds, 1, shuffle=False) if len(val_ds) else None
    log_every = args.log_every if args.log_every is not None else max(len(loader) // 5, 1)

    from .utils import MetricsLogger

    metrics_log = MetricsLogger(os.path.join(args.models_dir, cfg.expt_name, "metrics.csv"))

    for epoch in range(start_epoch + 1, args.num_epochs):
        train_ds.set_augment_flag(True)
        bg_weight = bg_schedule(epoch + 1)
        gates = curriculum_gates(epoch)
        gates3 = jnp.asarray(
            [gates["focal_dice_w"], gates["bce_l_w"], gates["generalized_dice_w"]],
            jnp.float32,
        )
        lr = lr_at(epoch + 1)

        running = {k: 0.0 for k in (*LOSS_NAMES, "loss")}
        count = 0
        t0 = time.time()
        images_seen = 0
        for i, batch in enumerate(
            device_prefetch(
                iter(loader),
                sharding=batch_sharding(mesh, spatial=args.spatial_partition > 1),
            )
        ):
            step_rng = jax.random.fold_in(rng, epoch * 1_000_003 + i)
            arrays = {"image": batch["image"], "label": batch["label"]}
            state, metrics = train_step(
                state, arrays, step_rng, bg_weight, gates3, lr, no_jitters
            )
            # n_real excludes wrap-around padding in the final batch, so
            # images/sec and epoch sample counts reflect distinct samples.
            images_seen += batch.get("n_real", arrays["image"].shape[0])
            # one device->host transfer for all metrics (per-scalar float()
            # costs a blocking relay round-trip each)
            host_metrics = jax.device_get(metrics)
            for k in running:
                running[k] += float(host_metrics[k])
            count += 1
            if i % log_every == log_every - 1 or len(loader) < log_every:
                print(
                    "Epoch: %d ; Batch: %d/%d : Training Loss: %.8f" % (
                        epoch + 1, i + 1, len(loader), running["loss"] / count)
                )
                print(
                    "\t CE: %.8f; BCE: %.8f; Focal: %.8f; Dice: %.8f "
                    "[D: %.6f, GD: %.6f, TwD: %.6f, FocD: %.6f]" % (
                        running["ce"] / count, running["bce"] / count,
                        running["focal"] / count,
                        sum(running[k] for k in ("dice", "generalized_dice", "twersky", "focal_dice")) / count,
                        running["dice"] / count, running["generalized_dice"] / count,
                        running["twersky"] / count, running["focal_dice"] / count,
                    )
                )
                running = {k: 0.0 for k in running}
                count = 0
        dt = time.time() - t0
        if images_seen:
            print(f"epoch {epoch}: {images_seen / dt:.1f} images/sec (bg_w={bg_weight:.3f}, lr={lr:.2e})")
            metrics_log.log(
                epoch=epoch, step=int(state.step), lr=lr, bg_weight=bg_weight,
                loss=float(host_metrics["loss"]), bce=float(host_metrics["bce"]),
                focal_dice=float(host_metrics["focal_dice"]),
                images_per_sec=images_seen / dt,
            )

        if epoch % 10 == 0:
            ckptr.save(epoch, state)

        if val_loader is not None and eval_step is not None:
            train_ds.set_augment_flag(False)
            val_loss, n_val = 0.0, 0
            for j, batch in enumerate(val_loader):
                out = eval_step(state, {"image": batch["image"], "label": batch["label"]})
                val_loss += float(out["bce"])
                n_val += batch["image"].shape[0]
                if j < 10:
                    save_val_triplets(
                        "val_images", epoch, j, batch["image"][0],
                        batch["label"][0], np.asarray(out["probs"])[0], cfg.organs,
                    )
            print("\nVal Loss: %.8f!" % (val_loss / max(n_val, 1)))

    # final checkpoint so short runs always leave an artifact
    ckptr.save(args.num_epochs - 1, state)
    ckptr.finalize()
    print("finished training")
    return state


if __name__ == "__main__":
    train()
    import sys

    if "grpc" in sys.modules:
        # grpc (pulled in by orbax) can abort CPython interpreter teardown;
        # everything is flushed/finalized by now — exit hard with success.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
