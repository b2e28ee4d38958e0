"""Eval CLI: ``python -m ecologysemanticsegmentation_tpu.test_multiclass``.

Checkpoint-sweep evaluator with the reference's semantics
(``ecology_semantic_segmentation/test_multiclass.py``):

* sweeps every checkpoint in ``models/<EXPT>/channels<MC>/img<SZ>/`` (or one
  epoch via ``--single_model N``),
* per-organ Dice = mean over test batches of
  ``-dice_loss(pred, gt, background_weight=0)`` (``:80-82,104``),
* idempotent skip: an existing ``test_results/<epoch4>/<organs>`` directory
  skips that epoch (``:35-41``),
* ``--single_model``: batch 1 + gt/pred overlay PNGs via
  ``display_composite_annotations`` (``:94-102``),
* corrupt/incompatible checkpoints are skipped (``:153-160``),
* final report: per-organ ranking over all epochs (``:170-172``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--single_model", type=int, default=None,
                    help="Epoch number for model selection vs testing the entire sweep")
    ap.add_argument("--models_dir", default=None)
    ap.add_argument("--results_dir", default="test_results")
    ap.add_argument("--batch_size", type=int, default=45)
    ap.add_argument("--dataset", default="registry", choices=["registry", "synthetic"])
    ap.add_argument("--model", default="deeplabv3plus")
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--depthwiseconv", action="store_true")
    ap.add_argument("--deepsupervision", action="store_true",
                    help="Score checkpoints trained with --deepsupervision "
                         "(builds the side-head vgg_unet so the extra "
                         "ds_head params restore; the MAIN head is scored)")
    ap.add_argument("--union_reverse", action="store_true",
                    help="Apply the reverse union-set transform to predictions "
                         "before scoring (sequential-variant eval semantics)")
    ap.add_argument("--platform", default=None)
    return ap


def evaluate_checkpoint(
    eval_step, state, loader, organs, results_dir, saved_epoch, single_model, union_reverse=False
):
    """One checkpoint over the test set; returns per-organ Dice or None if the
    epoch's results dir already exists (idempotent-skip contract)."""
    from .data import imops
    from .utils import display_composite_annotations

    dir_name = os.path.join(results_dir, str(saved_epoch).zfill(4), ",".join(organs))
    if os.path.isdir(dir_name):
        print(f"Skipping epoch {saved_epoch}! Test already done!")
        return None
    os.makedirs(dir_name, exist_ok=True)

    total = np.zeros(len(organs))
    counts = np.zeros(len(organs))
    for j, batch in enumerate(loader):
        out = eval_step(state, {"image": batch["image"], "label": batch["label"]})
        # Weight each batch by per-organ validity: an organ that is entirely
        # -1 (ignore) in a batch contributes nothing instead of a degenerate
        # eps/eps score of 1.0.  Clean data: valid == 1 for every batch, so
        # this is the reference's plain mean-over-batches.
        valid = np.asarray(out["valid"])
        total += np.asarray(out["dice"]) * valid
        counts += valid
        if single_model:
            img8 = (batch["image"][0] * 255).astype(np.uint8)
            gt8 = (np.clip(batch["label"][0], 0, 1) * 255).astype(np.uint8)
            pred8 = (np.asarray(out["probs"])[0] * 255).astype(np.uint8)
            preds = display_composite_annotations(img8, pred8, list(organs), verbose=False)
            gts = display_composite_annotations(img8, gt8, list(organs), verbose=False)
            for entry_p, entry_g in zip(preds, gts):
                key = list(entry_g.keys())[0]
                imops.imwrite_bgr(os.path.join(dir_name, f"{key}_{j}_gt.png"),
                                  entry_g[key][..., ::-1])
                imops.imwrite_bgr(os.path.join(dir_name, f"{key}_{j}_pred.png"),
                                  entry_p[key][..., ::-1])
    if counts.max() == 0:
        return None
    # An organ with no valid batch at all reports nan (no data), not a score.
    dice = total / np.maximum(counts, 1)
    dice = np.where(counts > 0, dice, np.nan)
    print(f"Epoch {saved_epoch}: \n\t Test Dice Score: ", dice)
    print("Finished Testing")
    return dice


def test(args=None):
    args = args if args is not None else build_argparser().parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .config import EnvConfig
    from .data import Batcher, get_split_datasets
    from .models import build_model
    from .train import (
        create_train_state,
        list_checkpoints,
        load_checkpoint_file,
        make_eval_step,
        make_optimizer,
    )

    cfg = EnvConfig.from_env()
    _, _, test_ds = get_split_datasets(cfg, synthetic=args.dataset == "synthetic")
    test_ds.set_augment_flag(False)
    assert len(test_ds) > 0, "empty test dataset"

    batch_size = 1 if args.single_model else args.batch_size
    print(f"Using batch size: {batch_size}")
    loader = Batcher(test_ds, batch_size, shuffle=False, drop_last_if_single=False)

    # --deepsupervision checkpoints carry side-head params (vgg_unet only);
    # build the matching model so they restore, then score the MAIN head
    # (make_eval_step drops tuple side outputs).
    model_name = "vgg_unet" if args.deepsupervision else args.model
    model = build_model(
        model_name, num_classes=cfg.num_classes, encoder_name=args.encoder,
        max_channels=cfg.max_channels, depthwise=args.depthwiseconv,
        deepsupervision=args.deepsupervision,
    )
    template = create_train_state(
        model, jax.random.PRNGKey(0), (1, cfg.img_size, cfg.img_size, 3), make_optimizer()
    )
    eval_step = make_eval_step(model, apply_union_reverse=args.union_reverse)

    models_dir = args.models_dir or "models"
    save_dir = cfg.checkpoint_dir(models_dir)
    pairs = list_checkpoints(save_dir, cfg.expt_name)
    if args.single_model is not None:
        pairs = [(e, p) for e, p in pairs if e == args.single_model]
    if not pairs:
        print(f"No checkpoints found under {save_dir}")
        return []

    test_losses = []
    for saved_epoch, path in pairs:
        state = load_checkpoint_file(path, template)
        if state is None:
            print(f"Skipped epoch {saved_epoch} because of model file incompatibility!")
            continue
        dice = evaluate_checkpoint(
            eval_step, state, loader, cfg.organs, args.results_dir,
            saved_epoch, bool(args.single_model), args.union_reverse,
        )
        if dice is None:
            continue
        test_losses.append([saved_epoch, dice])

    for organ_idx in range(len(cfg.organs)):
        for epoch, dice in sorted(test_losses, key=lambda x: x[1][organ_idx]):
            print(
                "Epoch %d : Organ : %s DICE Score " % (epoch, cfg.organs[organ_idx]),
                dice[organ_idx],
            )
    return test_losses


if __name__ == "__main__":
    test()
