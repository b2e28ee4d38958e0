"""Grad-CAM analysis CLI: ``python -m ecologysemanticsegmentation_tpu.utils.grad_cam <epoch>``.

Mirror of reference ``utils/grad_cam.py:1-71``: loads a checkpoint into a
fresh DeepLabV3+, runs CAM per organ over test batches, and writes heatmap
overlays (the reference displays via matplotlib; headless here).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("epoch", type=int)
    ap.add_argument("--out_dir", default="grad_cam")
    ap.add_argument("--dataset", default="registry", choices=["registry", "synthetic"])
    ap.add_argument("--models_dir", default="models")
    ap.add_argument("--batches", type=int, default=1)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import cv2
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..config import EnvConfig
    from ..data import Batcher, get_split_datasets
    from ..models import build_model
    from ..train import (
        create_train_state, list_checkpoints, load_checkpoint_file, make_optimizer,
    )
    from .saliency import grad_cam, show_cam_on_image

    cfg = EnvConfig.from_env()
    _, _, test_ds = get_split_datasets(cfg, synthetic=args.dataset == "synthetic")
    model = build_model("deeplabv3plus", num_classes=cfg.num_classes)
    template = create_train_state(
        model, jax.random.PRNGKey(0), (1, cfg.img_size, cfg.img_size, 3), make_optimizer()
    )
    save_dir = cfg.checkpoint_dir(args.models_dir)
    pairs = [(e, p) for e, p in list_checkpoints(save_dir, cfg.expt_name) if e == args.epoch]
    assert pairs, f"no checkpoint for epoch {args.epoch} under {save_dir}"
    state = load_checkpoint_file(pairs[0][1], template)
    assert state is not None

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    os.makedirs(args.out_dir, exist_ok=True)
    loader = Batcher(test_ds, 2, shuffle=False, drop_last_if_single=False)
    for j, batch in enumerate(loader):
        if j >= args.batches:
            break
        for organ_idx, organ in enumerate(cfg.organs):
            heat = grad_cam(model, variables, batch["image"], organ_idx)
            for b in range(batch["image"].shape[0]):
                overlay = show_cam_on_image(batch["image"][b], np.asarray(heat[b]))
                cv2.imwrite(
                    os.path.join(args.out_dir, f"batch{j}_{b}_{organ}.png"),
                    cv2.cvtColor((overlay * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
                )
    print(f"wrote CAM overlays to {args.out_dir}")


if __name__ == "__main__":
    main()
