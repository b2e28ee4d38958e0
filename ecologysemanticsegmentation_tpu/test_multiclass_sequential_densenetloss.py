"""Sequential-variant eval CLI.

Same skeleton as :mod:`.test_multiclass` (reference
``test_multiclass_sequential_densenetloss.py``) with the variant's semantics:

* predictions are transformed back from nested unions to organ sets via
  ``return_union_sets_descending_order(reverse=True)`` before scoring
  (reference ``:66``) — always on here,
* ``--batch_size`` flag (default 45) and ``--depthwiseconv`` (``:153-160``),
* optional inner-edge analysis in single-model mode via
  ``utils.detect_inner_edges`` (reference ``:69``), written as PNGs.
"""

from __future__ import annotations


def build_argparser():
    from .test_multiclass import build_argparser as base

    ap = base()
    ap.set_defaults(union_reverse=True)
    ap.add_argument("--edge_analysis", action="store_true",
                    help="Write inner/outer edge-membership analysis PNGs in "
                         "single-model mode (reference detect_inner_edges)")
    return ap


def test(args=None):
    args = args if args is not None else build_argparser().parse_args()
    args.union_reverse = True
    from .test_multiclass import test as base_test

    results = base_test(args)

    if getattr(args, "edge_analysis", False) and args.single_model is not None:
        _edge_analysis(args)
    return results


def _edge_analysis(args):
    import jax
    import numpy as np

    from .config import EnvConfig
    from .data import Batcher, get_split_datasets
    from .losses import return_union_sets_descending_order
    from .models import build_model
    from .train import (
        create_train_state, list_checkpoints, load_checkpoint_file,
        make_eval_step, make_optimizer,
    )
    from .utils import detect_inner_edges

    cfg = EnvConfig.from_env()
    _, _, test_ds = get_split_datasets(cfg, synthetic=args.dataset == "synthetic")
    model = build_model(
        args.model, num_classes=cfg.num_classes, encoder_name=args.encoder,
        depthwise=args.depthwiseconv,
    )
    template = create_train_state(
        model, jax.random.PRNGKey(0), (1, cfg.img_size, cfg.img_size, 3), make_optimizer()
    )
    save_dir = cfg.checkpoint_dir(args.models_dir or "models")
    pairs = [(e, p) for e, p in list_checkpoints(save_dir, cfg.expt_name) if e == args.single_model]
    if not pairs:
        return
    state = load_checkpoint_file(pairs[0][1], template)
    if state is None:
        return
    eval_step = make_eval_step(model, apply_union_reverse=False)
    batch = next(iter(Batcher(test_ds, 2, shuffle=False, drop_last_if_single=False)))
    out = eval_step(state, {"image": batch["image"], "label": batch["label"]})
    probs = return_union_sets_descending_order(out["probs"], reverse=True)
    gts = np.where(batch["label"] > 0, 1.0, 0.0)
    detect_inner_edges(
        np.asarray(probs), gts, img=batch["image"],
        out_dir=f"{args.results_dir}/edge_analysis_epoch{args.single_model}",
    )


if __name__ == "__main__":
    test()
