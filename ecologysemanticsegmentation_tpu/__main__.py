"""``python -m ecologysemanticsegmentation_tpu`` — framework overview."""

from __future__ import annotations

from . import __version__

ENTRY_POINTS = """\
ecologysemanticsegmentation_tpu v{version} — TPU-native multi-organ fish segmentation

Entry points (python -m ecologysemanticsegmentation_tpu.<name>):
  train_multiclass                           main trainer (DeepLabV3+ resnet34)
  train_multiclass_sequential_densenetloss   cross-organ-loss trainer variant
  test_multiclass                            checkpoint-sweep Dice evaluator
  test_multiclass_sequential_densenetloss    union-reverse evaluator (+edge analysis)
  test_video                                 video -> frames -> segment -> video
  train                                      alias of train_multiclass (README.md:38 command)
  predict <ckpt> <files...>                  bulk file scorer (streaming serving path)
  utils.grad_cam <epoch>                     per-organ CAM overlays
  utils.gt_repair scan|flag|rebuild          GT bbox-problem detector / realigner
  data.fish_dataset                          dataset inspection / relative ratios
  utils.hsv_picker <image>                   interactive HSV probe

Env flags: ORGANS (comma list), IMGSIZE, MAXCHANNELS, SAMPLE, EXPTNAME.
Smoke runs need no data directory: add `--dataset synthetic` (and SAMPLE=1).

Repo-level tools: bench.py (train throughput JSON), __graft_entry__.py
(multi-chip sharded dry run). Docs: README.md, PARITY.md, RESULTS.md.
"""


def main() -> None:
    print(ENTRY_POINTS.format(version=__version__))


if __name__ == "__main__":
    main()
