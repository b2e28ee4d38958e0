"""``python -m ecologysemanticsegmentation_tpu.train`` — the reference
README's second training command (``README.md:38``:
``python -m ecology_semantic_segmentation.train --batch_size 54``), which is
dead there (no ``train.py`` exists); here it runs the multiclass trainer,
the same entry the README's first command names.
"""

from ..train_multiclass import train

if __name__ == "__main__":
    train()
