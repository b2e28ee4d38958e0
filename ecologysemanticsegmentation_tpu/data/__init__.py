"""Dataset layer: loaders, combinator, pipeline, device augmentation.

Unlike the reference — which constructs all three splits eagerly at package
import (``dataset/fish/__init__.py:25-41``) — the split singletons here are
built lazily by :func:`get_split_datasets` so the CLI outcomes match without
the import-time scan.
"""

from __future__ import annotations


from ..config import EnvConfig
from .augment import augment_batch, augment_sample
from .fish_dataset import FishDataset
from .loaders import (
    LOADERS,
    IndexedDataset,
    get_alvaradolab_data,
    get_deepfish_segclsloc_data,
    get_ml_training_set_data,
    get_suim_data,
)
from .pipeline import Batcher, device_prefetch
from .synthetic import get_synthetic_data, materialize_to_disk
from .video import VideoDataset, parse_video, reassemble_video


def get_split_datasets(
    cfg: EnvConfig | None = None,
    dataset_type=("segmentation/composite",),
    registry: dict | None = None,
    synthetic: bool = False,
):
    """Build (train, val, test) FishDataset views — the lazy equivalent of the
    reference's ``fish_train_dataset`` / ``fish_val_dataset`` /
    ``fish_test_dataset`` module singletons.

    ``synthetic=True`` swaps in the in-memory fixture dataset (the upgraded
    ``SAMPLE`` mechanism) — no data directory required.
    """
    cfg = cfg or EnvConfig.from_env()
    extra = None
    if synthetic:
        extra = {"synthetic": get_synthetic_data}
        registry = {
            "folder_path": ".",
            "datasets": [{"folder": "", "name": "synthetic", "type": "synthetic"}],
        }
        dataset_type = ("synthetic",)
    splits = []
    for split in ("train", "val", "test"):
        ds = FishDataset(
            dataset_type=dataset_type,
            img_shape=cfg.img_size,
            organs=cfg.organs,
            sample_dataset=cfg.sample,
            split=split,
            registry=registry,
            extra_loaders=extra,
            bbox_dir=getattr(cfg, "bbox_dir", None),
        )
        if split != "train":
            ds.set_augment_flag(False)
        print(f"{split} dataset: {len(ds)} images")
        splits.append(ds)
    return tuple(splits)


__all__ = [
    "FishDataset",
    "IndexedDataset",
    "Batcher",
    "device_prefetch",
    "augment_batch",
    "augment_sample",
    "get_split_datasets",
    "get_synthetic_data",
    "materialize_to_disk",
    "get_alvaradolab_data",
    "get_ml_training_set_data",
    "get_suim_data",
    "get_deepfish_segclsloc_data",
    "LOADERS",
    "VideoDataset",
    "parse_video",
    "reassemble_video",
]
