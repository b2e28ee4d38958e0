"""Configuration layer: env flags, CLI surfaces, and the dataset registry.

Reproduces the reference's L0 config semantics (SURVEY.md §1, L0):

* Registry discovery: the first ``*.json`` file that lives next to the package
  is loaded into ``datasets_metadata`` (reference
  ``ecology_semantic_segmentation/__init__.py:5-14``).
* Environment flags ``SAMPLE``, ``IMGSIZE``, ``MAXCHANNELS``, ``ORGANS``,
  ``EXPTNAME`` (reference ``dataset/fish/__init__.py:10-19``,
  ``train_multiclass.py:10``).  ``IMGSIZE`` is also accepted under the README's
  spelling ``IMG_SIZE`` (the reference README/code disagree; we honor both,
  code spelling wins).
* Split ratios train/val/test = 0.85/0.05/0.10
  (reference ``dataset/fish/__init__.py:4``).

Deviation (documented in SURVEY.md §4.2): the reference computes
``bool(get_env_variable("SAMPLE", False))`` which makes ``SAMPLE=0`` truthy.
Here ``SAMPLE=0``, ``SAMPLE=false`` and ``SAMPLE=`` are all falsy.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any


def get_env_variable(name: str, default_value):
    """Fetch an environment variable, falling back to ``default_value``.

    Mirrors reference ``dataset/fish/__init__.py:10-14``.
    """
    try:
        return os.environ[name]
    except KeyError:
        return default_value


def _env_bool(name: str, default: bool = False) -> bool:
    raw = get_env_variable(name, default)
    if isinstance(raw, bool):
        return raw
    return str(raw).strip().lower() not in ("", "0", "false", "no", "none")


def load_registry(path: str | None = None) -> dict | None:
    """Load the dataset registry JSON.

    With no ``path``, discovers the first ``*.json`` next to this package —
    the same discovery rule as reference ``__init__.py:5-7``.
    """
    if path is None:
        pkg_dir = os.path.dirname(__file__)
        candidates = sorted(x for x in os.listdir(pkg_dir) if x.endswith(".json"))
        if not candidates:
            return None
        path = os.path.join(pkg_dir, candidates[0])
    try:
        with open(path, "r") as f:
            return json.load(f)
    except Exception:  # noqa: BLE001 - registry is optional, like the reference
        return None


#: Dataset registry (``fish_metadata.json``), loaded at import like the
#: reference's ``datasets_metadata`` (``__init__.py:5-14``).  Loading a small
#: JSON at import is cheap; the *data scan* that the reference also performs at
#: import is deferred (see :mod:`.data`).
datasets_metadata: dict | None = load_registry()

#: Reference split ratios (``dataset/fish/__init__.py:4``).
DATASET_SPLITS = {"train": 0.85, "val": 0.05, "test": 0.1}

#: Composite-part grouping (reference ``dataset/__init__.py:10-19``):
#: whole_body first, then ventral/dorsal/head groups, then independent parts.
CPARTS = [
    ["whole_body"],
    ["ventral_side", "anal_fin", "pectoral_fin"],
    ["dorsal_side", "dorsal_fin"],
    ["head", "eye", "operculum"],
    ["humeral_blotch", "pelvic_fin", "caudal_fin"],
]

#: Valid dataset registry types (reference ``dataset/__init__.py:21-23``).
DATASET_TYPES = [
    "segmentation",
    "polygons",
    "segmentation/composite",
    "polygons/composite",
]

#: Minimum fraction of positive pixels for an organ mask to count as present
#: (reference ``fish_dataset.py:31`` default ``min_segment_positivity_ratio``).
MIN_SEGMENT_POSITIVITY_RATIO = 0.0075


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Typed snapshot of the environment-variable configuration.

    Field-by-field parity with reference ``dataset/fish/__init__.py:16-19`` and
    ``train_multiclass.py:10``.
    """

    sample: bool = False
    img_size: int = 256
    max_channels: int = 256
    organs: tuple[str, ...] = ("whole_body",)
    expt_name: str = "deeplabv3p"
    # GT-repair consumption: folder (relative to the registry folder_path)
    # holding rebuild_bbox_dataset output, appended to the ml_training_set
    # scan (reference bbox_to_segmentation_gt/ wiring).
    bbox_dir: str | None = None

    @staticmethod
    def from_env() -> "EnvConfig":
        img_size = get_env_variable("IMGSIZE", None)
        if img_size is None:
            # README spelling fallback (README.md:36 says IMG_SIZE).
            img_size = get_env_variable("IMG_SIZE", 256)
        # Keep empty entries: the reference splits without filtering
        # (``dataset/fish/__init__.py:19``) and its README documents
        # ``ORGANS=whole_body,,`` as the way to run a 3-channel model
        # scoring only channel 0 — empty names match no dataset masks, so
        # those channels come back all -1 (ignore) and "will not be learnt".
        organs = tuple(str(get_env_variable("ORGANS", "whole_body")).split(","))
        bbox_dir = get_env_variable("BBOX_DIR", None)
        return EnvConfig(
            sample=_env_bool("SAMPLE", False),
            img_size=int(img_size),
            max_channels=int(get_env_variable("MAXCHANNELS", 256)),
            organs=organs,
            expt_name=str(get_env_variable("EXPTNAME", "deeplabv3p")),
            bbox_dir=str(bbox_dir) if bbox_dir else None,
        )

    @property
    def num_classes(self) -> int:
        return len(self.organs)

    def checkpoint_dir(self, models_root: str = "models") -> str:
        """Reference checkpoint addressing:
        ``models/<EXPTNAME>/channels<MAXCHANNELS>/img<IMGSIZE>/``
        (reference ``train_multiclass.py:76-78,163-165``)."""
        return os.path.join(
            models_root,
            self.expt_name,
            "channels%d" % self.max_channels,
            "img%d" % self.img_size,
        )


def describe(cfg: EnvConfig) -> str:
    return (
        f"organs={list(cfg.organs)} img_size={cfg.img_size} "
        f"max_channels={cfg.max_channels} sample={cfg.sample} expt={cfg.expt_name}"
    )


def asdict(cfg: EnvConfig) -> dict[str, Any]:
    return dataclasses.asdict(cfg)
