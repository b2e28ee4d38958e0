"""Config layer tests: env flags, registry discovery, checkpoint addressing."""

import json
import os
from unittest import mock

from ecologysemanticsegmentation_tpu import config


def test_env_config_defaults():
    with mock.patch.dict(os.environ, {}, clear=True):
        c = config.EnvConfig.from_env()
    assert c == config.EnvConfig()
    assert c.organs == ("whole_body",)
    assert c.img_size == 256 and c.max_channels == 256
    assert c.expt_name == "deeplabv3p"


def test_env_config_parsing():
    env = {"ORGANS": "whole_body,ventral_side,dorsal_side", "IMGSIZE": "128",
           "MAXCHANNELS": "512", "SAMPLE": "1", "EXPTNAME": "exp1"}
    with mock.patch.dict(os.environ, env, clear=True):
        c = config.EnvConfig.from_env()
    assert c.organs == ("whole_body", "ventral_side", "dorsal_side")
    assert c.img_size == 128 and c.max_channels == 512
    assert c.sample is True and c.expt_name == "exp1"
    assert c.num_classes == 3


def test_organs_trailing_commas_keep_placeholder_channels():
    """Reference README workflow (`ORGANS=whole_body,,` → a 3-channel model
    scoring only channel 0): empty entries are kept, matching the
    reference's unfiltered split (dataset/fish/__init__.py:19); empty names
    match no dataset masks, so those channels are all -1 (ignore)."""
    with mock.patch.dict(os.environ, {"ORGANS": "whole_body,,"}, clear=True):
        c = config.EnvConfig.from_env()
    assert c.organs == ("whole_body", "", "")
    assert c.num_classes == 3


def test_sample_zero_is_falsy():
    """Documented deviation from the reference's bool(str) truthiness bug."""
    for val in ("0", "false", "", "no"):
        with mock.patch.dict(os.environ, {"SAMPLE": val}, clear=True):
            assert config.EnvConfig.from_env().sample is False


def test_img_size_readme_spelling_fallback():
    with mock.patch.dict(os.environ, {"IMG_SIZE": "96"}, clear=True):
        assert config.EnvConfig.from_env().img_size == 96
    # code spelling wins when both present (reference behavior)
    with mock.patch.dict(os.environ, {"IMG_SIZE": "96", "IMGSIZE": "64"}, clear=True):
        assert config.EnvConfig.from_env().img_size == 64


def test_checkpoint_dir_layout():
    c = config.EnvConfig(expt_name="vgg", max_channels=256, img_size=256)
    assert c.checkpoint_dir() == os.path.join("models", "vgg", "channels256", "img256")


def test_registry_discovery(tmp_path):
    (tmp_path / "meta.json").write_text(json.dumps({"datasets": [], "folder_path": "."}))
    reg = config.load_registry(str(tmp_path / "meta.json"))
    assert reg == {"datasets": [], "folder_path": "."}
    assert config.load_registry(str(tmp_path / "missing.json")) is None
    # package registry discovered at import (first *.json rule)
    assert config.datasets_metadata is not None
    assert any(d["name"] == "alvaradolab" for d in config.datasets_metadata["datasets"])


def test_cparts_structure():
    assert config.CPARTS[0] == ["whole_body"]
    flat = [o for grp in config.CPARTS for o in grp]
    assert "ventral_side" in flat and "dorsal_fin" in flat
