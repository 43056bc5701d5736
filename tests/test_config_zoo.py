"""Every shipped YAML config parses into the right model architecture
(reference config zoo parity: configs/pretrain/*, configs/finetune/*)."""

import glob
import os

import pytest

from x2vlm_tpu.core.config import load_config
from x2vlm_tpu.factory import build_model, xvlm_config_from_yaml
from x2vlm_tpu.models.beit2 import BEiT2Config
from x2vlm_tpu.models.clip_vit import CLIPViTConfig
from x2vlm_tpu.models.swin import SwinConfig
from x2vlm_tpu.models.xvlm_plus import XVLMPlusConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRETRAIN = sorted(glob.glob(os.path.join(REPO, "configs/pretrain/*.yaml")))
FINETUNE = sorted(glob.glob(os.path.join(REPO, "configs/finetune/*.yaml")))


@pytest.fixture(autouse=True)
def _chdir_repo(monkeypatch):
    monkeypatch.chdir(REPO)  # vision_config paths are repo-relative


def test_config_zoo_complete():
    names = {os.path.basename(p) for p in PRETRAIN}
    for required in ("x2vlm_base_4m.yaml", "x2vlm_base_1b.yaml",
                     "x2vlm_large_4m.yaml", "x2vlm_large_1b.yaml",
                     "x2vlm_large_1b_stage2.yaml", "cclm_x2vlm_base.yaml",
                     "multilingual_cclm_x2vlm_large.yaml"):
        assert required in names, f"missing pretrain config {required}"
    fnames = {os.path.basename(p) for p in FINETUNE}
    for required in ("vqa2_base.yaml", "vqa2_large.yaml",
                     "coco_captioning_large.yaml",
                     "refcoco_grounding_large.yaml"):
        assert required in fnames, f"missing finetune config {required}"


@pytest.mark.parametrize("path", PRETRAIN + FINETUNE,
                         ids=[os.path.basename(p) for p in PRETRAIN + FINETUNE])
def test_config_builds_model(path):
    cfg = load_config(path)
    mcfg = xvlm_config_from_yaml(cfg)
    name = os.path.basename(path)

    if "clip" in name:
        assert isinstance(mcfg.vision, CLIPViTConfig)
        assert mcfg.vision.depth == 12 and mcfg.vision.embed_dim == 768
        assert mcfg.text.encoder_width == 768
    if "swin" in name:
        assert isinstance(mcfg.vision, SwinConfig)
        assert mcfg.vision.depths == (2, 2, 18, 2)
        assert mcfg.text.encoder_width == 1024  # 128 * 2^3
    if "large" in name and "cclm" not in name:
        assert isinstance(mcfg.vision, BEiT2Config)
        assert mcfg.vision.embed_dim == 1024 and mcfg.vision.depth == 24
        assert mcfg.text.hidden_size == 1024
    if "cclm" in name:
        assert isinstance(mcfg, XVLMPlusConfig)
        assert mcfg.text.fusion_layer == mcfg.text.num_layers  # uni-modal tower
    if name == "vqa2_large.yaml":
        assert cfg["image_res"] == 768
        assert cfg["accumulate_steps"] == 2
        # 768px → 48×48+1 = 2305-token vision sequence (flash-attention path)
        assert mcfg.vision.num_patches == 48 * 48
    if name == "x2vlm_base_1b.yaml":
        assert cfg["stop_calc_itm"] == 200000
        assert cfg["aux_iter_perc"] == 0.15
    if name == "x2vlm_large_1b_stage2.yaml":
        assert cfg["video_aux_iter_perc"] == 0.35
        assert mcfg.video_encoding == "avgpool" and mcfg.frame_len == 3

    task = ("pretrain" if "pretrain" in path else
            "vqa" if "vqa" in name else
            "captioning" if "captioning" in name else
            "grounding" if "grounding" in name else
            "nlvr" if ("nlvr" in name or "marvl" in name) else
            "classification" if ("xvnli" in name or "msrvtt" in name) else
            "retrieval")
    if task == "classification":
        cfg.setdefault("num_labels", 3)
    model, _ = build_model(cfg, task)
    assert model is not None


def test_remat_yaml_knob_threads_to_both_towers():
    """`remat: true` + `remat_policy: dots` reach both encoder configs
    (gradient checkpointing; replaces HF's gradient_checkpointing flag,
    reference xbert.py:700)."""
    cfg = {"image_res": 224, "remat": True, "remat_policy": "dots"}
    mcfg = xvlm_config_from_yaml(cfg)
    assert mcfg.vision.remat and mcfg.vision.remat_policy == "dots"
    assert mcfg.text.remat and mcfg.text.remat_policy == "dots"
    # default: off
    mcfg = xvlm_config_from_yaml({"image_res": 224})
    assert not mcfg.vision.remat and not mcfg.text.remat
