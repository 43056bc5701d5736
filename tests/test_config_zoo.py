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


VISION_JSONS = sorted(glob.glob(os.path.join(REPO, "configs/*.json")))


@pytest.mark.parametrize(
    "path", PRETRAIN + FINETUNE,
    ids=[os.path.basename(p) for p in PRETRAIN + FINETUNE])
def test_config_audit_every_key_registered(path):
    """The silent-knob guard (VERDICT r3/r4 recurring class): every key in
    every shipped YAML must have a registered consumer; unknown keys raise."""
    from x2vlm_tpu.core.config_schema import validate_config

    validate_config(load_config(path), source=path)


@pytest.mark.parametrize("path", VISION_JSONS,
                         ids=[os.path.basename(p) for p in VISION_JSONS])
def test_vision_json_audit(path):
    from x2vlm_tpu.core.config import read_json
    from x2vlm_tpu.core.config_schema import unknown_vision_json_keys

    assert unknown_vision_json_keys(read_json(path)) == []


def test_config_audit_rejects_unknown_keys():
    from x2vlm_tpu.core.config_schema import validate_config

    with pytest.raises(ValueError, match="nothing in this framework reads"):
        validate_config({"image_res": 224, "text_drop_path_rte": 0.1})
    with pytest.raises(ValueError, match="images.mask_probb"):
        validate_config({"image_res": 224, "images": {"mask_probb": 0.5}})
    with pytest.raises(ValueError, match="bogus_field"):
        validate_config({"text_config_inline": {"bogus_field": 1}})
    # '_'-prefixed keys are comment escapes
    validate_config({"image_res": 224, "_note": "why this config exists",
                     "images": {"_todo": 1, "batch_size": 4}})


def test_config_audit_launcher_enforces(tmp_path):
    """run.setup refuses a config with an unconsumed key."""
    import yaml as _yaml

    from x2vlm_tpu.run import parse_args, setup

    p = tmp_path / "bad.yaml"
    p.write_text(_yaml.safe_dump({"image_res": 224, "use_beit_v3": True}))
    args = parse_args(["--task", "retrieval", "--config", str(p),
                       "--output_dir", str(tmp_path / "out")])
    with pytest.raises(ValueError, match="use_beit_v3"):
        setup(args)


def test_registry_keys_are_actually_read_by_the_source():
    """Anti-rot meta-audit: every registered key must appear as a string
    literal somewhere in the package source (so the registry can't drift into
    blessing keys nothing reads). 'parity:' entries — knobs the reference
    itself reads-and-ignores — are exempt."""
    import re

    from x2vlm_tpu.core import config_schema as cs

    src = ""
    for root, _, files in os.walk(os.path.join(REPO, "x2vlm_tpu")):
        for fn in files:
            if fn.endswith(".py"):
                with open(os.path.join(root, fn)) as f:
                    src += f.read()

    def check(registry, scope):
        missing = []
        for key, consumer in registry.items():
            if consumer.startswith("parity:"):
                continue
            if not re.search(r"['\"]" + re.escape(key) + r"['\"]", src):
                missing.append(f"{scope}.{key} (claimed: {consumer})")
        return missing

    missing = check(cs.TOP_LEVEL, "top")
    missing += check(cs.VISION_JSON, "vision_json")
    seen = set()
    for block, reg in cs.BLOCKS.items():
        if id(reg) in seen:
            continue
        seen.add(id(reg))
        missing += check(reg, block)
    assert not missing, f"registered but never read: {missing}"


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
