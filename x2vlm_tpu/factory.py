"""Config-driven model construction (reference models/xvlm.py
build_vision_encoder:172-283 / build_text_encoder:286-387 + per-task ctors).

Reads the same YAML schema as the reference (vision_config JSON pointer,
text_num_hidden_layers / text_fusion_start_at, use_beit_v2/use_clip_vit/
use_swin switches, embed_dim/temp, video block) and returns the right model
module + structured configs. Checkpoint import/expansion helpers connect HF
BERT (12-layer) or reference ``.th`` checkpoints to any target layout.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from x2vlm_tpu.core.config import Config, read_json
from x2vlm_tpu.models.beit2 import BEiT2Config
from x2vlm_tpu.models.bert import BertConfig
from x2vlm_tpu.models.clip_vit import CLIPViTConfig
from x2vlm_tpu.models.swin import SwinConfig
from x2vlm_tpu.models.xvlm import XVLMConfig
from x2vlm_tpu.models.xvlm_plus import XVLMPlusConfig

__all__ = ["vision_config_from_yaml", "text_config_from_yaml",
           "xvlm_config_from_yaml", "model_dtype", "build_model",
           "expand_text_layers"]


def vision_config_from_yaml(config: Dict) -> Any:
    image_res = config["image_res"]
    vc_path = config.get("vision_config")
    vc = read_json(vc_path) if vc_path and os.path.exists(vc_path) else Config(
        config.get("vision_config_inline", {}))

    # the three switches are mutually exclusive; use_beit_v2 is the default
    # backbone so setting it alongside another switch is a config error
    # (reference build_vision_encoder branches, xvlm.py:172-283)
    switches = [k for k in ("use_clip_vit", "use_swin", "use_beit_v2")
                if config.get(k, False)]
    if len(switches) > 1:
        raise ValueError(f"vision switches are mutually exclusive: {switches}")

    if config.get("use_clip_vit", False):
        return CLIPViTConfig(
            image_res=image_res,
            patch_size=vc.get("patch_size", 16),
            embed_dim=vc.get("vision_width", 768),
            depth=vc.get("num_hidden_layers", 12),
            num_heads=vc.get("num_attention_heads", 12),
            intermediate_size=vc.get("intermediate_size", 3072),
            attn_dropout_rate=vc.get("attention_dropout", 0.0),
            act=vc.get("hidden_act", "quick_gelu"),
            # -1 and 0 both mean off (reference configs ship either)
            local_attn_depth=max(0, vc.get("local_attn_depth", 0)),
        )
    if config.get("use_swin", False):
        out = SwinConfig(
            image_res=image_res,
            patch_size=vc.get("patch_size", 4),
            embed_dim=vc.get("embed_dim", 128),
            depths=tuple(vc.get("depths", (2, 2, 18, 2))),
            num_heads=tuple(vc.get("num_heads", (4, 8, 16, 32))),
            window_size=vc.get("window_size", 7),
        )
        # data-side patch bitmaps (region stream) are laid out on the OUTPUT
        # token grid: the YAML's patch_size must equal Swin's final-stage
        # stride — stem patch × 2^(stages-1), 32 for the standard 4-stage
        # model (reference asserts patch_size == 32, xvlm.py:222)
        stride = out.patch_size * 2 ** (out.num_layers - 1)
        assert config.get("patch_size", stride) == stride, \
            f"use_swin requires patch_size: {stride} (the final-stage token grid)"
        return out
    # default: BEiT-2 (use_beit_v2)
    width = vc.get("vision_width", 768)
    patch = vc.get("patch_size", config.get("patch_size", 16))
    if "num_hidden_layers" in vc or "num_attention_heads" in vc:
        return BEiT2Config(
            image_res=image_res, patch_size=patch, embed_dim=width,
            depth=vc.get("num_hidden_layers", 12),
            num_heads=vc.get("num_attention_heads", 12))
    preset = BEiT2Config.large if width >= 1024 else BEiT2Config.base
    return preset(image_res=image_res, patch_size=patch)


def text_config_from_yaml(config: Dict, vision_width: int) -> BertConfig:
    name = str(config.get("text_encoder", "bert-base-uncased")).lower()
    num_layers = config.get("text_num_hidden_layers", 18)
    fusion = config.get("text_fusion_start_at",
                        config.get("text_fusion_layer", num_layers))
    if "xlm-roberta" in name or "roberta" in name:
        out = BertConfig.roberta_base(
            num_layers=num_layers, fusion_layer=fusion,
            encoder_width=vision_width)
    elif "large" in name:
        out = BertConfig.bert_large(num_layers=num_layers, fusion_layer=fusion,
                                    encoder_width=vision_width)
    else:
        out = BertConfig.bert_base(num_layers=num_layers, fusion_layer=fusion,
                                   encoder_width=vision_width)
    # changeable hidden dropout (reference xvlm.py:298) and the stochastic-
    # depth knobs (xvlm.py:299-300; shipped refcoco_grounding_large.yaml sets
    # 0.1/0.1). Order matters: BertConfig.__post_init__ zeroes hidden_dropout
    # whenever text_drop_path_rate > 0 (reference xbert.py:637-641).
    overrides = {}
    if "dropout" in config:
        overrides["hidden_dropout"] = float(config["dropout"])
    if "text_drop_path_rate" in config or "cross_drop_path_rate" in config:
        overrides["text_drop_path_rate"] = float(
            config.get("text_drop_path_rate", 0.0))
        overrides["cross_drop_path_rate"] = float(
            config.get("cross_drop_path_rate", 0.0))
    if overrides:
        out = dataclasses.replace(out, **overrides)
    inline = config.get("text_config_inline")
    if inline:
        out = dataclasses.replace(out, **dict(inline))
    return out


def xvlm_config_from_yaml(config: Dict) -> XVLMConfig:
    from x2vlm_tpu.models.xvlm import vision_width as _vw

    vision = vision_config_from_yaml(config)
    text = text_config_from_yaml(config, _vw(vision))
    # gradient checkpointing (replaces the reference's HF-level
    # gradient_checkpointing flag, xbert.py:700): `remat: true` recomputes
    # block activations in the backward; `remat_policy: dots` keeps weight-
    # matmul outputs (near no-remat speed at a fraction of the memory)
    if config.get("remat", False):
        policy = config.get("remat_policy")
        vision = dataclasses.replace(vision, remat=True, remat_policy=policy)
        text = dataclasses.replace(text, remat=True, remat_policy=policy)
    common = dict(
        vision=vision, text=text,
        embed_dim=config.get("embed_dim", 256),
        temp=config.get("temp", 0.07),
        fix_temp=config.get("fix_temp", False),
        video_encoding=config.get("video_encoding", ""),
        frame_len=config.get("frame_len", 1),
        add_frame_pos=config.get("add_frame_pos", False),
        resampler_depth=config.get("resampler_depth", 2),
        resampler_latents=config.get("resampler_latents", 64),
    )
    if config.get("model_type", "") in ("xvlm_plus", "cclm") or \
            config.get("replace_text_encoder", False):
        # the reference's Plus stack has no drop-path support and asserts the
        # knob away (xvlm.py:1012 "notimplemented") — mirror that loudly
        if config.get("cross_drop_path_rate", 0.0) or \
                config.get("text_drop_path_rate", 0.0):
            raise ValueError(
                "drop-path is not implemented for XVLMPlus/CCLM "
                "(reference xvlm.py:1012)")
        n_cross = config.get("num_cross_layers", 6)
        return XVLMPlusConfig(num_cross_layers=n_cross, **common)
    return XVLMConfig(**common)


def model_dtype(config: Dict):
    """Compute dtype from accelerator.MIXED_PRECISION: bf16 (default) or
    no/fp32 → float32. The reference's apex fp16 levels map to bf16 here —
    the TPU MXU's native mixed precision (no loss scaling needed)."""
    mp = str(config.get("accelerator", {}).get("MIXED_PRECISION",
                                               "bf16")).lower()
    if mp in ("no", "fp32", "o0"):
        return jnp.float32
    if mp in ("bf16", "fp16", "o1", "o2"):
        return jnp.bfloat16
    raise ValueError(f"unknown accelerator.MIXED_PRECISION: {mp!r}")


def build_model(config: Dict, task: str, dtype=None):
    """task: pretrain | retrieval | vqa | nlvr | grounding | captioning |
    classification | pretrain_plus."""
    if dtype is None:
        dtype = model_dtype(config)
    cfg = xvlm_config_from_yaml(config)
    if task == "pretrain":
        if isinstance(cfg, XVLMPlusConfig):
            from x2vlm_tpu.models.xvlm_plus import XVLMPlusForPretrain

            return XVLMPlusForPretrain(cfg, dtype=dtype), cfg
        from x2vlm_tpu.models.heads import XVLMForPretrain

        return XVLMForPretrain(cfg, dtype=dtype), cfg
    if task == "retrieval":
        from x2vlm_tpu.models.heads import XVLMForRetrieval

        return XVLMForRetrieval(cfg, dtype=dtype), cfg
    if task == "vqa":
        from x2vlm_tpu.models.generation import XVLMForVQA

        return XVLMForVQA(cfg, num_dec_layers=config.get("num_dec_layers", 6),
                          pad_token_id=config.get("pad_token_id", 0),
                          dtype=dtype), cfg
    if task == "nlvr":
        from x2vlm_tpu.models.classification import XVLMForNLVR

        return XVLMForNLVR(cfg, dtype=dtype), cfg
    if task == "grounding":
        from x2vlm_tpu.models.grounding import XVLMForGrounding

        return XVLMForGrounding(cfg, dtype=dtype), cfg
    if task == "captioning":
        from x2vlm_tpu.models.captioning import XVLMForMLMCaptioning

        return XVLMForMLMCaptioning(
            cfg, label_smoothing=config.get("label_smoothing", 0.1),
            dtype=dtype), cfg
    if task == "classification":
        from x2vlm_tpu.models.classification import XVLMForClassification

        return XVLMForClassification(cfg, num_labels=config["num_labels"],
                                     dtype=dtype), cfg
    if task == "multiple_choice":
        from x2vlm_tpu.models.classification import XVLMForMultipleChoice

        return XVLMForMultipleChoice(cfg, dtype=dtype), cfg
    raise ValueError(f"unknown task {task!r}")


def expand_text_layers(text_params: Dict, *, from_layers: int, to_layers: int,
                       fusion_layer: int) -> Dict:
    """12→18 layer expansion: duplicate the upper half into the fusion slots
    (reference build_text_encoder:337-347 maps layers 6-11 → 12-17); or
    large→12L subsampling (every other layer, reference :355)."""
    out = {k: v for k, v in text_params.items() if not k.startswith("layer_")}
    if to_layers > from_layers:
        for i in range(from_layers):
            out[f"layer_{i}"] = text_params[f"layer_{i}"]
        n_new = to_layers - from_layers
        for j in range(n_new):
            src = from_layers - n_new + j
            out[f"layer_{from_layers + j}"] = text_params[f"layer_{src}"]
    elif to_layers < from_layers:
        assert from_layers == 2 * to_layers, "only every-other subsampling"
        for j in range(to_layers):
            out[f"layer_{j}"] = text_params[f"layer_{2 * j + 1}"]
    else:
        out.update({k: v for k, v in text_params.items() if k.startswith("layer_")})
    return out
