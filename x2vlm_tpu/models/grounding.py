"""Visual grounding head (reference models/model_grounding.py:18-30):
image+text → cross CLS → bbox MLP → sigmoid cxcywh; L1 + GIoU loss."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from x2vlm_tpu.models.xvlm import XVLMBase, XVLMConfig, make_base

__all__ = ["XVLMForGrounding"]


class XVLMForGrounding(nn.Module):
    config: XVLMConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        base_cfg = dataclasses.replace(
            self.config, use_contrastive=False, use_matching=False,
            use_mlm=False, use_bbox=True)
        self.base = make_base(base_cfg, dtype=self.dtype)

    def predict(self, image, text_ids, text_atts, deterministic=True):
        image_embeds, _ = self.base.get_vision_embeds(
            image, deterministic=deterministic)
        text_embeds = self.base.get_text_embeds(text_ids, text_atts,
                                                deterministic=deterministic)
        return self.base.predict_bbox(image_embeds, text_embeds, text_atts)

    def __call__(self, batch, rng=None, deterministic=False):
        coord = self.predict(batch["image"], batch["text_ids"],
                             batch["text_atts"], deterministic=deterministic)
        loss_bbox, loss_giou = self.base.get_bbox_loss(coord, batch["target_bbox"])
        return {"loss_bbox": loss_bbox, "loss_giou": loss_giou}
