"""Task heads over the XVLM composition core.

Parity targets:
- XVLMForPretrain  ← reference models/model_pretrain.py:24-88 (XVLM)
- XVLMForRetrieval ← reference models/model_retrieval.py:7-25

Each head is a flax module owning one `XVLMBase` under the scope ``base`` so
checkpoints transfer across tasks unchanged (the reference relies on
state-dict surgery for the same effect).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2vlm_tpu.models.xvlm import (
    XVLMBase, XVLMConfig, make_base, vision_seq_len,
)

__all__ = ["XVLMForPretrain", "XVLMForRetrieval", "pretrain_init_inputs"]


def pretrain_init_inputs(config: XVLMConfig, batch_size: int = 2,
                         seq_len: int = 8, n_mask: int = 2):
    """A synthetic region-stream batch exercising *every* parameterized path
    (vision, text, fusion, MLM/ITM/bbox heads, projections). linen creates
    params lazily at init-trace time, so `model.init` must run with this batch
    and ``ret_bbox_loss=True`` for the full tree to exist."""
    res = config.vision.image_res
    S = vision_seq_len(config.vision)
    batch = {
        "image": jnp.zeros((1, res, res, 3), jnp.float32),
        "text_ids": jnp.zeros((batch_size, seq_len), jnp.int32),
        "text_atts": jnp.ones((batch_size, seq_len), jnp.int32),
        "text_ids_masked": jnp.zeros((batch_size, seq_len), jnp.int32),
        "masked_pos": jnp.zeros((batch_size, n_mask), jnp.int32),
        "masked_ids": jnp.zeros((batch_size, n_mask), jnp.int32),
        "idx_to_group_img": jnp.zeros((batch_size,), jnp.int32),
        "image_atts": jnp.ones((batch_size, S), jnp.float32),
        "target_bbox": jnp.full((batch_size, 4), 0.5, jnp.float32),
        "is_image": jnp.zeros((batch_size,), jnp.float32),
    }
    return batch


class XVLMForPretrain(nn.Module):
    """Pretraining losses over one stream batch.

    Streams (reference Pretrain.py:189-252): image-text ('image'), region-text
    ('region', adds bbox losses), video-text ('video'), text-only ('text').
    Each stream is a separately-jitted call — static shapes per stream, no
    recompilation churn (SURVEY §7.3 hard part 3).
    """

    config: XVLMConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.base = make_base(self.config, dtype=self.dtype)

    def __call__(self, batch: Dict[str, jnp.ndarray], rng=None,
                 ret_bbox_loss: bool = False, ret_match_loss: bool = True,
                 deterministic: bool = False) -> Dict[str, jnp.ndarray]:
        if batch.get("image") is None:
            return self.forward_text(batch, deterministic=deterministic)
        return self.forward_multimodal(
            batch, rng=rng, ret_bbox_loss=ret_bbox_loss,
            ret_match_loss=ret_match_loss, deterministic=deterministic)

    def forward_multimodal(self, batch, rng=None, ret_bbox_loss: bool = False,
                           ret_match_loss: bool = True,
                           deterministic: bool = False):
        base = self.base
        image = batch["image"]
        text_ids, text_atts = batch["text_ids"], batch["text_atts"]

        if ret_bbox_loss:
            image_embeds, image_atts, image_embeds_fullatts = base.get_vision_embeds(
                image, image_atts=batch.get("image_atts"),
                idx_to_group_img=batch.get("idx_to_group_img"),
                deterministic=deterministic)
        else:
            image_embeds, image_atts = base.get_vision_embeds(
                image, deterministic=deterministic)

        # One text-mode pass covers both the clean text (ITC/ITM) and the
        # masked text (MLM) — halves the number of tiny-matmul text-layer
        # calls at pretrain batch sizes.
        both_ids = jnp.concatenate([text_ids, batch["text_ids_masked"]], 0)
        both_atts = jnp.concatenate([text_atts, text_atts], 0)
        both_embeds = base.get_text_embeds(both_ids, both_atts,
                                           deterministic=deterministic)
        text_embeds, mlm_text_embeds = jnp.split(both_embeds, 2, axis=0)
        image_feat, text_feat = base.get_features(image_embeds, text_embeds)

        losses = {"loss_itc": base.get_contrastive_loss(image_feat, text_feat)}
        if ret_match_loss:
            # fused ITM+MLM: one 4·bs-row fusion pass (see XVLMBase)
            loss_itm, loss_mlm = base.get_matching_and_mlm_loss(
                image_embeds, image_atts, image_feat,
                text_embeds, text_atts, text_feat,
                mlm_text_embeds, batch["masked_pos"], batch["masked_ids"],
                rng, deterministic=deterministic)
            losses["loss_itm"] = loss_itm
            losses["loss_mlm"] = loss_mlm
        else:
            losses["loss_itm"] = jnp.asarray(0.0, jnp.float32)
            losses["loss_mlm"] = base.get_mlm_loss(
                batch["text_ids_masked"], text_atts, image_embeds, image_atts,
                batch["masked_pos"], batch["masked_ids"],
                deterministic=deterministic)

        if ret_bbox_loss:
            output_coord = base.predict_bbox(image_embeds_fullatts, text_embeds,
                                             text_atts)
            loss_bbox, loss_giou = base.get_bbox_loss(
                output_coord, batch["target_bbox"], is_image=batch.get("is_image"))
            losses["loss_bbox"] = loss_bbox
            losses["loss_giou"] = loss_giou
        return losses

    def forward_text(self, batch, deterministic: bool = False):
        loss = self.base.get_mlm_loss(
            batch["text_ids_masked"], batch["text_atts"], None, None,
            batch["masked_pos"], batch["masked_ids"],
            deterministic=deterministic)
        return {"loss_mlm": loss}


class XVLMForRetrieval(nn.Module):
    """Fine-tuning ITC+ITM with duplicate-caption-aware `idx`
    (reference model_retrieval.py:14-25)."""

    config: XVLMConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.base = make_base(self.config, dtype=self.dtype)

    def __call__(self, image, text_ids=None, text_atts=None, idx=None, rng=None,
                 deterministic: bool = False):
        if isinstance(image, dict):  # batch-dict calling convention (train step)
            batch = image
            image, text_ids = batch["image"], batch["text_ids"]
            text_atts, idx = batch["text_atts"], batch["idx"]
        base = self.base
        image_embeds, image_atts = base.get_vision_embeds(
            image, deterministic=deterministic)
        text_embeds = base.get_text_embeds(text_ids, text_atts,
                                           deterministic=deterministic)
        image_feat, text_feat = base.get_features(image_embeds, text_embeds)
        loss_itc = base.get_contrastive_loss(image_feat, text_feat, idx=idx)
        loss_itm = base.get_matching_loss(
            image_embeds, image_atts, image_feat,
            text_embeds, text_atts, text_feat, rng, idx=idx,
            deterministic=deterministic)
        return {"loss_itc": loss_itc, "loss_itm": loss_itm}

    # --- eval-time encoders (two-stage retrieval protocol) ---

    def encode_images(self, image):
        embeds, _ = self.base.get_vision_embeds(image, deterministic=True)
        feat = self.base.get_features(image_embeds=embeds)
        return embeds, feat

    def encode_texts(self, text_ids, text_atts):
        embeds = self.base.get_text_embeds(text_ids, text_atts,
                                           deterministic=True)
        feat = self.base.get_features(text_embeds=embeds)
        return embeds, feat

    def itm_score(self, image_embeds, text_embeds, text_atts):
        """ITM rerank score for candidate pairs (reference Retrieval.py:126-137)."""
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        cross = self.base.get_cross_embeds(
            image_embeds, image_atts, text_embeds=text_embeds,
            text_atts=text_atts)[:, 0, :]
        logits = self.base.itm_head(cross)
        return logits[:, 1].astype(jnp.float32)
