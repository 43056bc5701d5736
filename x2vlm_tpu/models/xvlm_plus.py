"""XVLMPlus / CCLM: separate text and cross encoders (reference
models/xvlm.py:960-1221 XVLMPlusBase; models/model_pretrain.py:91-196
XVLMPlus + CrossViewLM).

- text encoder is replaceable (XLM-R for CCLM) and runs all its layers
  uni-modally; the standalone cross encoder (no embeddings layer,
  cross-attention in every layer) fuses text embeddings with image — or with
  the *other language's* text embeddings for the cross-lingual
  TTC/TTM/TLM para-text objectives (CrossViewLM.forward_para_text:161-181).
- checkpoint split: an XVLMBase checkpoint's 18-layer text stack splits into
  text[0:12] / cross[12:18] via ``split_params_to_plus`` (reference
  load_pretrained_xvlm:1073-1121).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from x2vlm_tpu.models.bert import BertConfig, BertEncoder, BertMLMHead
from x2vlm_tpu.models.xvlm import XVLMBase, XVLMConfig

__all__ = ["XVLMPlusConfig", "XVLMPlusBase", "XVLMPlusForPretrain",
           "split_params_to_plus"]


@dataclasses.dataclass(frozen=True)
class XVLMPlusConfig(XVLMConfig):
    num_cross_layers: int = 6

    @property
    def cross_config(self) -> BertConfig:
        return dataclasses.replace(
            self.text, num_layers=self.num_cross_layers, fusion_layer=0,
            is_decoder=False)


class XVLMPlusBase(XVLMBase):
    """XVLMBase with a standalone cross encoder; inherits the loss library."""

    def setup(self):
        super().setup()
        cfg: XVLMPlusConfig = self.config
        self.cross_encoder = BertEncoder(cfg.cross_config, add_embeddings=False,
                                         dtype=self.dtype)

    def get_text_embeds(self, text_ids, text_atts, deterministic: bool = True):
        # full uni-modal stack (reference xvlm.py:1160-1173)
        return self.text_encoder(text_ids, attention_mask=text_atts,
                                 mode="multi_modal",
                                 deterministic=deterministic)

    def get_cross_embeds(self, image_embeds, image_atts, text_ids=None,
                         text_embeds=None, text_atts=None,
                         deterministic: bool = True,
                         encoder_gather_idx=None):
        assert text_atts is not None
        # pad the KV stream to %8 once, as XVLMBase.get_cross_embeds does
        pad = 0 if image_embeds is None else (-image_embeds.shape[1]) % 8
        if pad:
            image_embeds = jnp.pad(image_embeds, ((0, 0), (0, pad), (0, 0)))
            image_atts = jnp.pad(image_atts, ((0, 0), (0, pad)))
        if text_embeds is None:
            assert text_ids is not None
            text_embeds = self.get_text_embeds(text_ids, text_atts,
                                               deterministic=deterministic)
        return self.cross_encoder(
            encoder_embeds=text_embeds, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts,
            mode="fusion", deterministic=deterministic,
            encoder_gather_idx=encoder_gather_idx)

    def get_mlm_loss(self, text_ids_masked, text_atts, image_embeds, image_atts,
                     masked_pos, masked_ids, deterministic: bool = True):
        cross = self.get_cross_embeds(
            image_embeds, image_atts, text_ids=text_ids_masked,
            text_atts=text_atts, deterministic=deterministic)
        return self.mlm_head(cross, masked_pos=masked_pos,
                             embedding_table=self._tied_table(),
                             labels=masked_ids)


class XVLMPlusForPretrain(nn.Module):
    """XVLMPlus / CrossViewLM pretraining head: multimodal streams (as
    XVLMForPretrain) + parallel-text TTC/TTM/TLM stream."""

    config: XVLMPlusConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.base = XVLMPlusBase(self.config, dtype=self.dtype)

    def __call__(self, batch, rng=None, ret_bbox_loss=False,
                 ret_match_loss=True, deterministic=False):
        if batch.get("image") is None and "text_ids_2" in batch:
            return self.forward_para_text(batch, rng=rng,
                                          deterministic=deterministic)
        if batch.get("image") is None:
            loss = self.base.get_mlm_loss(
                batch["text_ids_masked"], batch["text_atts"], None, None,
                batch["masked_pos"], batch["masked_ids"],
                deterministic=deterministic)
            return {"loss_mlm": loss}
        return self.forward_multimodal(batch, rng=rng,
                                       ret_bbox_loss=ret_bbox_loss,
                                       ret_match_loss=ret_match_loss,
                                       deterministic=deterministic)

    def forward_multimodal(self, batch, rng=None, ret_bbox_loss=False,
                           ret_match_loss=True, deterministic=False):
        base = self.base
        if ret_bbox_loss:
            image_embeds, image_atts, image_embeds_fullatts = base.get_vision_embeds(
                batch["image"], image_atts=batch.get("image_atts"),
                idx_to_group_img=batch.get("idx_to_group_img"),
                deterministic=deterministic)
        else:
            image_embeds, image_atts = base.get_vision_embeds(
                batch["image"], deterministic=deterministic)
        text_embeds = base.get_text_embeds(batch["text_ids"], batch["text_atts"],
                                           deterministic=deterministic)
        image_feat, text_feat = base.get_features(image_embeds, text_embeds)
        losses = {"loss_itc": base.get_contrastive_loss(image_feat, text_feat)}
        if ret_match_loss:
            losses["loss_itm"] = base.get_matching_loss(
                image_embeds, image_atts, image_feat,
                text_embeds, batch["text_atts"], text_feat, rng,
                deterministic=deterministic)
        else:
            losses["loss_itm"] = jnp.asarray(0.0, jnp.float32)
        losses["loss_mlm"] = base.get_mlm_loss(
            batch["text_ids_masked"], batch["text_atts"], image_embeds,
            image_atts, batch["masked_pos"], batch["masked_ids"],
            deterministic=deterministic)
        if ret_bbox_loss:
            coord = base.predict_bbox(image_embeds_fullatts, text_embeds,
                                      batch["text_atts"])
            lb, lg = base.get_bbox_loss(coord, batch["target_bbox"],
                                        is_image=batch.get("is_image"))
            losses["loss_bbox"] = lb
            losses["loss_giou"] = lg
        return losses

    def forward_para_text(self, batch, rng=None, deterministic=False):
        """Cross-lingual TTC/TTM/TLM over parallel text pairs (reference
        model_pretrain.py:161-181): language-2 embeddings play the 'vision'
        role in the shared contrastive/matching/MLM machinery."""
        base = self.base
        e1 = base.get_text_embeds(batch["text_ids"], batch["text_atts"],
                                  deterministic=deterministic)
        e2 = base.get_text_embeds(batch["text_ids_2"], batch["text_atts_2"],
                                  deterministic=deterministic)
        f1 = base.get_features(text_embeds=e1)
        f2 = base.get_features(text_embeds=e2)
        loss_ttc = base.get_contrastive_loss(f1, f2)
        loss_ttm = base.get_matching_loss(e1, batch["text_atts"], f1,
                                          e2, batch["text_atts_2"], f2, rng,
                                          deterministic=deterministic)
        loss_tlm = base.get_mlm_loss(
            batch["text_ids_masked"], batch["text_atts"], e2,
            batch["text_atts_2"], batch["masked_pos"], batch["masked_ids"],
            deterministic=deterministic)
        return {"loss_ttc": loss_ttc, "loss_ttm": loss_ttm, "loss_mlm": loss_tlm}


def split_params_to_plus(base_params: Dict, *, fusion_layer: int,
                         num_layers: int, replace_text_encoder: bool = False
                         ) -> Dict:
    """Split an XVLMBase param tree's fused text stack into Plus text/cross
    trees (reference load_pretrained_xvlm, xvlm.py:1073-1121). With
    ``replace_text_encoder`` the text tower is dropped (a fresh XLM-R takes
    its place) and only cross layers + heads transfer."""
    text = base_params["text_encoder"]
    out = dict(base_params)
    cross = {}
    for j, s in enumerate(range(fusion_layer, num_layers)):
        cross[f"layer_{j}"] = text[f"layer_{s}"]
    out["cross_encoder"] = cross
    new_text = {k: v for k, v in text.items() if not k.startswith("layer_")}
    for i in range(fusion_layer):
        new_text[f"layer_{i}"] = text[f"layer_{i}"]
    if replace_text_encoder:
        out.pop("text_encoder", None)
    else:
        out["text_encoder"] = new_text
    return out
