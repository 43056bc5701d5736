"""Classification heads (reference models/model_classification.py).

- XVLMForClassification: CLS of a text-only / image-only / cross encoding →
  2-layer MLP head; MSE when num_labels == 1 (reference :16-44)
- XVLMForVQAClassification: answer-vocabulary classifier over the cross CLS
  (video QA: VQA_msrvtt/msvd), optional KD target (reference :55-86)
- XVLMForNLVR: one text vs TWO images — two fusion passes, concat CLS → head
  (reference :89-117). Covers NLVR2 and MARVL.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2vlm_tpu.models.xvlm import XVLMBase, XVLMConfig, cross_entropy, make_base

__all__ = ["XVLMForClassification", "XVLMForNLVR", "XVLMForMultipleChoice"]


from x2vlm_tpu.models.xvlm import MlpHead as ClsHead  # build_mlp parity:
# Linear(2x) -> LayerNorm -> GELU -> Linear (reference model_classification.py
# cls_head = build_mlp, xvlm.py:163-169) — same structure as itm/bbox heads.


class XVLMForClassification(nn.Module):
    config: XVLMConfig
    num_labels: int
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.base = make_base(self.config, dtype=self.dtype)
        self.cls_head = ClsHead(self.num_labels, dtype=self.dtype)

    def logits(self, text_ids, text_atts, image=None, deterministic=True):
        if image is None:
            embeds = self.base.text_encoder(
                text_ids, attention_mask=text_atts, mode="multi_modal",
                deterministic=deterministic)
        else:
            image_embeds, image_atts = self.base.get_vision_embeds(
                image, deterministic=deterministic)
            embeds = self.base.get_cross_embeds(
                image_embeds, image_atts, text_ids=text_ids,
                text_atts=text_atts, deterministic=deterministic)
        return self.cls_head(embeds[:, 0, :])

    def __call__(self, batch, rng=None, deterministic=False):
        logits = self.logits(batch["text_ids"], batch["text_atts"],
                             image=batch.get("image"),
                             deterministic=deterministic)
        if batch.get("answer_pred") is not None:
            # KD: distill a teacher's answer distribution via KL divergence
            # (reference model_classification.py:65-70 — answer_pred are the
            # teacher logits; loss = KL(softmax(teacher) ‖ softmax(student)),
            # summed over classes, averaged over the batch).
            teacher = batch["answer_pred"].astype(jnp.float32)
            pt = jax.nn.softmax(teacher, axis=-1)
            kl = pt * (jax.nn.log_softmax(teacher, axis=-1)
                       - jax.nn.log_softmax(logits, axis=-1))
            return {"loss_cls": jnp.sum(kl) / logits.shape[0]}
        labels = batch["labels"]
        if self.num_labels == 1:
            loss = jnp.mean((logits[:, 0] - labels.astype(jnp.float32)) ** 2)
        elif "answer_weights" in batch and batch["answer_weights"] is not None:
            # soft targets (video-QA KD / multi-answer weighting)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.sum(logp * batch["answer_weights"], axis=-1))
        else:
            loss = cross_entropy(logits, labels)
        return {"loss_cls": loss}

    def predict(self, batch):
        return self.logits(batch["text_ids"], batch["text_atts"],
                           image=batch.get("image"), deterministic=True)


class XVLMForMultipleChoice(nn.Module):
    """Multiple-choice QA over K candidate texts per image/video (NExT-QA MC;
    reference next_qa_mc_dataset at vqa_dataset.py:651 + vqa_mc_collate_fn at
    dataset/__init__.py:540 emit (K,) option texts — the reference snapshot
    ships no scorer, this is the natural one): each (question ‖ option) row
    goes through the fusion encoder against the shared visual stream, the K
    CLS scores softmax against each other.

    TPU shape: options flatten to one (B·K, L) fusion pass; the K rows per
    sample gather their cross-attention K/V from the single unique image via
    ``encoder_gather_idx`` (the hard-negative-ITM dedup machinery), so the
    video tower runs once per sample, not K times."""

    config: XVLMConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.base = make_base(self.config, dtype=self.dtype)
        self.mc_head = ClsHead(1, dtype=self.dtype)

    def logits(self, image, option_ids, option_atts, deterministic=True):
        B, K, L = option_ids.shape
        image_embeds, image_atts = self.base.get_vision_embeds(
            image, deterministic=deterministic)
        flat_ids = option_ids.reshape(B * K, L)
        flat_atts = option_atts.reshape(B * K, L)
        text_embeds = self.base.get_text_embeds(flat_ids, flat_atts,
                                                deterministic=deterministic)
        gather_idx = jnp.repeat(jnp.arange(B), K)
        atts_all = jnp.take(image_atts, gather_idx, axis=0)
        cross = self.base.get_cross_embeds(
            image_embeds, atts_all, text_embeds=text_embeds,
            text_atts=flat_atts, encoder_gather_idx=gather_idx,
            deterministic=deterministic)[:, 0, :]
        return self.mc_head(cross).reshape(B, K)

    def __call__(self, batch, rng=None, deterministic=False):
        logits = self.logits(batch["image"], batch["option_ids"],
                             batch["option_atts"],
                             deterministic=deterministic)
        return {"loss_cls": cross_entropy(logits, batch["labels"])}

    def predict(self, batch):
        return self.logits(batch["image"], batch["option_ids"],
                           batch["option_atts"], deterministic=True)


class XVLMForNLVR(nn.Module):
    """Two images per text: both fusion passes share towers; CLS pair → head
    (reference model_classification.py:89-117)."""

    config: XVLMConfig
    num_labels: int = 2
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.base = make_base(self.config, dtype=self.dtype)
        self.cls_head = ClsHead(self.num_labels, dtype=self.dtype)

    def logits(self, image0, image1, text_ids, text_atts, deterministic=True):
        # one vision pass over both images (batched), then two fusion passes
        both = jnp.concatenate([image0, image1], axis=0)
        embeds, atts = self.base.get_vision_embeds(both, deterministic=deterministic)
        e0, e1 = jnp.split(embeds, 2, axis=0)
        a0, a1 = jnp.split(atts, 2, axis=0)
        text_embeds = self.base.get_text_embeds(text_ids, text_atts,
                                                deterministic=deterministic)
        c0 = self.base.get_cross_embeds(e0, a0, text_embeds=text_embeds,
                                        text_atts=text_atts,
                                        deterministic=deterministic)[:, 0, :]
        c1 = self.base.get_cross_embeds(e1, a1, text_embeds=text_embeds,
                                        text_atts=text_atts,
                                        deterministic=deterministic)[:, 0, :]
        return self.cls_head(jnp.concatenate([c0, c1], axis=-1))

    def __call__(self, batch, rng=None, deterministic=False):
        logits = self.logits(batch["image0"], batch["image1"],
                             batch["text_ids"], batch["text_atts"],
                             deterministic=deterministic)
        return {"loss_cls": cross_entropy(logits, batch["labels"])}

    def predict(self, batch):
        return self.logits(batch["image0"], batch["image1"],
                           batch["text_ids"], batch["text_atts"],
                           deterministic=True)
