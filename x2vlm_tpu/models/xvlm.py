"""XVLM composition: vision encoder + text/fusion encoder + multi-grained losses.

Capability parity with reference models/xvlm.py:463-957 (XVLMBase), built
TPU-first:

- **ITC** (contrastive): features are computed per shard; the logits matrix is
  written as a *global* matmul — under pjit with the batch sharded over the
  `data` axis, XLA inserts the all_gather over ICI and the backward slice
  automatically, replacing the reference's hand-written differentiable
  AllGather (xvlm.py:140-160,794-826).
- **ITM** (matching with hard negatives): negative sampling is a single
  vectorized `jax.random.categorical` over masked similarity rows — no Python
  loops or per-row `torch.multinomial` (xvlm.py:828-899). Negatives are drawn
  from the *global* batch (the reference restricts to in-rank negatives as a
  DDP-era compromise; the global pool is a strict superset — harder negatives).
- **MLM**: fusion-encoder pass on masked ids; logits only at masked slots,
  labels < 0 ignored (HF ignore_index=-100; xvlm.py:901-908, xbert.py:1591-1673).
- **bbox**: cross CLS → MLP → sigmoid cxcywh; L1 + (1 - GIoU) with `is_image`
  masking and degenerate-box guard (xvlm.py:910-957). The GIoU diagonal is
  computed elementwise (O(N), not the reference's O(N²) pairwise + diag).
- Video: frame-wise encode + mean-pool over frames with optional learned frame
  position embeddings (xvlm.py:482-501,615-645).

All loss math is in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2vlm_tpu.models.beit2 import BEiT2, BEiT2Config, grouped_image_embeds
from x2vlm_tpu.models.bert import BertConfig, BertEncoder, BertMLMHead
from x2vlm_tpu.ops import box as box_ops

__all__ = ["XVLMConfig", "XVLMBase", "cross_entropy", "MlpHead", "make_base",
           "build_vision_tower", "vision_width", "vision_seq_len"]


def vision_width(vision_cfg) -> int:
    """Output channel width of a vision tower config (reference
    build_vision_encoder sets `vision_encoder.vision_width`, xvlm.py:279).
    Swin's output width is 8x its stem embed_dim (hierarchical doubling)."""
    w = getattr(vision_cfg, "vision_width", None)
    return w if isinstance(w, int) else vision_cfg.embed_dim


def vision_seq_len(vision_cfg) -> int:
    """Output token count (pooled/CLS token + patches) of a vision tower.

    BEiT-2 / CLIP-ViT: 1 + (res/patch)². Swin: 1 + (res/32)² — the final
    stage has downsampled 2^(L-1) times past the patch-4 stem (reference
    swin_transformer.py:664-687 appends the avgpool token)."""
    from x2vlm_tpu.models.swin import SwinConfig

    if isinstance(vision_cfg, SwinConfig):
        stride = vision_cfg.patch_size * 2 ** (vision_cfg.num_layers - 1)
        return 1 + (vision_cfg.image_res // stride) ** 2
    return 1 + vision_cfg.num_patches


def build_vision_tower(vision_cfg, dtype=jnp.bfloat16) -> nn.Module:
    """Dispatch a vision tower module on its config type — the swappable
    backbone contract (reference build_vision_encoder, xvlm.py:172-283).
    All three towers share the output contract (B, S+1, C) with a summary
    token at position 0 (BEiT-2/Swin: avgpool; CLIP: a real CLS token), so
    the composition, grouped-region path, and heads are backbone-agnostic."""
    if isinstance(vision_cfg, BEiT2Config):
        return BEiT2(vision_cfg, dtype=dtype)
    from x2vlm_tpu.models.clip_vit import CLIPViT, CLIPViTConfig
    from x2vlm_tpu.models.swin import SwinConfig, SwinTransformer

    if isinstance(vision_cfg, CLIPViTConfig):
        return CLIPViT(vision_cfg, dtype=dtype)
    if isinstance(vision_cfg, SwinConfig):
        return SwinTransformer(vision_cfg, dtype=dtype)
    raise TypeError(f"unknown vision config type {type(vision_cfg).__name__}")


@dataclasses.dataclass(frozen=True)
class XVLMConfig:
    # vision backbone config — BEiT2Config | CLIPViTConfig | SwinConfig; the
    # tower module is dispatched on the type (build_vision_tower)
    vision: Any = dataclasses.field(default_factory=BEiT2Config)
    text: BertConfig = dataclasses.field(default_factory=BertConfig)
    embed_dim: int = 256
    temp: float = 0.07
    fix_temp: bool = False
    use_contrastive: bool = True
    use_matching: bool = True
    use_mlm: bool = True
    use_bbox: bool = True
    # ITM hard negatives: 0 = sample from the global batch (strict superset
    # of the reference's in-rank pool); >0 = restrict sampling to blocks of
    # this size along the batch (exact reference parity: set to the
    # per-device batch size; reference xvlm.py:828-857 samples in-rank only)
    itm_neg_block: int = 0
    # video (reference xvlm.py:482-501). "resampler" routes frame tokens
    # through a Flamingo-style PerceiverResampler (models/resampler.py;
    # unwired optional capability in the reference) instead of avg-pooling.
    video_encoding: str = ""          # "" | "avgpool" | "resampler"
    frame_len: int = 1
    add_frame_pos: bool = False
    resampler_depth: int = 2
    resampler_latents: int = 64

    @classmethod
    def base(cls, image_res: int = 224, **kw) -> "XVLMConfig":
        return cls(vision=BEiT2Config.base(image_res=image_res),
                   text=BertConfig.bert_base(), **kw)

    @classmethod
    def large(cls, image_res: int = 224, **kw) -> "XVLMConfig":
        return cls(vision=BEiT2Config.large(image_res=image_res),
                   text=BertConfig.bert_large(encoder_width=1024), **kw)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int = -100) -> jnp.ndarray:
    """Mean CE over non-ignored labels (HF CrossEntropyLoss semantics)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


class MlpHead(nn.Module):
    """dense(2x) → LayerNorm → GELU → dense(out) (reference xvlm.py:163-169)."""

    out_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(d * 2, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln")(x.astype(jnp.float32))
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="fc2")(x)
        return x


class XVLMBase(nn.Module):
    """Composition core. Task heads call the methods; nothing here assumes a
    particular task. All methods accept/return (B, ...) global batch arrays."""

    config: XVLMConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        self.vision_encoder = build_vision_tower(cfg.vision, dtype=self.dtype)
        self.text_encoder = BertEncoder(cfg.text, dtype=self.dtype)
        if cfg.use_mlm:
            self.mlm_head = BertMLMHead(cfg.text, dtype=self.dtype)
        if cfg.use_contrastive:
            self.vision_proj = nn.Dense(cfg.embed_dim, dtype=jnp.float32,
                                        param_dtype=jnp.float32)
            self.text_proj = nn.Dense(cfg.embed_dim, dtype=jnp.float32,
                                      param_dtype=jnp.float32)
            if not cfg.fix_temp:
                self.temp = self.param("temp", nn.initializers.constant(cfg.temp),
                                       (), jnp.float32)
        if cfg.use_matching:
            self.itm_head = MlpHead(2, dtype=self.dtype)
        if cfg.use_bbox:
            self.bbox_head = MlpHead(4, dtype=self.dtype)
        if cfg.video_encoding and cfg.add_frame_pos:
            self.frame_pos_embed = self.param(
                "frame_pos_embed", nn.initializers.truncated_normal(0.02),
                (1, cfg.frame_len, 1, vision_width(cfg.vision)), jnp.float32)
        if cfg.video_encoding == "resampler":
            from x2vlm_tpu.models.resampler import PerceiverResampler

            self.resampler = PerceiverResampler(
                vision_width(cfg.vision), depth=cfg.resampler_depth,
                num_latents=cfg.resampler_latents, dtype=self.dtype)

    # ---------- embeddings ----------

    def get_vision_embeds(self, image, image_atts=None, idx_to_group_img=None,
                          deterministic: bool = True):
        """image (B, H, W, 3) → (embeds, atts[, full_embeds]).

        With `idx_to_group_img` + per-region `image_atts`, returns the region
        rows (masked avgpool cls) and full-attention rows for bbox prediction
        (reference xvlm.py:663-698). 5-D input (B, F, H, W, 3) is a video."""
        if image.ndim == 5:
            assert idx_to_group_img is None
            return self.get_frame_embeds(image, deterministic=deterministic)
        if (idx_to_group_img is not None and image_atts is not None
                and getattr(self.config.vision, "local_attn_depth", 0) > 0):
            # CLIP local-attention region path: the tower itself runs the
            # last k layers key-masked on [region ‖ full] rows (reference
            # clip_vit.py:304-335); full rows are gathered out to the region
            # batch for bbox prediction (reference xvlm.py:691-696)
            from x2vlm_tpu.core import mesh as mesh_lib

            region, full_imgs = self.vision_encoder(
                image, deterministic=deterministic,
                idx_to_group_img=idx_to_group_img, image_atts=image_atts)
            full = mesh_lib.constrain_batch(jnp.take(
                mesh_lib.constrain_replicated(full_imgs), idx_to_group_img,
                axis=0))
            return region, image_atts, full
        embeds = self.vision_encoder(image, deterministic=deterministic)
        if idx_to_group_img is None:
            atts = jnp.ones(embeds.shape[:2], jnp.int32)
            return embeds, atts
        if image_atts is None:
            from x2vlm_tpu.core import mesh as mesh_lib

            full = mesh_lib.constrain_batch(jnp.take(
                mesh_lib.constrain_replicated(embeds), idx_to_group_img,
                axis=0))
            return full, jnp.ones(full.shape[:2], jnp.int32)
        region, full = grouped_image_embeds(embeds, idx_to_group_img, image_atts)
        return region, image_atts, full

    def get_frame_embeds(self, frames, deterministic: bool = True):
        """(B, F, H, W, 3) → mean-pool over frames ('avgpool' video encoding,
        reference xvlm.py:615-645)."""
        cfg = self.config
        B, F = frames.shape[:2]
        flat = frames.reshape((B * F,) + frames.shape[2:])
        embeds = self.vision_encoder(flat, deterministic=deterministic)
        embeds = embeds.reshape((B, F) + embeds.shape[1:])  # (B, F, S+1, C)
        if cfg.video_encoding and cfg.add_frame_pos:
            embeds = embeds + self.frame_pos_embed[:, :F].astype(embeds.dtype)
        if cfg.video_encoding == "resampler":
            # fixed-size latent summary of the whole frame stream
            # (Flamingo-style; opt-in via `video_encoding: resampler`)
            pooled = self.resampler(embeds)  # (B, num_latents, C)
        else:
            pooled = jnp.mean(embeds, axis=1)  # (B, S+1, C)
        atts = jnp.ones(pooled.shape[:2], jnp.int32)
        return pooled, atts

    def get_text_embeds(self, text_ids, text_atts, deterministic: bool = True):
        return self.text_encoder(text_ids, attention_mask=text_atts, mode="text",
                                 deterministic=deterministic)

    def get_cross_embeds(self, image_embeds, image_atts, text_ids=None,
                         text_embeds=None, text_atts=None,
                         deterministic: bool = True,
                         encoder_gather_idx=None):
        assert text_atts is not None
        # Pad the KV stream to %8 ONCE here instead of per fusion layer: the
        # attention kernels need 8-aligned KV (Mosaic sublane tiling), and
        # padding the 197-token image stream inside every layer's K/V wrapper
        # cost ~1.4 ms/step of pure HBM copies at the base pretrain shapes
        # (profiled). Padded rows carry attention-mask zeros; the fusion
        # output is query-side only, so they never reach any consumer.
        pad = 0 if image_embeds is None else (-image_embeds.shape[1]) % 8
        if pad:
            image_embeds = jnp.pad(image_embeds, ((0, 0), (0, pad), (0, 0)))
            image_atts = jnp.pad(image_atts, ((0, 0), (0, pad)))
        if text_embeds is not None:
            return self.text_encoder(
                encoder_embeds=text_embeds, attention_mask=text_atts,
                encoder_hidden_states=image_embeds,
                encoder_attention_mask=image_atts,
                mode="fusion", deterministic=deterministic,
                encoder_gather_idx=encoder_gather_idx)
        assert text_ids is not None
        return self.text_encoder(
            text_ids, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts,
            mode="multi_modal", deterministic=deterministic,
            encoder_gather_idx=encoder_gather_idx)

    def get_features(self, image_embeds=None, text_embeds=None):
        """Normalized CLS projections (fp32)."""
        if image_embeds is None:
            t = self.text_proj(text_embeds[:, 0, :].astype(jnp.float32))
            return t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        if text_embeds is None:
            i = self.vision_proj(image_embeds[:, 0, :].astype(jnp.float32))
            return i / jnp.linalg.norm(i, axis=-1, keepdims=True)
        return (self.get_features(image_embeds=image_embeds),
                self.get_features(text_embeds=text_embeds))

    def get_temp(self):
        cfg = self.config
        if cfg.fix_temp:
            return jnp.asarray(cfg.temp, jnp.float32)
        # Clamp in-graph (reference clamps the parameter each step,
        # Pretrain.py:328; the optimizer also projects — see train/optim.py).
        return jnp.clip(self.temp, 0.001, 0.5)

    # ---------- losses ----------

    def get_contrastive_loss(self, image_feat, text_feat, idx=None):
        """In-batch ITC over the *global* batch. Under pjit the feature
        matmul's all_gather is inserted by XLA (reference xvlm.py:794-826).

        Each direction gets its own row-batch-sharded logits matmul: the
        (B, B, D) FLOPs are negligible next to the encoders, and pinning both
        row layouts keeps the softmax + backward shard-local instead of
        resharding logits.T (SPMD involuntary-remat hazard)."""
        from x2vlm_tpu.core import mesh as mesh_lib

        temp = self.get_temp()
        logits = mesh_lib.constrain_batch(image_feat @ text_feat.T) / temp
        logits_t = mesh_lib.constrain_batch(text_feat @ image_feat.T) / temp
        bsz = logits.shape[0]
        if idx is None:
            labels = jnp.arange(bsz)
            loss_i2t = cross_entropy(logits, labels)
            loss_t2i = cross_entropy(logits_t, labels)
        else:
            idx = idx.reshape(-1, 1)
            # pos is symmetric, so its per-row normalization serves both
            # directions unchanged
            pos = (idx == idx.T).astype(jnp.float32)
            soft_labels = pos / jnp.sum(pos, axis=1, keepdims=True)
            logp = jax.nn.log_softmax(logits, axis=1)
            logp_t = jax.nn.log_softmax(logits_t, axis=1)
            loss_i2t = -jnp.mean(jnp.sum(logp * soft_labels, axis=1))
            loss_t2i = -jnp.mean(jnp.sum(logp_t * soft_labels, axis=1))
        return (loss_i2t + loss_t2i) / 2

    def get_hard_negatives(self, image_feat, text_feat, rng, idx=None):
        """Vectorized categorical sampling of one hard negative per row from
        the softmax-similarity distribution, excluding positives
        (reference xvlm.py:828-857, vectorized)."""
        temp = self.get_temp()
        sim_i2t = jax.lax.stop_gradient((image_feat @ text_feat.T) / temp)
        bsz = sim_i2t.shape[0]
        if idx is None:
            pos_mask = jnp.eye(bsz, dtype=bool)
        else:
            idx = idx.reshape(-1, 1)
            pos_mask = idx == idx.T
        if self.config.itm_neg_block > 0:
            blk = jnp.arange(bsz) // self.config.itm_neg_block
            pos_mask = pos_mask | (blk[:, None] != blk[None, :])
        neg_inf = jnp.asarray(-1e30, sim_i2t.dtype)
        masked_i2t = jnp.where(pos_mask, neg_inf, sim_i2t)
        masked_t2i = jnp.where(pos_mask, neg_inf, sim_i2t.T)
        rng_t, rng_i = jax.random.split(rng)
        text_neg_idx = jax.random.categorical(rng_t, masked_i2t, axis=-1)
        image_neg_idx = jax.random.categorical(rng_i, masked_t2i, axis=-1)
        return image_neg_idx, text_neg_idx

    def get_matching_loss(self, image_embeds, image_atts, image_feat,
                          text_embeds, text_atts, text_feat, rng, idx=None,
                          deterministic: bool = True):
        """ITM: 1 positive + 2 hard-negative fusion passes → 2-way head
        (reference xvlm.py:859-899)."""
        from x2vlm_tpu.core import mesh as mesh_lib

        bs = image_embeds.shape[0]
        image_neg_idx, text_neg_idx = self.get_hard_negatives(
            image_feat, text_feat, rng, idx=idx)

        # the negative takes gather arbitrary global batch rows — all-gather
        # the operands explicitly so SPMD partitions cleanly (shard-local
        # takes; no involuntary full remat)
        text_embeds_r = mesh_lib.constrain_replicated(text_embeds)
        text_atts_r = mesh_lib.constrain_replicated(text_atts)
        text_embeds_neg = jnp.take(text_embeds_r, text_neg_idx, axis=0)
        text_atts_neg = jnp.take(text_atts_r, text_neg_idx, axis=0)
        # the fusion pass gathers cross-attention K/V from the unique images:
        # hand it the image stream already replicated (one explicit
        # all-gather) so the KV projections/takes partition shard-locally
        image_embeds = mesh_lib.constrain_replicated(image_embeds)

        # One batched fusion pass over [pos ‖ (img, text_neg) ‖ (img_neg, text)].
        # Only `bs` unique images exist among the 3·bs rows — the fusion
        # layers project cross-attention K/V once per unique image and gather
        # per row (encoder_gather_idx), instead of projecting 3·bs duplicates.
        gather_idx = jnp.concatenate(
            [jnp.arange(bs), jnp.arange(bs), image_neg_idx], 0)
        image_atts_all = jnp.take(mesh_lib.constrain_replicated(image_atts),
                                  gather_idx, axis=0)
        text_all = mesh_lib.constrain_batch(jnp.concatenate(
            [text_embeds, text_embeds_neg, text_embeds], 0))
        text_atts_all = mesh_lib.constrain_batch(jnp.concatenate(
            [text_atts, text_atts_neg, text_atts], 0))

        cross = self.get_cross_embeds(image_embeds, image_atts_all,
                                      text_embeds=text_all,
                                      text_atts=text_atts_all,
                                      encoder_gather_idx=gather_idx,
                                      deterministic=deterministic)[:, 0, :]
        logits = self.itm_head(cross)
        labels = jnp.concatenate(
            [jnp.ones(bs, jnp.int32), jnp.zeros(2 * bs, jnp.int32)], 0)
        return cross_entropy(logits, labels)

    def _tied_table(self):
        if self.config.text.tie_word_embeddings:
            return self.text_encoder.embeddings.table
        return None

    def get_matching_and_mlm_loss(self, image_embeds, image_atts, image_feat,
                                  text_embeds, text_atts, text_feat,
                                  mlm_text_embeds, masked_pos, masked_ids, rng,
                                  idx=None, deterministic: bool = True):
        """ITM + MLM through ONE fusion pass (4·bs rows) instead of two
        (3·bs + bs): at pretrain batch sizes the fusion layers' tiny
        (Sq=40-ish) attention matmuls pay a fixed per-batched-element MXU
        cost, so fewer+bigger calls win. Same math as get_matching_loss +
        get_mlm_loss run separately (mode='multi_modal' ≡ text half then
        fusion half); `mlm_text_embeds` is the text-mode encoding of
        text_ids_masked. Cross-attention K/V are projected once per unique
        image and gathered per row (encoder_gather_idx)."""
        from x2vlm_tpu.core import mesh as mesh_lib

        bs = image_embeds.shape[0]
        image_neg_idx, text_neg_idx = self.get_hard_negatives(
            image_feat, text_feat, rng, idx=idx)
        # explicit all-gather of the take operands (see get_matching_loss)
        text_embeds_r = mesh_lib.constrain_replicated(text_embeds)
        text_atts_r = mesh_lib.constrain_replicated(text_atts)
        text_embeds_neg = jnp.take(text_embeds_r, text_neg_idx, axis=0)
        text_atts_neg = jnp.take(text_atts_r, text_neg_idx, axis=0)
        image_embeds = mesh_lib.constrain_replicated(image_embeds)

        ar = jnp.arange(bs)
        gather_idx = jnp.concatenate([ar, ar, image_neg_idx, ar], 0)
        image_atts_all = jnp.take(mesh_lib.constrain_replicated(image_atts),
                                  gather_idx, axis=0)
        text_all = mesh_lib.constrain_batch(jnp.concatenate(
            [text_embeds, text_embeds_neg, text_embeds, mlm_text_embeds], 0))
        text_atts_all = mesh_lib.constrain_batch(jnp.concatenate(
            [text_atts, text_atts_neg, text_atts, text_atts], 0))

        cross = self.get_cross_embeds(
            image_embeds, image_atts_all, text_embeds=text_all,
            text_atts=text_atts_all, encoder_gather_idx=gather_idx,
            deterministic=deterministic)
        itm_logits = self.itm_head(cross[:3 * bs, 0, :])
        itm_labels = jnp.concatenate(
            [jnp.ones(bs, jnp.int32), jnp.zeros(2 * bs, jnp.int32)], 0)
        loss_itm = cross_entropy(itm_logits, itm_labels)

        # labels routed into the head: tied-decoder matmul + CE fuse into
        # ops.fused_ce (no (B·M, vocab) fp32 logits materialized)
        loss_mlm = self.mlm_head(cross[3 * bs:], masked_pos=masked_pos,
                                 embedding_table=self._tied_table(),
                                 labels=masked_ids)
        return loss_itm, loss_mlm

    def get_mlm_loss(self, text_ids_masked, text_atts, image_embeds, image_atts,
                     masked_pos, masked_ids, deterministic: bool = True):
        cross = self.get_cross_embeds(
            image_embeds, image_atts, text_ids=text_ids_masked,
            text_atts=text_atts, deterministic=deterministic)
        return self.mlm_head(cross, masked_pos=masked_pos,
                             embedding_table=self._tied_table(),
                             labels=masked_ids)

    def predict_bbox(self, image_embeds, text_embeds, text_atts):
        """cross CLS → bbox head → sigmoid cxcywh (reference xvlm.py:910-925)."""
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        cls = self.get_cross_embeds(image_embeds, image_atts,
                                    text_embeds=text_embeds,
                                    text_atts=text_atts)[:, 0, :]
        return jax.nn.sigmoid(self.bbox_head(cls).astype(jnp.float32))

    def get_bbox_loss(self, output_coord, target_bbox, is_image=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """L1 + (1 - GIoU); `is_image` rows (full-image captions) are excluded
        (reference xvlm.py:927-957). Degenerate predicted boxes contribute 0
        GIoU loss per-row (the reference zeroes the whole batch's GIoU if any
        box degenerates — a coarser guard; per-row is strictly tighter)."""
        output_coord = output_coord.astype(jnp.float32)
        target_bbox = target_bbox.astype(jnp.float32)
        loss_l1 = jnp.abs(output_coord - target_bbox)  # (B, 4)
        b1 = box_ops.box_cxcywh_to_xyxy(output_coord)
        b2 = box_ops.box_cxcywh_to_xyxy(target_bbox)
        degenerate = jnp.any(b1[:, 2:] < b1[:, :2], axis=-1) | jnp.any(
            b2[:, 2:] < b2[:, :2], axis=-1)
        giou = box_ops.elementwise_generalized_box_iou(b1, b2)
        loss_giou = jnp.where(degenerate, 0.0, 1.0 - giou)  # (B,)
        if is_image is None:
            num = output_coord.shape[0]
        else:
            keep = 1.0 - is_image.astype(jnp.float32)
            num = jnp.maximum(jnp.sum(keep), 1.0)
            loss_l1 = loss_l1 * keep[:, None]
            loss_giou = loss_giou * keep
        return jnp.sum(loss_l1) / num, jnp.sum(loss_giou) / num


def make_base(config: XVLMConfig, dtype=jnp.bfloat16) -> "XVLMBase":
    """Pick XVLMBase vs XVLMPlusBase by config type, so every task head works
    on both the fused-stack model and the Plus/CCLM variant (reference
    duplicates each head for XVLM and XVLMPlus; e.g. XGQA.py:181,
    XVNLI.py:134, WIT.py:251 all instantiate Plus heads)."""
    from x2vlm_tpu.models.xvlm_plus import XVLMPlusBase, XVLMPlusConfig

    if isinstance(config, XVLMPlusConfig):
        return XVLMPlusBase(config, dtype=dtype)
    return XVLMBase(config, dtype=dtype)
