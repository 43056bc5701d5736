"""BERT-family text / fusion / decoder stack.

Capability parity with the reference's forked HF BERT (models/xbert.py, 1688
LoC) and RoBERTa/XLM-R fork (models/xroberta.py), redesigned as one flax
module on the shared attention core:

- ``mode='text'``   runs layers [0, fusion_layer)            (xbert.py:674-676)
- ``mode='fusion'`` runs layers [fusion_layer, N) on given embeddings, with
  cross-attention K/V projected from the vision width       (xbert.py:677-686,236-238)
- ``mode='multi_modal'`` runs all layers                     (xbert.py:674-686)
- cross-attention exists only in layers >= fusion_layer      (xbert.py:559-562)
- decoder mode: causal self-attention + per-layer KV cache covering both the
  HF past_key_value path and the UniLM history_states cache  (xbert.py:349-359)
- MLM head computes logits only at masked positions (masked_pos gather,
  xbert.py:1591-1673), with the optional embedding_dim bottleneck
  (xbert.py:789-814)

RoBERTa/XLM-R reuse this module with ``position_offset=2`` (pos ids start at
padding_idx+1, xroberta.py:1296) and type_vocab_size=1.

The fp16 Q-prescale trick (xbert.py:364-369) is intentionally absent: bf16 has
fp32 exponent range, so the overflow it guards against cannot occur.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2vlm_tpu.ops.fused_ce import (
    fused_vocab_ce, fused_vocab_ce_weighted, softmax_ce,
)
from x2vlm_tpu.ops.layers import (
    ACTIVATIONS, DropPath, FusedLayerNorm, Mlp, MultiHeadAttention,
    checkpoint_policy, gelu_exact,
)

__all__ = ["BertConfig", "BertEncoder", "BertMLMHead", "drop_path_schedule"]


def drop_path_schedule(cfg: "BertConfig"):
    """Per-layer stochastic-depth rates: linspace(0, text_rate) over the text
    layers then linspace(0, cross_rate) over the fusion layers — exactly the
    reference's dpr_text + dpr_cross (xbert.py:643-648)."""
    import numpy as np

    n_text = min(cfg.fusion_layer, cfg.num_layers)
    n_cross = cfg.num_layers - n_text
    dpr_text = np.linspace(0.0, cfg.text_drop_path_rate, n_text)
    dpr_cross = np.linspace(0.0, cfg.cross_drop_path_rate, n_cross)
    return [float(r) for r in list(dpr_text) + list(dpr_cross)]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 18           # text_num_hidden_layers (includes fusion)
    fusion_layer: int = 12         # text_fusion_start_at
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    encoder_width: int = 768       # width of cross-attention KV source (vision)
    ln_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attn_dropout: float = 0.1
    position_offset: int = 0       # 2 for RoBERTa/XLM-R
    act: str = "gelu"              # "gelu" (erf; HF parity) | "gelu_fast"
    remat: bool = False            # gradient checkpointing per layer
    remat_policy: Optional[str] = None  # None/"full" | "dots" | "dots_saveable"
    quant_int8: bool = False       # serving: int8 W8A8 projections/FFN
    embedding_dim: Optional[int] = None  # MLM head bottleneck (CCLM)
    tie_word_embeddings: bool = True     # MLM decoder shares the embedding
                                         # matrix (HF BERT default; the
                                         # reference trains tied)
    is_decoder: bool = False       # causal self-attention (generation stacks)
    # Stochastic depth (reference xbert.py:633-650): separate linspace
    # schedules over the text layers [0, fusion_layer) and the fusion/cross
    # layers [fusion_layer, num_layers); the per-layer rate drop-paths the
    # self-attn, cross-attn, and FFN residual branches (xbert.py:425-430,
    # 509-514). Shipped refcoco_grounding_large.yaml trains with 0.1/0.1.
    text_drop_path_rate: float = 0.0
    cross_drop_path_rate: float = 0.0

    def __post_init__(self):
        if self.text_drop_path_rate > 0:
            # reference xbert.py:637-641: text drop-path requires cross
            # drop-path and replaces hidden dropout entirely ("fixed").
            if not self.cross_drop_path_rate > 0:
                raise ValueError(
                    "text_drop_path_rate > 0 requires cross_drop_path_rate > 0 "
                    "(reference xbert.py:638)")
            object.__setattr__(self, "hidden_dropout", 0.0)

    @classmethod
    def bert_base(cls, num_layers=18, fusion_layer=12, encoder_width=768, **kw):
        return cls(num_layers=num_layers, fusion_layer=fusion_layer,
                   encoder_width=encoder_width, **kw)

    @classmethod
    def bert_large(cls, num_layers=18, fusion_layer=12, encoder_width=1024, **kw):
        # X2-VLM-large text stack: BERT-large width but 12+6 layers
        # ('bert-large-uncased-12l', reference x2vlm_large_*.yaml — built by
        # every-other-layer subsampling, xvlm.py:355)
        return cls(hidden_size=1024, num_heads=16, intermediate_size=4096,
                   num_layers=num_layers, fusion_layer=fusion_layer,
                   encoder_width=encoder_width, **kw)

    @classmethod
    def roberta_base(cls, vocab_size=250002, num_layers=12, fusion_layer=12,
                     encoder_width=768, **kw):
        # XLM-R base defaults (CCLM text encoder).
        return cls(vocab_size=vocab_size, num_layers=num_layers,
                   fusion_layer=fusion_layer, encoder_width=encoder_width,
                   max_position_embeddings=514, type_vocab_size=1,
                   position_offset=2, **kw)


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        dtype=self.dtype, param_dtype=jnp.float32)
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size, dtype=self.dtype,
                                            param_dtype=jnp.float32)
        self.token_type_embeddings = nn.Embed(cfg.type_vocab_size,
                                              cfg.hidden_size, dtype=self.dtype,
                                              param_dtype=jnp.float32)
        self.ln = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                               param_dtype=jnp.float32)
        self.dropout = nn.Dropout(cfg.hidden_dropout)

    @property
    def table(self):
        """The (V, C) embedding matrix — shared with the tied MLM decoder."""
        return self.word_embeddings.embedding

    def __call__(self, input_ids, position_ids=None, deterministic: bool = True):
        cfg = self.config
        B, S = input_ids.shape
        word = self.word_embeddings(input_ids)
        if position_ids is None:
            position_ids = jnp.arange(cfg.position_offset, cfg.position_offset + S)
        pos = self.position_embeddings(position_ids)
        if pos.ndim == 2:
            pos = pos[None]
        tok = self.token_type_embeddings(jnp.zeros((1, S), jnp.int32))
        x = word + pos + tok
        x = self.ln(x.astype(jnp.float32)).astype(self.dtype)
        if cfg.hidden_dropout > 0.0:
            x = self.dropout(x, deterministic=deterministic)
        return x


class BertLayer(nn.Module):
    """Post-LN transformer layer; optional cross-attention sublayer."""

    config: BertConfig
    has_cross: bool
    drop_path: float = 0.0         # per-layer stochastic-depth rate
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x,
        attention_mask=None,            # (B, S) 1=keep
        attention_matrix=None,          # (B, Sq, Skv) full mask (UniLM tril)
        encoder_hidden_states=None,     # (B_u, S_img, encoder_width)
        encoder_attention_mask=None,    # (B, S_img)
        causal: bool = False,
        cache=None,                     # {"k","v","index"} self-attn KV cache
        deterministic: bool = True,
        encoder_gather_idx=None,        # (B,) row of encoder_hidden_states per query row
    ):
        cfg = self.config
        # bf16-I/O LayerNorm, fp32 stats, recompute-in-backward (see
        # ops/layers.FusedLayerNorm)
        ln = lambda name: FusedLayerNorm(epsilon=cfg.ln_eps, name=name)

        attn = MultiHeadAttention(
            num_heads=cfg.num_heads,
            attn_dropout_rate=cfg.attn_dropout,
            proj_dropout_rate=cfg.hidden_dropout,
            dtype=self.dtype,
            quant=cfg.quant_int8,
            name="self_attn",
        )
        full_mask = None
        if attention_matrix is not None:
            full_mask = attention_matrix[:, None].astype(bool)
            if attention_mask is not None:
                full_mask = full_mask & attention_mask[:, None, None, :].astype(bool)
        new_cache = None
        if cache is not None:
            h, new_cache = attn(x, key_mask=attention_mask, causal=causal,
                                cache=cache, deterministic=deterministic)
        elif full_mask is not None:
            h = attn(x, mask=full_mask, deterministic=deterministic)
        else:
            h = attn(x, key_mask=attention_mask, causal=causal,
                     deterministic=deterministic)
        # stochastic depth on each residual branch: LN(drop_path(h) + x)
        # (reference xbert.py:425-430 / 509-514)
        dp = lambda name: DropPath(self.drop_path, name=name)
        h = dp("attn_dp")(h, deterministic)
        x = ln("attn_ln")((x + h).astype(self.dtype))

        # Cross-attention is *skipped* (not errored) when no image stream is
        # given — the text-only MLM path runs the full stack uni-modally
        # (reference xbert.py:595 "update: to utilize text data"). NOTE: model
        # init must therefore trace a multimodal call so cross params exist.
        if self.has_cross and encoder_hidden_states is not None:
            h = MultiHeadAttention(
                num_heads=cfg.num_heads,
                attn_dropout_rate=cfg.attn_dropout,
                proj_dropout_rate=cfg.hidden_dropout,
                dtype=self.dtype,
                quant=cfg.quant_int8,
                name="cross_attn",
            )(x, kv=encoder_hidden_states.astype(self.dtype),
              key_mask=encoder_attention_mask,
              kv_gather_idx=encoder_gather_idx, deterministic=deterministic)
            h = dp("cross_dp")(h, deterministic)
            x = ln("cross_ln")((x + h).astype(self.dtype))

        h = Mlp(hidden_dim=cfg.intermediate_size, act=ACTIVATIONS[cfg.act],
                dropout_rate=cfg.hidden_dropout, dtype=self.dtype,
                quant=cfg.quant_int8, name="mlp")(
                    x, deterministic=deterministic)
        h = dp("mlp_dp")(h, deterministic)
        x = ln("mlp_ln")((x + h).astype(self.dtype))
        if new_cache is not None:
            return x, new_cache
        return x


class BertEncoder(nn.Module):
    """The text/fusion/decoder stack. Call with mode='text'|'fusion'|'multi_modal'."""

    config: BertConfig
    add_embeddings: bool = True    # False for the standalone cross encoder (xbert.py:984-991)
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.config
        if self.add_embeddings:
            self.embeddings = BertEmbeddings(cfg, dtype=self.dtype)
        layer_cls = BertLayer
        if cfg.remat:
            # static: causal flag (5) and deterministic (7); cache decode paths
            # do not use remat (no backward during decoding)
            layer_cls = nn.remat(BertLayer, static_argnums=(6, 8),
                                 policy=checkpoint_policy(cfg.remat_policy))
        dpr = drop_path_schedule(cfg)
        self.layers = [
            layer_cls(cfg, has_cross=(i >= cfg.fusion_layer) or cfg.is_decoder,
                      drop_path=dpr[i], dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.num_layers)
        ]

    def embed(self, input_ids, deterministic: bool = True):
        return self.embeddings(input_ids, deterministic=deterministic)

    def __call__(
        self,
        input_ids=None,
        attention_mask=None,
        attention_matrix=None,     # (B, Sq, Skv) full mask (UniLM training)
        position_ids=None,
        encoder_embeds=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        mode: str = "multi_modal",
        causal: bool = False,
        cache=None,                # list[dict] per executed layer, or None
        deterministic: bool = True,
        encoder_gather_idx=None,   # unique-KV dedup (see BertLayer)
    ):
        cfg = self.config
        if mode == "fusion":
            lo, hi = cfg.fusion_layer, cfg.num_layers
            if encoder_embeds is None:
                raise ValueError("mode='fusion' requires encoder_embeds")
            x = encoder_embeds.astype(self.dtype)
        else:
            lo, hi = 0, (cfg.fusion_layer if mode == "text" else cfg.num_layers)
            if encoder_embeds is not None:
                x = encoder_embeds.astype(self.dtype)
            else:
                x = self.embeddings(input_ids, position_ids=position_ids,
                                    deterministic=deterministic)

        causal = causal or cfg.is_decoder
        new_caches = [] if cache is not None else None
        for li, i in enumerate(range(lo, hi)):
            layer = self.layers[i]
            layer_cache = cache[li] if cache is not None else None
            out = layer(
                x, attention_mask, attention_matrix, encoder_hidden_states,
                encoder_attention_mask, causal, layer_cache, deterministic,
                encoder_gather_idx,
            )
            if layer_cache is not None:
                x, layer_new_cache = out
                new_caches.append(layer_new_cache)
            else:
                x = out
        if cache is not None:
            return x, new_caches
        return x


class BertMLMHead(nn.Module):
    """transform(dense+gelu+LN) → vocab decoder; logits only at masked slots
    when masked_pos is given (reference xbert.py:789-827,1591-1673).

    With ``labels`` the head returns the scalar MLM loss instead of logits;
    on the tied-decoder path the decoder matmul and the cross-entropy fuse
    into ops.fused_ce, which never materializes the (B·M, vocab) fp32 logits
    (the reference pays torch F.cross_entropy's full-logits round trips).
    ``label_smoothing`` (static float) selects the smoothed-CE form
    (reference model_generation.py:16-50); ``label_weights`` (same shape as
    labels, fp32) switches the reduction to a plain weighted SUM — rows to
    drop must carry weight 0 — which expresses the SCST advantage-weighted
    loss without a second vocab pass."""

    config: BertConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, masked_pos=None, embedding_table=None,
                 labels=None, label_weights=None, label_smoothing=0.0):
        cfg = self.config
        if masked_pos is not None:
            # (B, M) gather before the vocab matmul — the reference's key
            # optimization for MLM cost (xbert.py:1633-1640).
            hidden = jnp.take_along_axis(
                hidden, masked_pos[:, :, None].astype(jnp.int32), axis=1
            )
        dim = cfg.embedding_dim or cfg.hidden_size
        h = nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="transform_dense")(hidden)
        h = gelu_exact(h)
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="transform_ln")(
                             h.astype(jnp.float32)).astype(self.dtype)
        if embedding_table is not None:
            # tied decoder: logits = h @ E^T + b (HF weight tying; gradients
            # flow into the shared embedding matrix)
            bias = self.param("decoder_bias", nn.initializers.zeros,
                              (cfg.vocab_size,), jnp.float32)
            if labels is not None:
                flat_h = h.reshape(-1, dim)
                flat_labels = labels.reshape(-1)
                if label_weights is not None:
                    return fused_vocab_ce_weighted(
                        flat_h, embedding_table, bias, flat_labels,
                        label_weights.reshape(-1), label_smoothing)
                if label_smoothing:
                    valid = flat_labels != -100
                    w = valid.astype(jnp.float32) / jnp.maximum(
                        jnp.sum(valid), 1)
                    return fused_vocab_ce_weighted(
                        flat_h, embedding_table, bias, flat_labels, w,
                        label_smoothing)
                return fused_vocab_ce(
                    flat_h, embedding_table, bias, flat_labels,
                    jnp.ones(flat_labels.shape, bool))
            logits = h @ embedding_table.astype(self.dtype).T + \
                bias.astype(self.dtype)
        else:
            logits = nn.Dense(cfg.vocab_size, dtype=self.dtype,
                              param_dtype=jnp.float32, name="decoder")(h)
            if labels is not None:
                if label_weights is not None or label_smoothing:
                    from x2vlm_tpu.models.generation import (
                        label_smoothing_loss,
                    )
                    if label_weights is not None:
                        logits = logits.astype(jnp.float32)
                        logp = jax.nn.log_softmax(logits, axis=-1)
                        v = logits.shape[-1]
                        safe = jnp.clip(labels, 0, v - 1)
                        nll = -jnp.take_along_axis(
                            logp, safe[..., None], axis=-1)[..., 0]
                        row = (1.0 - label_smoothing) * nll
                        if label_smoothing:
                            row = row + label_smoothing * (
                                -jnp.mean(logp, axis=-1))
                        return jnp.sum(label_weights * row)
                    return label_smoothing_loss(
                        logits.astype(jnp.float32), labels,
                        smoothing=label_smoothing)
                return softmax_ce(logits.astype(jnp.float32), labels)
        return logits.astype(jnp.float32)
