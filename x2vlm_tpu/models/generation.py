"""Generation heads (reference models/model_generation.py).

- ``XVLMForVQA``: encoder–decoder. Question runs through the multimodal
  encoder; a causal decoder (all layers cross-attend to question states)
  scores/generates answers. Inference is *rank-as-generation*: first-token
  probs over the answer list → top-k prune → full-sequence chain-rule rerank
  (reference :409-619). The decoder stack is initialized from the fusion
  layers via ``decoder_params_from_text_encoder`` (reference does state-dict
  surgery at load, :454-512).
- ``LabelSmoothingLoss`` for UniLM captioning (reference :16-88).

The per-row Python loops of the reference's rank_answer are replaced by
vectorized gather/top_k (static shapes; one decoder call per stage).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2vlm_tpu.models.bert import BertConfig, BertEncoder, BertMLMHead
from x2vlm_tpu.models.xvlm import XVLMBase, XVLMConfig, make_base

__all__ = ["XVLMForVQA", "causal_lm_loss", "decoder_params_from_text_encoder",
           "label_smoothing_loss", "top_k_top_p_filtering", "sample_generate"]


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                   ignore_index: int = -100) -> jnp.ndarray:
    """Next-token CE summed per sample (HF BertLMHeadModel reduction='none'
    semantics: shift, per-token CE, per-sample sum). logits (B, L, V),
    labels (B, L) — label[t] is the target for position t (already aligned to
    inputs; shifting happens here)."""
    logits = logits[:, :-1, :].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0), axis=-1)  # (B,)


def label_smoothing_loss(logits, labels, smoothing=0.1, ignore_index=-100):
    """Smoothed CE averaged over valid positions (reference
    model_generation.py:16-50)."""
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


class XVLMForVQA(nn.Module):
    config: XVLMConfig
    num_dec_layers: int = 6
    pad_token_id: int = 0
    dtype: Any = jnp.bfloat16

    def setup(self):
        base_cfg = dataclasses.replace(
            self.config, use_contrastive=False, use_matching=False,
            use_mlm=False, use_bbox=False)
        self.base = make_base(base_cfg, dtype=self.dtype)
        tcfg = self.config.text
        dec_cfg = dataclasses.replace(
            tcfg, num_layers=self.num_dec_layers, fusion_layer=0,
            encoder_width=tcfg.hidden_size, is_decoder=True)
        self.dec_cfg = dec_cfg
        self.text_decoder = BertEncoder(dec_cfg, dtype=self.dtype)
        self.dec_head = BertMLMHead(dec_cfg, dtype=self.dtype)

    def encode_question(self, image, text_ids, text_atts, deterministic=True):
        image_embeds, image_atts = self.base.get_vision_embeds(
            image, deterministic=deterministic)
        states = self.base.get_cross_embeds(
            image_embeds, image_atts, text_ids=text_ids, text_atts=text_atts,
            deterministic=deterministic)
        return states

    def decode_logits(self, answer_ids, answer_atts, question_states,
                      question_atts, deterministic=True):
        h = self.text_decoder(
            answer_ids, attention_mask=answer_atts,
            encoder_hidden_states=question_states,
            encoder_attention_mask=question_atts,
            causal=True, deterministic=deterministic)
        table = self.text_decoder.embeddings.table \
            if self.dec_cfg.tie_word_embeddings else None
        return self.dec_head(h, embedding_table=table)

    def __call__(self, batch, rng=None, deterministic=False):
        """Training: batch has image, question_{ids,atts}, answer_{ids,atts}
        aligned 1:1 with questions via `answer_index` (each question's k
        answers are flattened rows; reference tiles question states by k)."""
        states = self.encode_question(batch["image"], batch["question_ids"],
                                      batch["question_atts"],
                                      deterministic=deterministic)
        q_states = jnp.take(states, batch["answer_index"], axis=0)
        q_atts = jnp.take(batch["question_atts"], batch["answer_index"], axis=0)
        answer_ids = batch["answer_ids"]
        targets = jnp.where(answer_ids == self.pad_token_id, -100, answer_ids)
        logits = self.decode_logits(answer_ids, batch["answer_atts"], q_states,
                                    q_atts, deterministic=deterministic)
        per_answer = causal_lm_loss(logits, targets)  # (num_answers,)
        loss = jnp.sum(batch["answer_weights"] * per_answer) / batch["image"].shape[0]
        return {"loss_vqa": loss}

    def rank_answer(self, question_states, question_atts, answer_ids,
                    answer_atts, k: int):
        """(reference model_generation.py:562-619, vectorized.)

        question_states (Q, Lq, C); answer_ids (A, La) — the tokenized answer
        list, row 0's first token is BOS. Returns (topk_ids (Q, k), topk_probs)."""
        num_q = question_states.shape[0]
        bos = jnp.broadcast_to(answer_ids[0, :1], (num_q, 1))
        logits0 = self.decode_logits(bos, jnp.ones_like(bos), question_states,
                                     question_atts)[:, 0, :]
        probs0 = jax.nn.softmax(logits0.astype(jnp.float32), axis=-1)
        first_tok = answer_ids[:, 1]
        prob_first = probs0[:, first_tok]                     # (Q, A)
        topk_probs, topk_ids = jax.lax.top_k(prob_first, k)   # (Q, k)

        flat = topk_ids.reshape(-1)                            # (Q*k,)
        input_ids = jnp.take(answer_ids, flat, axis=0)
        input_atts = jnp.take(answer_atts, flat, axis=0)
        targets = jnp.where(input_ids == self.pad_token_id, -100, input_ids)
        q_states = jnp.repeat(question_states, k, axis=0)
        q_atts = jnp.repeat(question_atts, k, axis=0)
        logits = self.decode_logits(input_ids, input_atts, q_states, q_atts)
        answer_loss = causal_lm_loss(logits, targets).reshape(num_q, k)

        # chain-rule rerank: log(first-token prob) + sequence log-prob
        log_probs_sum = jnp.log(topk_probs) - answer_loss
        probs = jax.nn.softmax(log_probs_sum, axis=-1)
        topk_probs2, rerank = jax.lax.top_k(probs, k)
        topk_ids2 = jnp.take_along_axis(topk_ids, rerank, axis=1)
        return topk_ids2, topk_probs2

    def predict(self, batch, k: int):
        states = self.encode_question(batch["image"], batch["question_ids"],
                                      batch["question_atts"])
        return self.rank_answer(states, batch["question_atts"],
                                batch["answer_ids"], batch["answer_atts"], k)


def decoder_params_from_text_encoder(base_params: Dict, *, num_text_layers: int,
                                     num_cross_layers: int, num_dec_layers: int
                                     ) -> Dict:
    """Build text_decoder params from a pretrained text encoder's fusion
    layers (reference load surgery, model_generation.py:454-512): decoder
    layer j ← text layer (num_text_layers + j) [or every other layer when
    num_dec_layers == num_cross_layers // 2]. Embeddings + MLM head transfer
    as-is (decoder head ← mlm head)."""
    text = base_params["text_encoder"]
    out = {"embeddings": text["embeddings"]}
    if num_dec_layers == num_cross_layers:
        src = [num_text_layers + j for j in range(num_dec_layers)]
    elif num_dec_layers == num_cross_layers // 2:
        src = [num_text_layers + 2 * j + 1 for j in range(num_dec_layers)]
    else:
        raise ValueError("initialization not implemented")
    for j, s in enumerate(src):
        out[f"layer_{j}"] = text[f"layer_{s}"]
    head = base_params.get("mlm_head")
    return {"text_decoder": out, "dec_head": head} if head else {"text_decoder": out}


def top_k_top_p_filtering(logits: jnp.ndarray, top_k: int = 0,
                          top_p: float = 1.0) -> jnp.ndarray:
    """Filter logits to the top-k / nucleus top-p set (reference
    xbert.py:1521 top_k_top_p_filtering). logits (B, V) fp32."""
    neg = jnp.asarray(-1e30, logits.dtype)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep first)
        cutoff_mask = cum - probs > top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.asarray(jnp.inf, logits.dtype),
                      sorted_logits), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff_logit, neg, logits)
    return logits


def sample_generate(model: "XVLMForVQA", variables, batch, *, max_length: int,
                    bos_token_id: int, eos_token_id: int, pad_token_id: int = 0,
                    temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
                    greedy: bool = False, rng_key=None):
    """Autoregressive decoding with the causal decoder + static KV cache
    (reference xbert.py:1427 _generate_no_beam_search). Returns (B, max_length)
    token ids, PAD after EOS."""
    import numpy as np

    B = batch["image"].shape[0]
    cfg = model.dec_cfg if hasattr(model, "dec_cfg") else None
    tcfg = model.config.text
    head_dim = tcfg.hidden_size // tcfg.num_heads

    states = model.apply(variables, batch["image"], batch["question_ids"],
                         batch["question_atts"], method=model.encode_question)
    q_atts = batch["question_atts"]

    cache = [
        {"k": jnp.zeros((B, tcfg.num_heads, max_length, head_dim), jnp.bfloat16),
         "v": jnp.zeros((B, tcfg.num_heads, max_length, head_dim), jnp.bfloat16),
         "index": jnp.asarray(0, jnp.int32)}
        for _ in range(model.num_dec_layers)
    ]

    def dec_step(v, tok, index, cache):
        def fn(m, tok_, index_, cache_):
            cache_ = [dict(c, index=index_) for c in cache_]
            h, new_cache = m.text_decoder(
                tok_, position_ids=index_ + jnp.arange(1),
                encoder_hidden_states=states, encoder_attention_mask=q_atts,
                cache=cache_, deterministic=True)
            table = m.text_decoder.embeddings.table \
                if m.dec_cfg.tie_word_embeddings else None
            return m.dec_head(h[:, -1, :], embedding_table=table), new_cache

        return model.apply(v, tok, index, cache, method=fn)

    step_jit = jax.jit(dec_step)
    rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    tok = jnp.full((B, 1), bos_token_id, jnp.int32)
    out = np.full((B, max_length), pad_token_id, np.int64)
    done = np.zeros(B, bool)
    for t in range(max_length):
        logits, cache = step_jit(variables, tok, jnp.asarray(t, jnp.int32), cache)
        logits = logits.astype(jnp.float32) / max(temperature, 1e-6)
        if greedy:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            logits = top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p)
            rng_key, sub = jax.random.split(rng_key)
            nxt = jax.random.categorical(sub, logits, axis=-1)
        nxt = np.asarray(nxt)
        nxt = np.where(done, pad_token_id, nxt)
        out[:, t] = nxt
        done |= nxt == eos_token_id
        if done.all():
            break
        tok = jnp.asarray(nxt[:, None].astype(np.int32))
    return out
