"""UniLM-style MLM captioning (reference models/model_generation.py:53-397
XVLMForMLMCaptioning, after microsoft/unilm s2s-ft).

Training: masked caption with a *triangular* (B, L, L) attention matrix and
label-smoothed CE over masked slots, normalized by mask weights
(reference :90-111; dataset preprocessing captioning_dataset.py:99-140).

Generation: step-wise [MASK]-append beam search. TPU redesign (SURVEY §7.3
hard part 4): the reference's growing ``history_states`` become fixed-size
per-layer K/V caches (static shapes → exactly two compiled step functions:
prompt step and token step); beam bookkeeping (top-k merge, back-pointers,
EOS freezing, n-gram blocking, length penalty) runs host-side in numpy exactly
as the reference's (:196-397), with cache reordering as one jitted gather.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.models.bert import BertEncoder, BertMLMHead
from x2vlm_tpu.models.xvlm import XVLMBase, XVLMConfig, make_base

__all__ = ["XVLMForMLMCaptioning", "beam_search_generate",
           "beam_search_generate_device"]


class XVLMForMLMCaptioning(nn.Module):
    config: XVLMConfig
    label_smoothing: float = 0.1
    cls_token_id: int = 101  # ignored label (dataset never masks CLS; reference :74-76)
    dtype: Any = jnp.bfloat16

    def setup(self):
        base_cfg = dataclasses.replace(
            self.config, use_contrastive=False, use_matching=False,
            use_mlm=True, use_bbox=False)
        self.base = make_base(base_cfg, dtype=self.dtype)

    def __call__(self, batch, rng=None, deterministic=False):
        """Standard training loss; with ``sample_weights`` (B,) in the batch,
        the loss becomes the SCST policy gradient: per-row mean NLL over the
        masked slots (no smoothing) weighted by the row's advantage
        (reward − baseline), averaged over the batch."""
        base = self.base
        image_embeds, image_atts = base.get_vision_embeds(
            batch["image"], deterministic=deterministic)
        hidden = base.text_encoder(
            batch["text_ids_masked"],
            attention_matrix=batch["text_atts_matrix"],
            position_ids=batch.get("position_ids"),
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts,
            mode="multi_modal", deterministic=deterministic)
        labels = jnp.where(batch["masked_weight"] > 0, batch["masked_ids"], -100)
        labels = jnp.where(labels == self.cls_token_id, -100, labels)
        # labels routed into the head: the tied-decoder vocab matmul and the
        # CE fuse (ops.fused_ce — no (B·M, vocab) fp32 logits materialized)
        if batch.get("sample_weights") is not None:
            # SCST policy gradient: per-row mean NLL (no smoothing) weighted
            # by the row's advantage, averaged over the batch — expressed as
            # one weighted sum: w[b,m] = valid/row_count * advantage[b]/B
            valid = labels != -100
            row_count = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1)
            w = valid.astype(jnp.float32) / row_count.astype(jnp.float32) * (
                batch["sample_weights"].astype(jnp.float32)[:, None]
                / labels.shape[0])
            loss = base.mlm_head(hidden, masked_pos=batch["masked_pos"],
                                 embedding_table=base._tied_table(),
                                 labels=labels, label_weights=w)
            return {"loss_scst": loss}
        loss = base.mlm_head(hidden, masked_pos=batch["masked_pos"],
                             embedding_table=base._tied_table(),
                             labels=labels,
                             label_smoothing=self.label_smoothing)
        return {"loss_caption": loss}

    # ---- decoding primitives (jitted by beam_search_generate) ----

    def encode_image(self, image):
        return self.base.get_vision_embeds(image, deterministic=True)

    def init_cache(self, batch_size: int, max_len: int):
        cfg = self.config.text
        head_dim = cfg.hidden_size // cfg.num_heads
        return [
            {"k": jnp.zeros((batch_size, cfg.num_heads, max_len, head_dim),
                            self.dtype),
             "v": jnp.zeros((batch_size, cfg.num_heads, max_len, head_dim),
                            self.dtype),
             "index": jnp.asarray(0, jnp.int32)}
            for _ in range(cfg.num_layers)
        ]

    def decode_step(self, x_ids, index, cache, image_embeds, image_atts):
        """Run [tokens..., MASK] (static length) at positions index..index+T-1;
        K/V written into the cache at those slots. Returns (logits of the last
        slot, new cache)."""
        T = x_ids.shape[1]
        pos = index + jnp.arange(T)
        cache = [dict(c, index=index) for c in cache]
        hidden, new_cache = self.base.text_encoder(
            x_ids, position_ids=pos,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts,
            mode="multi_modal", cache=cache, deterministic=True)
        logits = self.base.mlm_head(
            hidden[:, -1:, :],
            embedding_table=self.base._tied_table())[:, 0, :]
        return logits, new_cache


def _first_expand(x, K):
    return jnp.repeat(x, K, axis=0)


def beam_search_generate_device(
    model: "XVLMForMLMCaptioning",
    variables,
    image: jnp.ndarray,
    prompt_ids: List[int],
    *,
    mask_token_id: int,
    eos_token_id: int,
    num_beams: int = 3,
    min_length: int = 5,
    max_length: int = 20,
    length_penalty: float = 0.0,
    forbid_duplicate_ngrams: bool = True,
    ngram_size: int = 3,
) -> List[List[int]]:
    """Fully on-device beam search: the entire decode (steps × [decode,
    top-K×K merge, EOS freezing, n-gram blocking, cache reorder]) is ONE
    jitted ``lax.fori_loop`` — a single dispatch instead of one host
    round-trip per generated token (the host-driven variant below matches
    the reference algorithm op-for-op and is kept for cross-checking).
    Same bookkeeping as reference model_generation.py:196-397; traceback
    runs host-side on the fetched (steps, B, K) histories."""
    B = image.shape[0]
    K = num_beams
    P = len(prompt_ids)
    Lmax = P + max_length + 1
    steps = max_length  # number of emitted frames

    # The jitted program is cached per (model, search statics): a fresh
    # closure per call would re-trace/compile on every eval batch.
    run = _device_search_cache(
        model, B, K, tuple(prompt_ids), mask_token_id, eos_token_id,
        min_length, max_length, forbid_duplicate_ngrams, ngram_size)

    ids_hist, ptr_hist, score_hist = run(variables, image)
    step_ids = list(np.asarray(ids_hist))
    step_back_ptrs = list(np.asarray(ptr_hist))
    total_scores = list(np.asarray(score_hist))
    return _trace_back(B, step_ids, step_back_ptrs, total_scores,
                       eos_token_id, length_penalty)


def sample_generate_captioning(
    model: "XVLMForMLMCaptioning",
    variables,
    image: jnp.ndarray,
    prompt_ids: List[int],
    rng: jax.Array,
    *,
    mask_token_id: int,
    eos_token_id: int,
    num_samples: int = 1,
    max_length: int = 20,
    temperature: float = 1.0,
) -> List[List[int]]:
    """Categorical sampling decode for SCST (reward rollouts): one on-device
    fori_loop dispatch, ``num_samples`` rollouts per image. After EOS the
    rollout is frozen (EOS repeats). Returns B·num_samples token lists in
    image-major order (capability beyond the reference, whose --scst flag is
    dead code — Captioning_MLM.py:272)."""
    B = image.shape[0]
    run = _device_sample_cache(model, B, num_samples, tuple(prompt_ids),
                               mask_token_id, eos_token_id, max_length,
                               float(temperature))
    seqs = np.asarray(run(variables, image, rng))
    out: List[List[int]] = []
    for row in seqs:
        toks = []
        for t in row.tolist():
            if t == eos_token_id:
                break
            toks.append(int(t))
        out.append(toks)
    return out


@functools.lru_cache(maxsize=32)
def _device_sample_cache(model, B, K, prompt_ids, mask_token_id,
                         eos_token_id, max_length, temperature):
    prompt_ids = list(prompt_ids)
    P = len(prompt_ids)
    Lmax = P + max_length + 1
    steps = max_length

    @jax.jit
    def run(variables, image, rng):
        img_embeds, img_atts = model.apply(variables, image,
                                           method=model.encode_image)
        img_embeds = _first_expand(img_embeds, K)
        img_atts = _first_expand(img_atts, K)
        N = B * K
        cache = model.apply(variables, N, Lmax, method=model.init_cache)

        x0 = jnp.tile(jnp.asarray(prompt_ids + [mask_token_id], jnp.int32),
                      (N, 1))
        logits, cache = model.apply(variables, x0, jnp.asarray(0, jnp.int32),
                                    cache, img_embeds, img_atts,
                                    method=model.decode_step)
        k0 = jax.random.categorical(
            jax.random.fold_in(rng, 0),
            logits.astype(jnp.float32) / temperature, axis=-1).astype(jnp.int32)
        seqs = jnp.zeros((N, steps), jnp.int32).at[:, 0].set(k0)
        done = k0 == eos_token_id

        def body(t, carry):
            cache, seqs, done = carry
            curr = seqs[:, t - 1][:, None]
            x = jnp.concatenate(
                [curr, jnp.full((N, 1), mask_token_id, jnp.int32)], 1)
            logits, cache = model.apply(
                variables, x, P + t - 1, cache, img_embeds, img_atts,
                method=model.decode_step)
            draw = jax.random.categorical(
                jax.random.fold_in(rng, t),
                logits.astype(jnp.float32) / temperature,
                axis=-1).astype(jnp.int32)
            tok = jnp.where(done, eos_token_id, draw)
            seqs = seqs.at[:, t].set(tok)
            done = done | (tok == eos_token_id)
            return cache, seqs, done

        _, seqs, _ = jax.lax.fori_loop(1, steps, body, (cache, seqs, done))
        return seqs

    return run


@functools.lru_cache(maxsize=32)
def _device_search_cache(model, B, K, prompt_ids, mask_token_id,
                         eos_token_id, min_length, max_length,
                         forbid_duplicate_ngrams, ngram_size):
    prompt_ids = list(prompt_ids)
    P = len(prompt_ids)
    Lmax = P + max_length + 1
    steps = max_length

    @jax.jit
    def run(variables, image):
        img_embeds, img_atts = model.apply(variables, image,
                                           method=model.encode_image)
        cache = model.apply(variables, B, Lmax, method=model.init_cache)

        # frame 0: [prompt..., MASK] at positions 0..P
        x0 = jnp.tile(jnp.asarray(prompt_ids + [mask_token_id], jnp.int32),
                      (B, 1))
        logits, cache = model.apply(variables, x0, jnp.asarray(0, jnp.int32),
                                    cache, img_embeds, img_atts,
                                    method=model.decode_step)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        if min_length >= 1:
            logp = logp.at[:, eos_token_id].set(-10000.0)
        k_scores, k_ids = jax.lax.top_k(logp, K)              # (B, K)

        cache = jax.tree_util.tree_map(
            lambda a: _first_expand(a, K) if a.ndim > 0 else a, cache)
        img_embeds_k = _first_expand(img_embeds, K)
        img_atts_k = _first_expand(img_atts, K)

        # histories (steps, B, K); sequence buffer (B*K, steps)
        ids_hist = jnp.zeros((steps, B, K), jnp.int32).at[0].set(k_ids)
        ptr_hist = jnp.zeros((steps, B, K), jnp.int32)
        score_hist = jnp.zeros((steps, B, K), jnp.float32).at[0].set(k_scores)
        eos_hist = jnp.zeros((steps, B, K), jnp.bool_).at[0].set(
            k_ids == eos_token_id)
        seqs = jnp.zeros((B * K, steps), jnp.int32).at[:, 0].set(
            k_ids.reshape(-1))

        def body(t, carry):
            (cache, seqs, ids_hist, ptr_hist, score_hist, eos_hist) = carry
            curr = seqs[:, t - 1][:, None]                    # (B*K, 1)
            x = jnp.concatenate(
                [curr, jnp.full((B * K, 1), mask_token_id, jnp.int32)], 1)
            logits, new_cache = model.apply(
                variables, x, P + t - 1, cache, img_embeds_k, img_atts_k,
                method=model.decode_step)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

            if forbid_duplicate_ngrams and ngram_size >= 2:
                # block w that would complete a repeated n-gram: for every
                # earlier window seqs[i : i+n-1] equal to the current tail,
                # forbid seqs[i+n-1]. Static loop over the buffer; windows
                # whose continuation slot >= t are masked out (also covers
                # early t, where the clamped tail slice is bogus but no i
                # passes the bound).
                n1 = ngram_size - 1
                tail = jax.lax.dynamic_slice(
                    seqs, (0, jnp.maximum(t - n1, 0)), (B * K, n1))
                forbid = jnp.zeros((B * K, V), jnp.float32)
                for i in range(steps - n1):
                    win = jax.lax.dynamic_slice(seqs, (0, i), (B * K, n1))
                    match = jnp.all(win == tail, axis=-1) & (i + n1 < t)
                    forbid = forbid + jnp.where(
                        match, 1.0, 0.0)[:, None] * jax.nn.one_hot(
                            seqs[:, i + n1], V)
                logp = logp - jnp.minimum(forbid, 1.0) * 10000.0

            if min_length:
                eos_col = jnp.arange(V)[None, :] == eos_token_id
                logp = jnp.where(eos_col & (t + 1 <= min_length), -10000.0,
                                 logp)

            kk_scores, kk_idx = jax.lax.top_k(logp, K)        # (B*K, K)
            last_eos = eos_hist[t - 1].reshape(B * K, 1)
            last_scores = score_hist[t - 1].reshape(B * K, 1)
            kk_scores = kk_scores + jnp.where(last_eos, -10000.0, 0.0) + \
                last_scores
            kk_scores = kk_scores.reshape(B, K * K)
            kk_ids = kk_idx.reshape(B, K * K)
            k_scores, sel = jax.lax.top_k(kk_scores, K)       # (B, K)
            back_ptrs = sel // K
            k_ids = jnp.take_along_axis(kk_ids, sel, axis=-1)

            flat_ptrs = (jnp.arange(B)[:, None] * K + back_ptrs).reshape(-1)
            new_cache = jax.tree_util.tree_map(
                lambda a: jnp.take(a, flat_ptrs, axis=0) if a.ndim > 0 else a,
                new_cache)
            seqs = jnp.take(seqs, flat_ptrs, axis=0).at[:, t].set(
                k_ids.reshape(-1))

            ids_hist = ids_hist.at[t].set(k_ids)
            ptr_hist = ptr_hist.at[t].set(back_ptrs)
            score_hist = score_hist.at[t].set(k_scores)
            eos_hist = eos_hist.at[t].set(k_ids == eos_token_id)
            return (new_cache, seqs, ids_hist, ptr_hist, score_hist, eos_hist)

        carry = (cache, seqs, ids_hist, ptr_hist, score_hist, eos_hist)
        carry = jax.lax.fori_loop(1, steps, body, carry)
        _, _, ids_hist, ptr_hist, score_hist, eos_hist = carry
        return ids_hist, ptr_hist, score_hist

    return run


def _trace_back(B, step_ids, step_back_ptrs, total_scores, eos_token_id,
                length_penalty) -> List[List[int]]:
    """Shared host-side best-sequence traceback (reference :330-375)."""
    outputs = []
    for b in range(B):
        scores = [t[b] for t in total_scores]
        wids_list = [t[b] for t in step_ids]
        ptrs = [t[b] for t in step_back_ptrs]
        last_frame_id = len(scores) - 1
        for i, wids in enumerate(wids_list):
            if all(int(w) == eos_token_id for w in wids):
                last_frame_id = i
                break
        max_score, frame_id, pos_in_frame = -math.inf, -1, -1
        for fid in range(last_frame_id + 1):
            for i, wid in enumerate(wids_list[fid]):
                if int(wid) == eos_token_id or fid == last_frame_id:
                    s = float(scores[fid][i])
                    if length_penalty > 0:
                        s /= math.pow((5 + fid + 1) / 6.0, length_penalty)
                    if s > max_score:
                        max_score, frame_id, pos_in_frame = s, fid, i
        if frame_id == -1:
            outputs.append([0])
            continue
        seq = [int(wids_list[frame_id][pos_in_frame])]
        for fid in range(frame_id, 0, -1):
            pos_in_frame = int(ptrs[fid][pos_in_frame])
            seq.append(int(wids_list[fid - 1][pos_in_frame]))
        seq.reverse()
        if seq and seq[-1] == eos_token_id:
            seq = seq[:-1]
        outputs.append(seq)
    return outputs


def beam_search_generate(
    model: XVLMForMLMCaptioning,
    variables,
    image: jnp.ndarray,
    prompt_ids: List[int],
    *,
    mask_token_id: int,
    eos_token_id: int,
    num_beams: int = 3,
    min_length: int = 5,
    max_length: int = 20,
    length_penalty: float = 0.0,
    forbid_duplicate_ngrams: bool = True,
    ngram_size: int = 3,
) -> List[List[int]]:
    """Returns generated token-id sequences (without prompt)."""
    B = image.shape[0]
    K = num_beams
    P = len(prompt_ids)
    Lmax = P + max_length + 1

    enc = jax.jit(lambda v, img: model.apply(v, img, method=model.encode_image))
    img_embeds, img_atts = enc(variables, image)

    step = jax.jit(
        lambda v, x, i, c, ie, ia: model.apply(v, x, i, c, ie, ia,
                                               method=model.decode_step))
    reorder = jax.jit(
        lambda c, idx: jax.tree_util.tree_map(
            lambda a: jnp.take(a, idx, axis=0) if a.ndim > 0 else a, c))

    cache = model.apply(variables, B, Lmax, method=model.init_cache)

    # first step: [CLS + prompt..., MASK] at positions 0..P
    x0 = np.tile(np.asarray(prompt_ids + [mask_token_id], np.int32), (B, 1))
    logits, cache = step(variables, jnp.asarray(x0), jnp.asarray(0, jnp.int32),
                         cache, img_embeds, img_atts)
    log_scores = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    log_scores = np.array(log_scores)  # (B, V), writable copy

    total_scores, beam_masks, step_ids, step_back_ptrs = [], [], [], []
    partial_seqs: List[List[int]] = []

    if min_length >= 1:
        log_scores[:, eos_token_id] = -10000.0
    kk = np.argsort(-log_scores, axis=-1)[:, :K]              # (B, K)
    k_ids = kk
    k_scores = np.take_along_axis(log_scores, kk, axis=-1)
    back_ptrs = np.zeros((B, K), np.int64)
    step_ids.append(k_ids); step_back_ptrs.append(back_ptrs)
    beam_masks.append((k_ids == eos_token_id).astype(np.float32))
    total_scores.append(k_scores)
    partial_seqs = [[int(k_ids[b, k])] for b in range(B) for k in range(K)]

    # expand everything to B*K
    cache = jax.tree_util.tree_map(
        lambda a: _first_expand(a, K) if a.ndim > 0 else a, cache)
    img_embeds_k = _first_expand(img_embeds, K)
    img_atts_k = _first_expand(img_atts, K)

    next_pos = P + 1
    forbid_word_mask = None
    while next_pos < P + max_length:
        curr = np.asarray([s[-1] for s in partial_seqs], np.int32).reshape(B * K, 1)
        x = np.concatenate([curr, np.full((B * K, 1), mask_token_id, np.int32)], 1)
        logits, cache = step(variables, jnp.asarray(x),
                             jnp.asarray(next_pos - 1, jnp.int32),
                             cache, img_embeds_k, img_atts_k)
        log_scores = np.array(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))  # (B*K, V)
        if forbid_word_mask is not None:
            log_scores += forbid_word_mask * -10000.0
        if min_length and (next_pos - P + 1 <= min_length):
            log_scores[:, eos_token_id] = -10000.0

        kk_idx = np.argsort(-log_scores, axis=-1)[:, :K]       # (B*K, K)
        kk_scores = np.take_along_axis(log_scores, kk_idx, axis=-1)
        last_eos = beam_masks[-1].reshape(B * K, 1)
        last_seq_scores = total_scores[-1].reshape(B * K, 1)
        kk_scores = kk_scores + last_eos * -10000.0 + last_seq_scores
        kk_scores = kk_scores.reshape(B, K * K)
        kk_ids_flat = kk_idx.reshape(B, K * K)
        sel = np.argsort(-kk_scores, axis=-1)[:, :K]           # (B, K)
        k_scores = np.take_along_axis(kk_scores, sel, axis=-1)
        back_ptrs = sel // K
        k_ids = np.take_along_axis(kk_ids_flat, sel, axis=-1)

        step_back_ptrs.append(back_ptrs)
        step_ids.append(k_ids)
        beam_masks.append((k_ids == eos_token_id).astype(np.float32))
        total_scores.append(k_scores)

        # reorder caches by back-pointers
        flat_ptrs = (np.arange(B)[:, None] * K + back_ptrs).reshape(-1)
        cache = reorder(cache, jnp.asarray(flat_ptrs))

        new_partial = []
        for b in range(B):
            for k in range(K):
                new_partial.append(
                    partial_seqs[int(back_ptrs[b, k]) + b * K] + [int(k_ids[b, k])])
        partial_seqs = new_partial

        if forbid_duplicate_ngrams and len(partial_seqs[0]) >= ngram_size:
            V = log_scores.shape[-1]
            buf = np.zeros((B * K, V), np.float32)
            any_dup = False
            for bk, seq in enumerate(partial_seqs):
                tail = seq[-(ngram_size - 1):] if ngram_size > 1 else []
                for i in range(len(seq) - (ngram_size - 1)):
                    if seq[i:i + ngram_size - 1] == tail:
                        buf[bk, seq[i + ngram_size - 1]] = 1.0
                        any_dup = True
            forbid_word_mask = buf if any_dup else None
        next_pos += 1

    # trace back best sequences (reference :330-375)
    return _trace_back(B, step_ids, step_back_ptrs, total_scores,
                       eos_token_id, length_penalty)
