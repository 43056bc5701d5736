"""Image-text retrieval: training loop + the two-stage evaluation protocol.

Reference: Retrieval.py (train:218-282, evaluation:71-168, itm_eval:171-215).
TPU redesign of the eval:

- all texts/images are encoded in fixed-size jitted batches (ragged tails are
  padded then sliced — static shapes, no recompilation)
- the ITC similarity matrix is one device matmul
- ITM rerank processes `rerank_rows` query rows per jitted call, each with its
  static (rows × k_test) candidate block gathered on-device — replacing the
  reference's one-row-at-a-time Python loop (Retrieval.py:126-157)
- multi-host: each host scores a contiguous row range; merged host-side (the
  reference all_reduces full matrices; with JSON-able score blocks a gather is
  equivalent and simpler)
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["encode_corpus", "retrieval_scores", "itm_eval", "evaluate_retrieval"]


def _pad_rows(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[0] == size:
        return arr
    pad = np.zeros((size - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], 0)


def encode_corpus(model, variables, dataset, *, batch_images: int = 64,
                  batch_texts: int = 256):
    """Encode every image and text in `dataset` (RetrievalEvalDataset).
    Returns device arrays: img_embeds, img_feats, txt_embeds, txt_feats, txt_atts."""

    @jax.jit
    def enc_img(v, image):
        return model.apply(v, image, method=model.encode_images)

    @jax.jit
    def enc_txt(v, ids, atts):
        return model.apply(v, ids, atts, method=model.encode_texts)

    img_embeds, img_feats = [], []
    n_img = dataset.n_images()
    for lo in range(0, n_img, batch_images):
        idx = list(range(lo, min(lo + batch_images, n_img)))
        imgs = _pad_rows(dataset.image_batch(idx), batch_images)
        e, f = enc_img(variables, jnp.asarray(imgs))
        img_embeds.append(e[: len(idx)])
        img_feats.append(f[: len(idx)])
    img_embeds = jnp.concatenate(img_embeds, 0)
    img_feats = jnp.concatenate(img_feats, 0)

    txt_embeds, txt_feats, txt_atts = [], [], []
    n_txt = dataset.n_texts()
    for lo in range(0, n_txt, batch_texts):
        idx = list(range(lo, min(lo + batch_texts, n_txt)))
        ids, atts = dataset.text_batch(idx)
        ids = _pad_rows(ids, batch_texts)
        atts_p = _pad_rows(atts, batch_texts)
        e, f = enc_txt(variables, jnp.asarray(ids), jnp.asarray(atts_p))
        txt_embeds.append(e[: len(idx)])
        txt_feats.append(f[: len(idx)])
        txt_atts.append(jnp.asarray(atts_p[: len(idx)]))
    return (img_embeds, img_feats, jnp.concatenate(txt_embeds, 0),
            jnp.concatenate(txt_feats, 0), jnp.concatenate(txt_atts, 0))


def retrieval_scores(model, variables, img_embeds, img_feats, txt_embeds,
                     txt_feats, txt_atts, *, k_test: int,
                     rerank_rows: int = 8,
                     host_id: int = 0, num_hosts: int = 1):
    """Two-stage scores. Returns (score_i2t, score_t2i) as numpy arrays with
    -100 at non-candidate entries (reference semantics)."""
    n_img, n_txt = img_feats.shape[0], txt_feats.shape[0]
    k_i2t = min(k_test, n_txt)
    k_t2i = min(k_test, n_img)

    sims = jnp.asarray(img_feats) @ jnp.asarray(txt_feats).T  # (n_img, n_txt)

    @jax.jit
    def rerank_i2t(v, sims_rows, row_idx):
        # sims_rows: (R, n_txt); row_idx: (R,)
        _, topk = jax.lax.top_k(sims_rows, k_i2t)               # (R, k)
        img_e = jnp.take(img_embeds, row_idx, axis=0)           # (R, S, C)
        img_rep = jnp.repeat(img_e, k_i2t, axis=0)              # (R*k, S, C)
        flat = topk.reshape(-1)
        t_e = jnp.take(txt_embeds, flat, axis=0)
        t_a = jnp.take(txt_atts, flat, axis=0)
        score = model.apply(v, img_rep, t_e, t_a, method=model.itm_score)
        return topk, score.reshape(-1, k_i2t)

    @jax.jit
    def rerank_t2i(v, sims_cols, col_idx):
        _, topk = jax.lax.top_k(sims_cols, k_t2i)
        t_e = jnp.take(txt_embeds, col_idx, axis=0)
        t_a = jnp.take(txt_atts, col_idx, axis=0)
        t_rep = jnp.repeat(t_e, k_t2i, axis=0)
        a_rep = jnp.repeat(t_a, k_t2i, axis=0)
        img_e = jnp.take(img_embeds, topk.reshape(-1), axis=0)
        score = model.apply(v, img_e, t_rep, a_rep, method=model.itm_score)
        return topk, score.reshape(-1, k_t2i)

    def shard_range(n):
        step = n // num_hosts + 1
        lo = host_id * step
        return lo, min(n, lo + step)

    score_i2t = np.full((n_img, n_txt), -100.0, np.float32)
    lo, hi = shard_range(n_img)
    for r0 in range(lo, hi, rerank_rows):
        rows = np.arange(r0, min(r0 + rerank_rows, hi))
        rows_p = np.concatenate([rows, np.full(rerank_rows - len(rows), rows[-1])])
        topk, score = rerank_i2t(variables, sims[jnp.asarray(rows_p)],
                                 jnp.asarray(rows_p))
        topk, score = np.asarray(topk), np.asarray(score)
        for j, r in enumerate(rows):
            score_i2t[r, topk[j]] = score[j]

    score_t2i = np.full((n_txt, n_img), -100.0, np.float32)
    sims_t = sims.T
    lo, hi = shard_range(n_txt)
    for r0 in range(lo, hi, rerank_rows):
        rows = np.arange(r0, min(r0 + rerank_rows, hi))
        rows_p = np.concatenate([rows, np.full(rerank_rows - len(rows), rows[-1])])
        topk, score = rerank_t2i(variables, sims_t[jnp.asarray(rows_p)],
                                 jnp.asarray(rows_p))
        topk, score = np.asarray(topk), np.asarray(score)
        for j, r in enumerate(rows):
            score_t2i[r, topk[j]] = score[j]

    if num_hosts > 1:
        from jax.experimental import multihost_utils

        score_i2t = merge_row_sharded(
            np.asarray(multihost_utils.process_allgather(score_i2t)), num_hosts)
        score_t2i = merge_row_sharded(
            np.asarray(multihost_utils.process_allgather(score_t2i)), num_hosts)
    return score_i2t, score_t2i


def merge_row_sharded(gathered: np.ndarray, num_hosts: int) -> np.ndarray:
    """Merge per-host score matrices by row ownership: host h computed rows
    [h*step, (h+1)*step) (``shard_range`` above), so take exactly those rows
    from its copy. (A ``max(0)`` merge would also work today because
    non-candidate entries are -100 and itm_score outputs exceed it, but that
    is an invariant of the score head, not of the merge — ownership needs no
    such assumption.)"""
    merged = np.empty_like(gathered[0])
    n = merged.shape[0]
    step = n // num_hosts + 1
    for h in range(num_hosts):
        lo = h * step
        merged[lo:min(n, lo + step)] = gathered[h, lo:min(n, lo + step)]
    return merged


def itm_eval(scores_i2t: np.ndarray, scores_t2i: np.ndarray,
             txt2img: Dict[int, int], img2txt: Dict[int, list]) -> Dict[str, float]:
    """R@1/5/10 both directions + means (reference Retrieval.py:171-215)."""
    ranks = np.zeros(scores_i2t.shape[0])
    for index, score in enumerate(scores_i2t):
        inds = np.argsort(score)[::-1]
        rank = min(np.where(inds == i)[0][0] for i in img2txt[index])
        ranks[index] = rank
    tr1, tr5, tr10 = [100.0 * np.mean(ranks < k) for k in (1, 5, 10)]

    ranks = np.zeros(scores_t2i.shape[0])
    for index, score in enumerate(scores_t2i):
        inds = np.argsort(score)[::-1]
        ranks[index] = np.where(inds == txt2img[index])[0][0]
    ir1, ir5, ir10 = [100.0 * np.mean(ranks < k) for k in (1, 5, 10)]

    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    return {"txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10, "txt_r_mean": tr_mean,
            "img_r1": ir1, "img_r5": ir5, "img_r10": ir10, "img_r_mean": ir_mean,
            "r1_mean": (tr1 + ir1) / 2,  # --pick_best_r1 (Retrieval.py:365)
            "r_mean": (tr_mean + ir_mean) / 2}


def evaluate_retrieval(model, variables, dataset, *, k_test: int = 128,
                       batch_images: int = 64, batch_texts: int = 256,
                       rerank_rows: int = 8, host_id: int = 0,
                       num_hosts: int = 1) -> Dict[str, float]:
    t0 = time.time()
    enc = encode_corpus(model, variables, dataset,
                        batch_images=batch_images, batch_texts=batch_texts)
    s_i2t, s_t2i = retrieval_scores(model, variables, *enc, k_test=k_test,
                                    rerank_rows=rerank_rows,
                                    host_id=host_id, num_hosts=num_hosts)
    metrics = itm_eval(s_i2t, s_t2i, dataset.txt2img, dataset.img2txt)
    metrics["eval_seconds"] = round(time.time() - t0, 2)
    return metrics
