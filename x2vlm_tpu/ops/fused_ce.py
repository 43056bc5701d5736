"""Fused vocabulary cross-entropy: the tied-decoder matmul and the softmax
cross-entropy loss in one pass that never materializes the (N, vocab) fp32
logits array.

The reference computes MLM loss as `decoder(h) -> CrossEntropyLoss`
(/root/reference/models/xbert.py:1591-1673 + torch F.cross_entropy), which on
TPU costs several full HBM round trips over a ~100 MB fp32 logits tensor
(materialize, max, sub/exp, sum, gather — then the same again for the
backward). Here the vocab axis is processed in static chunks: the forward
streams a running (max, sumexp, label-logit, logit-sum) tuple across chunks,
the backward recomputes each chunk's logits from the saved activations and
emits that chunk's gradient contributions immediately. FLOPs roughly +1/3
(the logits matmul runs twice: forward + backward-recompute) in exchange for
never touching an O(N*V) fp32 buffer — a win whenever the op is HBM-bound,
which the pretrain-step profile shows it is (STATUS.md round-3 breakdown:
~7 ms convert/reduce bucket on a ~108 ms step).

The core (`fused_vocab_ce_weighted`) is a per-row *weighted sum* with
optional label smoothing, which covers every vocab-CE in the model family:

- MLM mean CE (pretrain ITM+MLM, TLM):         weights = valid / count
- label-smoothed caption/seq2seq CE
  (reference model_generation.py:16-50):       weights = valid / count, s>0
- SCST policy gradient (advantage-weighted
  per-row mean NLL, tasks/scst.py):            weights = adv[row]/row_count/B

Everything is static-shape: the chunk boundaries are Python ints, the loop is
unrolled at trace time (4-6 matmuls), so there is exactly one compilation and
XLA is free to fuse each chunk's epilogue into its matmul.

Documented deviation — smoothing mass: the smoothed term here spreads the
smoothing mass s uniformly over all V classes (loss += s * (lse - mean
logit)), matching this repo's pre-existing label_smoothing_loss. The
reference's LabelSmoothingLoss (model_generation.py:16-50) instead spreads
s/(V-2), excluding the ignored/pad index from the smoothing distribution. At
V = 30522 the per-token difference is O(s/V) ≈ 3e-6 nats — far below the
±0.3-pt parity gate — but exact torch caption-loss equality would need the
V-2 form.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Vocab chunk width. 7680 = 60 * 128 keeps the lane dimension MXU-aligned;
# the last chunk of an uneven vocab (30522 % 7680 != 0) is simply smaller —
# static shapes per chunk, no padding pass over the table.
_CHUNK = 7680


def softmax_ce(logits, labels, ignore_index: int = -100):
    """Plain fp32 mean CE over non-ignored labels (HF CrossEntropyLoss
    semantics; same math as models.xvlm.cross_entropy, re-hosted here so ops
    consumers avoid a models import). Materializes logits — use
    fused_vocab_ce for vocab-sized last axes."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def _chunks(v: int, chunk: int = None):
    chunk = chunk or _CHUNK
    return [(s, min(s + chunk, v)) for s in range(0, v, chunk)]


def _chunk_logits(h, table_c, bias_c):
    """(N, D) bf16 x (Vc, D) -> (N, Vc) fp32 logits for one vocab chunk."""
    logits = jax.lax.dot_general(
        h, table_c.astype(h.dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return logits + bias_c.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_vocab_ce_weighted(h, table, bias, labels, weights, smoothing=0.0):
    """``sum_i weights[i] * loss_i`` over rows of ``softmax(h @ table.T + bias)``
    where ``loss_i = (1-s)*(lse_i - logit_labels[i]) + s*(lse_i - mean_logits_i)``
    (s = ``smoothing``; the s-term is the uniform-smoothing KL surrogate,
    reference model_generation.py:16-50).

    Args:
      h: (N, D) activations (any float dtype; matmuls run in h.dtype with
         fp32 accumulation).
      table: (V, D) tied embedding/decoder table (fp32 param).
      bias: (V,) decoder bias.
      labels: (N,) int target ids. Rows to be excluded MUST carry
        ``weights == 0`` (their label is clamped into range internally; a
        zero weight zeroes both the loss and every gradient contribution).
      weights: (N,) fp32 per-row weights — encode mean/ignore/advantage
        semantics here. No gradient flows into ``weights``.
      smoothing: static Python float in [0, 1).

    Returns a scalar fp32.
    """
    loss, _ = _fwd(h, table, bias, labels, weights, smoothing)
    return loss


def _fwd(h, table, bias, labels, weights, smoothing):
    n, _ = h.shape
    v = table.shape[0]
    safe = jnp.clip(labels, 0, v - 1).astype(jnp.int32)
    weights = weights.astype(jnp.float32)

    m = jnp.full((n,), -jnp.inf, jnp.float32)
    s = jnp.zeros((n,), jnp.float32)
    lbl = jnp.zeros((n,), jnp.float32)
    logit_sum = jnp.zeros((n,), jnp.float32)
    for lo, hi in _chunks(v):
        logits = _chunk_logits(h, table[lo:hi], bias[lo:hi])
        cm = jnp.max(logits, axis=-1)
        nm = jnp.maximum(m, cm)
        s = s * jnp.exp(m - nm) + jnp.sum(jnp.exp(logits - nm[:, None]), -1)
        m = nm
        in_chunk = jnp.logical_and(safe >= lo, safe < hi)
        idx = jnp.clip(safe - lo, 0, hi - lo - 1)
        got = jnp.take_along_axis(logits, idx[:, None], axis=1)[:, 0]
        lbl = jnp.where(in_chunk, got, lbl)
        if smoothing:
            logit_sum = logit_sum + jnp.sum(logits, axis=-1)

    lse = m + jnp.log(s)
    loss_rows = (1.0 - smoothing) * (lse - lbl)
    if smoothing:
        loss_rows = loss_rows + smoothing * (lse - logit_sum / v)
    loss = jnp.sum(weights * loss_rows)
    return loss, (h, table, bias, safe, weights, lse)


def _bwd(smoothing, res, g):
    h, table, bias, safe, weights, lse = res
    n, d = h.shape
    v = table.shape[0]
    # d(loss)/d(logits[i,v]) = (softmax[i,v] - (1-s)*onehot[i,v] - s/V) * w[i]
    w = g * weights

    dh = jnp.zeros((n, d), jnp.float32)
    dtable_parts, dbias_parts = [], []
    for lo, hi in _chunks(v):
        table_c = table[lo:hi]
        logits = _chunk_logits(h, table_c, bias[lo:hi])
        p = jnp.exp(logits - lse[:, None])
        in_chunk = jnp.logical_and(safe >= lo, safe < hi)
        idx = jnp.clip(safe - lo, 0, hi - lo - 1)
        onehot = jnp.logical_and(
            in_chunk[:, None],
            idx[:, None] == jnp.arange(hi - lo)[None, :]).astype(jnp.float32)
        dl = p - (1.0 - smoothing) * onehot
        if smoothing:
            dl = dl - smoothing / v
        dl = dl * w[:, None]                    # (N, Vc) fp32
        dl_c = dl.astype(h.dtype)
        dh = dh + jax.lax.dot_general(
            dl_c, table_c.astype(h.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dtable_parts.append(jax.lax.dot_general(
            dl_c, h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dbias_parts.append(jnp.sum(dl, axis=0))

    dtable = jnp.concatenate(dtable_parts, axis=0).astype(table.dtype)
    dbias = jnp.concatenate(dbias_parts, axis=0).astype(bias.dtype)
    return dh.astype(h.dtype), dtable, dbias, None, None


fused_vocab_ce_weighted.defvjp(_fwd, _bwd)


def fused_vocab_ce(h, table, bias, labels, valid, ignore_index=-100):
    """Mean CE over valid rows of `softmax(h @ table.T + bias)` vs `labels`
    (HF CrossEntropyLoss semantics, same as models.xvlm.cross_entropy).

    ``valid`` is a (N,) bool mask ANDed with ``labels != ignore_index``; pass
    all-True when labels alone define validity. Returns a scalar fp32 loss:
    sum(nll * valid) / max(count, 1)."""
    valid = jnp.logical_and(valid, labels != ignore_index)
    count = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    weights = valid.astype(jnp.float32) / count
    return fused_vocab_ce_weighted(h, table, bias, labels, weights, 0.0)
