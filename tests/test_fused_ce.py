"""Fused vocab cross-entropy (ops/fused_ce.py): parity vs the materialized
log_softmax reference at every chunk configuration the unrolled loop can hit
(single chunk, even chunks, uneven tail), gradient parity for all three
differentiable inputs, ignore_index/valid-mask semantics, and the
BertMLMHead ``labels=`` integration (tied and untied decoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import x2vlm_tpu.ops.fused_ce as fc
from x2vlm_tpu.ops.fused_ce import (
    fused_vocab_ce, fused_vocab_ce_weighted, softmax_ce,
)


def _make(n=29, d=48, v=5003, seed=0, ignore_every=5):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(n, d), jnp.bfloat16)
    table = jnp.asarray(rng.randn(v, d) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(v) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(0, v, n), jnp.int32)
    if ignore_every:
        labels = labels.at[::ignore_every].set(-100)
    return h, table, bias, labels


def _ref_loss(h, table, bias, labels):
    # exactly what BertMLMHead's logits path + cross_entropy used to do:
    # bf16 decoder matmul, fp32 softmax/CE
    logits = (h @ table.astype(h.dtype).T + bias.astype(h.dtype))
    return softmax_ce(logits.astype(jnp.float32), labels)


@pytest.mark.parametrize("v,chunk", [
    (5003, 8192),   # single chunk (vocab < chunk)
    (4096, 1024),   # even chunks
    (5003, 1024),   # uneven tail chunk
])
def test_loss_parity(v, chunk, monkeypatch):
    monkeypatch.setattr(fc, "_CHUNK", chunk)
    h, table, bias, labels = _make(v=v)
    valid = jnp.ones(labels.shape, bool)
    got = fused_vocab_ce(h, table, bias, labels, valid)
    want = _ref_loss(h, table, bias, labels)
    assert np.isfinite(float(got))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)


def test_grad_parity(monkeypatch):
    monkeypatch.setattr(fc, "_CHUNK", 1024)
    h, table, bias, labels = _make(v=3001)
    valid = jnp.ones(labels.shape, bool)
    gf = jax.grad(lambda *a: fused_vocab_ce(*a, labels, valid),
                  argnums=(0, 1, 2))(h, table, bias)
    gr = jax.grad(lambda *a: _ref_loss(*a, labels), argnums=(0, 1, 2))(
        h, table, bias)
    for got, want in zip(gf, gr):
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        scale = max(np.abs(want).max(), 1e-6)
        assert np.abs(got - want).max() / scale < 2e-2


def test_ignore_and_valid_mask(monkeypatch):
    monkeypatch.setattr(fc, "_CHUNK", 512)
    h, table, bias, labels = _make(v=1501, ignore_every=0)
    # drop rows two ways: ignore_index in labels, False in valid — both must
    # remove the row from numerator and denominator
    labels = labels.at[0].set(-100)
    valid = jnp.ones(labels.shape, bool).at[1].set(False)
    got = fused_vocab_ce(h, table, bias, labels, valid)
    keep = np.ones(len(labels), bool)
    keep[:2] = False
    want = _ref_loss(h[keep], table, bias, labels[keep])
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)
    # all-invalid: loss 0 (count clamped to 1), grads finite zeros
    none = jnp.zeros(labels.shape, bool)
    g = jax.grad(lambda x: fused_vocab_ce(x, table, bias, labels, none))(h)
    assert float(fused_vocab_ce(h, table, bias, labels, none)) == 0.0
    assert np.all(np.asarray(g, np.float32) == 0.0)


def test_label_on_chunk_boundary(monkeypatch):
    monkeypatch.setattr(fc, "_CHUNK", 256)
    h, table, bias, _ = _make(n=6, v=1024, ignore_every=0)
    # labels at first/last index of interior chunks
    labels = jnp.asarray([0, 255, 256, 511, 512, 1023], jnp.int32)
    valid = jnp.ones((6,), bool)
    got = fused_vocab_ce(h, table, bias, labels, valid)
    want = _ref_loss(h, table, bias, labels)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)


def test_smoothed_parity(monkeypatch):
    """fused weighted+smoothed == generation.label_smoothing_loss (the
    reference's seq2seq/captioning loss, model_generation.py:16-50)."""
    from x2vlm_tpu.models.generation import label_smoothing_loss

    monkeypatch.setattr(fc, "_CHUNK", 1024)
    h, table, bias, labels = _make(v=3001)
    logits = (h @ table.astype(h.dtype).T + bias.astype(h.dtype))
    want = label_smoothing_loss(logits.astype(jnp.float32), labels,
                                smoothing=0.1)
    valid = labels != -100
    w = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    got = fused_vocab_ce_weighted(h, table, bias, labels, w, 0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)

    # grads too — the smoothing term changes d/dlogits by -s/V everywhere
    gf = jax.grad(lambda *a: fused_vocab_ce_weighted(*a, labels, w, 0.1),
                  argnums=(0, 1, 2))(h, table, bias)
    gr = jax.grad(
        lambda hh, tt, bb: label_smoothing_loss(
            (hh @ tt.astype(hh.dtype).T + bb.astype(hh.dtype)
             ).astype(jnp.float32), labels, smoothing=0.1),
        argnums=(0, 1, 2))(h, table, bias)
    for got_g, want_g in zip(gf, gr):
        got_g = np.asarray(got_g, np.float32)
        want_g = np.asarray(want_g, np.float32)
        scale = max(np.abs(want_g).max(), 1e-6)
        assert np.abs(got_g - want_g).max() / scale < 2e-2


def test_weighted_scst_form(monkeypatch):
    """Advantage-weighted per-row mean NLL (the SCST loss) expressed as one
    weighted sum matches the materialized two-pass computation."""
    monkeypatch.setattr(fc, "_CHUNK", 512)
    B, M, v = 4, 5, 1501
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(B * M, 48), jnp.bfloat16)
    table = jnp.asarray(rng.randn(v, 48) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(v) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(0, v, (B, M)), jnp.int32)
    labels = labels.at[0, 3:].set(-100).at[2, 0].set(-100)
    adv = jnp.asarray(rng.randn(B), jnp.float32)

    valid = labels != -100
    row_count = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1)
    w = valid.astype(jnp.float32) / row_count.astype(jnp.float32) * (
        adv[:, None] / B)
    got = fused_vocab_ce_weighted(h, table, bias, labels.reshape(-1),
                                  w.reshape(-1), 0.0)

    logits = (h @ table.astype(h.dtype).T + bias.astype(h.dtype)
              ).astype(jnp.float32).reshape(B, M, v)
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    row = jnp.sum(nll, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1)
    want = jnp.mean(adv * row)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3, atol=1e-5)


def test_mlm_head_smoothed_and_weighted_paths():
    """BertMLMHead labels= with smoothing / weights matches the materialized
    logits path for tied and untied decoders."""
    from x2vlm_tpu.models.bert import BertConfig, BertMLMHead
    from x2vlm_tpu.models.generation import label_smoothing_loss

    cfg = BertConfig(vocab_size=900, hidden_size=32, num_layers=2,
                     fusion_layer=1, num_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    rng = np.random.RandomState(2)
    hidden = jnp.asarray(rng.randn(2, 7, 32), jnp.bfloat16)
    masked_pos = jnp.asarray(rng.randint(0, 7, (2, 3)), jnp.int32)
    masked_ids = jnp.asarray(rng.randint(0, 900, (2, 3)), jnp.int32)
    masked_ids = masked_ids.at[0, 2].set(-100)
    table = jnp.asarray(rng.randn(900, 32) * 0.05, jnp.float32)
    weights = jnp.asarray(rng.rand(2, 3), jnp.float32) * (masked_ids != -100)

    for tied_table in (table, None):
        head = BertMLMHead(cfg)
        params = head.init(jax.random.PRNGKey(0), hidden,
                           masked_pos=masked_pos, embedding_table=tied_table)
        logits = head.apply(params, hidden, masked_pos=masked_pos,
                            embedding_table=tied_table)
        want_s = label_smoothing_loss(logits, masked_ids, smoothing=0.1)
        got_s = head.apply(params, hidden, masked_pos=masked_pos,
                           embedding_table=tied_table, labels=masked_ids,
                           label_smoothing=0.1)
        np.testing.assert_allclose(float(got_s), float(want_s), rtol=2e-3)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.where(masked_ids != -100, masked_ids, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        want_w = jnp.sum(weights * nll)
        got_w = head.apply(params, hidden, masked_pos=masked_pos,
                           embedding_table=tied_table, labels=masked_ids,
                           label_weights=weights)
        np.testing.assert_allclose(float(got_w), float(want_w), rtol=2e-3,
                                   atol=1e-5)


def test_mlm_head_labels_path_matches_logits_path():
    """BertMLMHead(labels=...) (fused) == cross_entropy(BertMLMHead(), ...)
    for both the tied-table and the untied-decoder configurations."""
    from x2vlm_tpu.models.bert import BertConfig, BertMLMHead
    from x2vlm_tpu.models.xvlm import cross_entropy

    cfg = BertConfig(vocab_size=900, hidden_size=32, num_layers=2,
                     fusion_layer=1, num_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    rng = np.random.RandomState(1)
    hidden = jnp.asarray(rng.randn(2, 7, 32), jnp.bfloat16)
    masked_pos = jnp.asarray(rng.randint(0, 7, (2, 3)), jnp.int32)
    masked_ids = jnp.asarray(rng.randint(0, 900, (2, 3)), jnp.int32)
    masked_ids = masked_ids.at[0, 2].set(-100)
    table = jnp.asarray(rng.randn(900, 32) * 0.05, jnp.float32)

    for tied_table in (table, None):
        head = BertMLMHead(cfg)
        params = head.init(jax.random.PRNGKey(0), hidden,
                           masked_pos=masked_pos, embedding_table=tied_table)
        logits = head.apply(params, hidden, masked_pos=masked_pos,
                            embedding_table=tied_table)
        want = cross_entropy(logits, masked_ids)
        got = head.apply(params, hidden, masked_pos=masked_pos,
                         embedding_table=tied_table, labels=masked_ids)
        np.testing.assert_allclose(float(got), float(want), rtol=2e-3)
