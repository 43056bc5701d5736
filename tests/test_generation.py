"""VQA rank-answer, NLVR/classification, and UniLM captioning beam search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig
from x2vlm_tpu.models.classification import XVLMForClassification, XVLMForNLVR
from x2vlm_tpu.models.captioning import XVLMForMLMCaptioning, beam_search_generate
from x2vlm_tpu.models.generation import (
    XVLMForVQA, causal_lm_loss, decoder_params_from_text_encoder,
)

MASK_ID = 4
EOS_ID = 3


def tiny_cfg():
    return XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16)


def test_causal_lm_loss_shift():
    logits = np.full((1, 3, 5), -10.0, np.float32)
    logits[0, 0, 2] = 10.0  # predicts token 2 at position 1
    logits[0, 1, 3] = 10.0
    labels = np.asarray([[1, 2, 3]])
    loss = causal_lm_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert loss.shape == (1,)
    assert float(loss[0]) < 0.01  # both shifted targets predicted perfectly
    labels_ign = np.asarray([[1, 2, -100]])
    loss2 = causal_lm_loss(jnp.asarray(logits), jnp.asarray(labels_ign))
    assert float(loss2[0]) < 0.005


def test_vqa_train_and_rank(rng):
    cfg = tiny_cfg()
    model = XVLMForVQA(cfg, num_dec_layers=2, pad_token_id=0, dtype=jnp.float32)
    B, A, Lq, La = 2, 3, 6, 4
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "question_ids": jnp.asarray(rng.integers(1, 31, (B, Lq)), jnp.int32),
        "question_atts": jnp.ones((B, Lq), jnp.int32),
        "answer_ids": jnp.asarray(rng.integers(1, 31, (A, La)), jnp.int32),
        "answer_atts": jnp.ones((A, La), jnp.int32),
        "answer_index": jnp.asarray([0, 0, 1], jnp.int32),
        "answer_weights": jnp.asarray([0.5, 0.5, 1.0], jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2))
    losses = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(float(losses["loss_vqa"]))

    # rank over an answer list of 5, k=3
    ans = jnp.asarray(rng.integers(1, 31, (5, La)), jnp.int32)
    ans_atts = jnp.ones((5, La), jnp.int32)
    pred = {"image": batch["image"], "question_ids": batch["question_ids"],
            "question_atts": batch["question_atts"], "answer_ids": ans,
            "answer_atts": ans_atts}
    topk_ids, topk_probs = model.apply(variables, pred, 3, method=model.predict)
    assert topk_ids.shape == (B, 3)
    assert np.all(np.asarray(topk_ids) < 5)
    np.testing.assert_allclose(np.asarray(topk_probs).sum(-1) <= 1.0 + 1e-5, True)


def test_decoder_params_from_text_encoder():
    base = {"text_encoder": {
        "embeddings": {"e": np.ones(1)},
        **{f"layer_{i}": {"w": np.full(1, i)} for i in range(4)}},
        "mlm_head": {"h": np.ones(1)}}
    out = decoder_params_from_text_encoder(
        base, num_text_layers=2, num_cross_layers=2, num_dec_layers=2)
    assert out["text_decoder"]["layer_0"]["w"][0] == 2
    assert out["text_decoder"]["layer_1"]["w"][0] == 3
    out2 = decoder_params_from_text_encoder(
        base, num_text_layers=2, num_cross_layers=2, num_dec_layers=1)
    assert out2["text_decoder"]["layer_0"]["w"][0] == 3  # every-other, odd layers


def test_classification_and_nlvr(rng):
    cfg = tiny_cfg()
    model = XVLMForClassification(cfg, num_labels=3, dtype=jnp.float32)
    B = 2
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(1, 31, (B, 6)), jnp.int32),
        "text_atts": jnp.ones((B, 6), jnp.int32),
        "labels": jnp.asarray([0, 2], jnp.int32),
    }
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch)
    out = model.apply(v, batch, deterministic=True)
    assert np.isfinite(float(out["loss_cls"]))
    logits = model.apply(v, batch, method=model.predict)
    assert logits.shape == (B, 3)

    nlvr = XVLMForNLVR(cfg, dtype=jnp.float32)
    nb = {
        "image0": batch["image"], "image1": batch["image"],
        "text_ids": batch["text_ids"], "text_atts": batch["text_atts"],
        "labels": jnp.asarray([0, 1], jnp.int32),
    }
    v = nlvr.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, nb)
    out = nlvr.apply(v, nb, deterministic=True)
    assert np.isfinite(float(out["loss_cls"]))


def test_classification_kd_teacher_distillation(rng):
    """answer_pred (teacher logits) switches the loss to KL distillation
    (reference model_classification.py:65-70); a teacher equal to the student
    gives ~0 loss, a different teacher gives > 0."""
    cfg = tiny_cfg()
    model = XVLMForClassification(cfg, num_labels=3, dtype=jnp.float32)
    B = 2
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(1, 31, (B, 6)), jnp.int32),
        "text_atts": jnp.ones((B, 6), jnp.int32),
        "labels": jnp.asarray([0, 2], jnp.int32),
    }
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch)
    student_logits = model.apply(v, batch, method=model.predict)
    out_self = model.apply(v, dict(batch, answer_pred=student_logits),
                           deterministic=True)
    assert abs(float(out_self["loss_cls"])) < 1e-5
    teacher = jnp.asarray(rng.standard_normal((B, 3)) * 3, jnp.float32)
    out_kd = model.apply(v, dict(batch, answer_pred=teacher),
                         deterministic=True)
    assert float(out_kd["loss_cls"]) > 0.0
    assert np.isfinite(float(out_kd["loss_cls"]))


def test_captioning_train_and_beam_search(rng):
    cfg = tiny_cfg()
    model = XVLMForMLMCaptioning(cfg, cls_token_id=2, dtype=jnp.float32)
    B, L, M = 2, 8, 3
    tril = np.tril(np.ones((L, L), np.int32))
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "text_ids_masked": jnp.asarray(rng.integers(1, 31, (B, L)), jnp.int32),
        "text_atts_matrix": jnp.asarray(np.tile(tril, (B, 1, 1))),
        "position_ids": jnp.asarray(np.tile(np.arange(L), (B, 1))),
        "masked_pos": jnp.asarray(rng.integers(1, L, (B, M)), jnp.int32),
        "masked_ids": jnp.asarray(rng.integers(1, 31, (B, M)), jnp.int32),
        "masked_weight": jnp.asarray(np.ones((B, M), np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)
    out = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(float(out["loss_caption"]))

    image = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    seqs = beam_search_generate(
        model, variables, image, prompt_ids=[2],
        mask_token_id=MASK_ID, eos_token_id=EOS_ID,
        num_beams=2, min_length=2, max_length=6)
    assert len(seqs) == 2
    for s in seqs:
        assert 1 <= len(s) <= 6
        assert all(0 <= t < 31 for t in s)

    # the fully on-device (single fori_loop dispatch) variant reproduces the
    # host-driven reference algorithm exactly
    from x2vlm_tpu.models.captioning import beam_search_generate_device
    seqs_dev = beam_search_generate_device(
        model, variables, image, prompt_ids=[2],
        mask_token_id=MASK_ID, eos_token_id=EOS_ID,
        num_beams=2, min_length=2, max_length=6)
    assert seqs_dev == seqs


def test_cached_decode_matches_full_forward(rng):
    """The indexed KV-cache step must reproduce a full causal forward."""
    cfg = tiny_cfg()
    model = XVLMForMLMCaptioning(cfg, cls_token_id=2, dtype=jnp.float32)
    B, L = 2, 8
    tril = np.tril(np.ones((6, 6), np.int32))
    init_batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "text_ids_masked": jnp.asarray(rng.integers(1, 31, (B, 6)), jnp.int32),
        "text_atts_matrix": jnp.asarray(np.tile(tril, (B, 1, 1))),
        "position_ids": jnp.asarray(np.tile(np.arange(6), (B, 1))),
        "masked_pos": jnp.zeros((B, 2), jnp.int32),
        "masked_ids": jnp.zeros((B, 2), jnp.int32),
        "masked_weight": jnp.ones((B, 2), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch)

    image = init_batch["image"]
    img_e, img_a = model.apply(variables, image, method=model.encode_image)
    ids = rng.integers(1, 31, (B, 4)).astype(np.int32)

    # full forward with tril matrix: logits at the last position
    full_tril = np.tril(np.ones((4, 4), np.int32))

    def full_fn(m, ids_):
        h = m.base.text_encoder(
            ids_, attention_matrix=jnp.asarray(np.tile(full_tril, (B, 1, 1))),
            position_ids=jnp.asarray(np.tile(np.arange(4), (B, 1))),
            encoder_hidden_states=img_e, encoder_attention_mask=img_a,
            mode="multi_modal", deterministic=True)
        return m.base.mlm_head(h[:, -1:, :],
                               embedding_table=m.base._tied_table())[:, 0, :]

    ref_logits = model.apply(variables, jnp.asarray(ids), method=full_fn)

    # cached: feed all 4 tokens in one step (index 0)
    cache = model.apply(variables, B, 8, method=model.init_cache)
    got_logits, _ = model.apply(variables, jnp.asarray(ids),
                                jnp.asarray(0, jnp.int32), cache, img_e, img_a,
                                method=model.decode_step)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)

    # cached incrementally: 3 tokens, then [token3, re-fed] at index 2...
    cache = model.apply(variables, B, 8, method=model.init_cache)
    _, cache = model.apply(variables, jnp.asarray(ids[:, :3]),
                           jnp.asarray(0, jnp.int32), cache, img_e, img_a,
                           method=model.decode_step)
    # slot 2 holds token ids[:,2]; re-feed it with the next token (UniLM style)
    got2, _ = model.apply(variables, jnp.asarray(ids[:, 2:4]),
                          jnp.asarray(2, jnp.int32), cache, img_e, img_a,
                          method=model.decode_step)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)


def test_top_k_top_p_filtering():
    from x2vlm_tpu.models.generation import top_k_top_p_filtering

    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 0.0]])
    out = np.asarray(top_k_top_p_filtering(logits, top_k=2))
    assert (out[0, [2, 3]] > -1e29).all()
    assert (out[0, [0, 1, 4]] < -1e29).all()
    # top_p keeps the smallest set with cumulative prob >= p
    probs = np.asarray([[0.5, 0.3, 0.15, 0.05]])
    out = np.asarray(top_k_top_p_filtering(jnp.log(jnp.asarray(probs)), top_p=0.7))
    assert (out[0, :2] > -1e29).all()
    assert (out[0, 2:] < -1e29).all()


def test_sample_generate(rng):
    from x2vlm_tpu.models.generation import sample_generate

    cfg = tiny_cfg()
    model = XVLMForVQA(cfg, num_dec_layers=2, pad_token_id=0, dtype=jnp.float32)
    B = 2
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "question_ids": jnp.asarray(rng.integers(1, 31, (B, 6)), jnp.int32),
        "question_atts": jnp.ones((B, 6), jnp.int32),
        "answer_ids": jnp.asarray(rng.integers(1, 31, (3, 4)), jnp.int32),
        "answer_atts": jnp.ones((3, 4), jnp.int32),
        "answer_index": jnp.asarray([0, 0, 1], jnp.int32),
        "answer_weights": jnp.ones((3,), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2))
    out = sample_generate(model, variables, batch, max_length=5,
                          bos_token_id=2, eos_token_id=EOS_ID,
                          top_k=5, rng_key=jax.random.PRNGKey(7))
    assert out.shape == (2, 5)
    assert (out >= 0).all() and (out < 31).all()
    out_g = sample_generate(model, variables, batch, max_length=5,
                            bos_token_id=2, eos_token_id=EOS_ID, greedy=True)
    out_g2 = sample_generate(model, variables, batch, max_length=5,
                             bos_token_id=2, eos_token_id=EOS_ID, greedy=True)
    np.testing.assert_array_equal(out_g, out_g2)  # greedy is deterministic
