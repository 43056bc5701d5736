"""Serving export bundles: jax.export AOT artifacts + weights, reloaded and
cross-checked against direct model.apply (x2vlm_tpu/serving.py; deployment
surface the reference lacks — its eval scripts double as the serving story)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig
from x2vlm_tpu.models.heads import XVLMForRetrieval
from x2vlm_tpu.serving import (
    export_retrieval_bundle, load_bundle, load_params_npz, save_params_npz,
)


def _tiny_retrieval(rng):
    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32),
        embed_dim=16)
    model = XVLMForRetrieval(cfg, dtype=jnp.float32)
    image = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 31, (4, 8)), jnp.int32)
    atts = jnp.ones((4, 8), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"image": image, "text_ids": ids[:2], "text_atts": atts[:2],
         "idx": jnp.zeros((2,), jnp.int32)}, rng=jax.random.PRNGKey(2))
    return model, variables, image, ids, atts


def test_export_reload_matches_model_apply(tmp_path, rng):
    model, variables, image, ids, atts = _tiny_retrieval(rng)
    arts = export_retrieval_bundle(
        model, variables, str(tmp_path), batch_images=2, batch_texts=4,
        max_tokens=8, rerank_pairs=2, platforms=["cpu"],
        config_echo={"image_res": 32})
    assert sorted(arts) == ["encode_images", "encode_texts", "itm_score"]
    for p in arts.values():
        assert os.path.getsize(p) > 0

    b = load_bundle(str(tmp_path))
    assert b.manifest["platforms"] == ["cpu"]
    assert b.manifest["batch_images"] == 2
    assert b.manifest["config"]["image_res"] == 32

    ie, fi = b.encode_images(image)
    te, ft = b.encode_texts(ids, atts)
    ie0, fi0 = model.apply(variables, image, method=model.encode_images)
    te0, ft0 = model.apply(variables, ids, atts, method=model.encode_texts)
    np.testing.assert_allclose(np.asarray(ie), np.asarray(ie0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(fi0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(te), np.asarray(te0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ft), np.asarray(ft0), atol=1e-6)

    s = b.itm_score(ie, te[:2], atts[:2])
    s0 = model.apply(variables, ie0, te0[:2], atts[:2],
                     method=model.itm_score)
    assert s.shape == (2,)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), atol=1e-6)


def test_params_npz_roundtrip(tmp_path, rng):
    model, variables, *_ = _tiny_retrieval(rng)
    p = str(tmp_path / "params.npz")
    save_params_npz(p, variables)
    back = load_params_npz(p)
    la = jax.tree_util.tree_leaves_with_path(variables)
    lb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(la) == len(lb)
    for k, v in la:
        w = lb[jax.tree_util.keystr(k)]
        assert v.dtype == w.dtype
        np.testing.assert_array_equal(np.asarray(v), np.asarray(w))


def test_export_weights_are_arguments_not_constants(tmp_path, rng):
    """The .jexp artifacts must stay small (program only): a weight swap must
    not require re-export — scores change when params.npz changes."""
    model, variables, image, ids, atts = _tiny_retrieval(rng)
    export_retrieval_bundle(model, variables, str(tmp_path), batch_images=2,
                            batch_texts=4, max_tokens=8, rerank_pairs=2,
                            platforms=["cpu"])
    b = load_bundle(str(tmp_path))
    ie1, _ = b.encode_images(image)
    # perturb one weight and reload the SAME programs with the new weights
    v2 = jax.tree_util.tree_map(lambda x: x * 1.01, variables)
    save_params_npz(str(tmp_path / "params.npz"), v2)
    b2 = load_bundle(str(tmp_path))
    ie2, _ = b2.encode_images(image)
    assert not np.allclose(np.asarray(ie1), np.asarray(ie2))
    # artifact size sanity: far below the weights (program-only)
    n_bytes = sum(np.asarray(x).nbytes
                  for x in jax.tree_util.tree_leaves(variables))
    art = os.path.getsize(tmp_path / "encode_images.jexp")
    assert art < n_bytes / 2


def test_sharded_export_multi_device(tmp_path, rng):
    """Multi-chip serving: export with an 8-device data mesh (params
    replicated, batches sharded), reload with a matching mesh, outputs match
    the single-device model.apply on the global batch."""
    from jax.sharding import Mesh

    model, variables, image, ids, atts = _tiny_retrieval(rng)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    image8 = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    ids8 = jnp.concatenate([ids, ids], 0)
    atts8 = jnp.concatenate([atts, atts], 0)

    export_retrieval_bundle(model, variables, str(tmp_path), batch_images=8,
                            batch_texts=8, max_tokens=8, rerank_pairs=8,
                            platforms=["cpu"], mesh=mesh)
    b = load_bundle(str(tmp_path), mesh=mesh)
    assert b.manifest["nr_devices"] == 8

    ie, fi = b.encode_images(image8)
    ie0, fi0 = model.apply(variables, image8, method=model.encode_images)
    np.testing.assert_allclose(np.asarray(ie), np.asarray(ie0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(fi0), atol=1e-5)
    te, _ = b.encode_texts(ids8, atts8)
    s = b.itm_score(ie, te, atts8)
    s0 = model.apply(variables, ie0,
                     model.apply(variables, ids8, atts8,
                                 method=model.encode_texts)[0], atts8,
                     method=model.itm_score)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), atol=1e-5)

    # loading a multi-device bundle without a mesh fails loudly
    import pytest

    with pytest.raises(ValueError, match="exported for 8 devices"):
        load_bundle(str(tmp_path))


def test_captioning_bundle_matches_beam_search(tmp_path, rng):
    """The exported one-program beam search reproduces
    beam_search_generate_device exactly; length_penalty stays a serve-time
    knob (host traceback)."""
    from x2vlm_tpu.models.captioning import (
        XVLMForMLMCaptioning, beam_search_generate_device,
    )
    from x2vlm_tpu.serving import (
        export_captioning_bundle, load_captioning_bundle,
    )

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32),
        embed_dim=16)
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
    image = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    kw = dict(prompt_ids=[2], mask_token_id=4, eos_token_id=3,
              num_beams=2, min_length=2, max_length=6)

    export_captioning_bundle(model, variables, str(tmp_path), batch=2,
                             platforms=["cpu"], **kw)
    b = load_captioning_bundle(str(tmp_path))
    assert b.manifest["eos_token_id"] == 3 and b.manifest["batch"] == 2

    want = beam_search_generate_device(model, variables, image, [2],
                                       mask_token_id=4, eos_token_id=3,
                                       num_beams=2, min_length=2,
                                       max_length=6)
    got = b.generate(image)
    assert got == want
    # length_penalty applies at serve time without re-export
    got_lp = b.generate(image, length_penalty=2.0)
    want_lp = beam_search_generate_device(model, variables, image, [2],
                                          mask_token_id=4, eos_token_id=3,
                                          num_beams=2, min_length=2,
                                          max_length=6, length_penalty=2.0)
    assert got_lp == want_lp


def test_vqa_bundle_matches_predict(tmp_path, rng):
    from x2vlm_tpu.models.generation import XVLMForVQA
    from x2vlm_tpu.serving import export_vqa_bundle, load_vqa_bundle

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32),
        embed_dim=16)
    model = XVLMForVQA(cfg, num_dec_layers=2, pad_token_id=0,
                       dtype=jnp.float32)
    B, Q, NA, AL = 2, 6, 5, 4
    image = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)
    q_ids = jnp.asarray(rng.integers(1, 31, (B, Q)), jnp.int32)
    q_atts = jnp.ones((B, Q), jnp.int32)
    ans_ids = jnp.asarray(rng.integers(1, 31, (NA, AL)), jnp.int32)
    ans_atts = jnp.ones((NA, AL), jnp.int32)
    train_batch = {"image": image, "question_ids": q_ids,
                   "question_atts": q_atts, "answer_ids": ans_ids[:B],
                   "answer_atts": ans_atts[:B],
                   "answer_weights": jnp.ones((B,), jnp.float32),
                   "answer_index": jnp.arange(B, dtype=jnp.int32)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        train_batch)

    export_vqa_bundle(model, variables, str(tmp_path), batch=B,
                      question_len=Q, n_answers=NA, answer_len=AL, k_test=3,
                      platforms=["cpu"])
    b = load_vqa_bundle(str(tmp_path))
    assert b.manifest["k_test"] == 3
    topk, scores = b.rank(image, q_ids, q_atts, ans_ids, ans_atts)
    batch_d = {"image": image, "question_ids": q_ids, "question_atts": q_atts,
               "answer_ids": ans_ids, "answer_atts": ans_atts}
    topk0, scores0 = model.apply(variables, batch_d, 3, method=model.predict)
    np.testing.assert_array_equal(np.asarray(topk), np.asarray(topk0))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores0),
                               atol=1e-5)


def test_grounding_bundle_matches_predict(tmp_path, rng):
    from x2vlm_tpu.models.grounding import XVLMForGrounding
    from x2vlm_tpu.serving import export_grounding_bundle, load_grounding_bundle

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32),
        embed_dim=16)
    model = XVLMForGrounding(cfg, dtype=jnp.float32)
    B, T = 2, 6
    image = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 31, (B, T)), jnp.int32)
    atts = jnp.ones((B, T), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {"image": image, "text_ids": ids, "text_atts": atts,
         "target_bbox": jnp.full((B, 4), 0.5, jnp.float32)})

    export_grounding_bundle(model, variables, str(tmp_path), batch=B,
                            max_tokens=T, platforms=["cpu"])
    b = load_grounding_bundle(str(tmp_path))
    assert b.manifest["artifacts"] == ["predict_bbox"]
    box = b.predict(image, ids, atts)
    box0 = model.apply(variables, image, ids, atts, method=model.predict)
    assert box.shape == (B, 4)
    arr = np.asarray(box)
    assert (arr >= 0).all() and (arr <= 1).all()  # sigmoid cxcywh
    np.testing.assert_allclose(arr, np.asarray(box0), atol=1e-6)


def test_export_cli_all_tasks(tmp_path):
    """tools/export_serving.py --task retrieval|captioning|vqa|grounding
    produce loadable bundles from a tiny YAML config."""
    import subprocess
    import sys as _sys

    import yaml as _yaml

    tok_dir = tmp_path / "bert-tiny"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(
        "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the".split()))
    (tok_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizerFast", "do_lower_case": True}))
    cfg = {
        "image_res": 32,
        "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2},
        "text_encoder": str(tok_dir),
        "text_num_hidden_layers": 4,
        "text_fusion_start_at": 2,
        "text_config_inline": {"vocab_size": 14, "hidden_size": 32,
                               "num_heads": 2, "intermediate_size": 64},
        "embed_dim": 16, "max_tokens": 8, "answer_max_tokens": 4,
        "num_dec_layers": 2, "max_length": 4, "min_length": 1,
        "num_beams": 2,
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(_yaml.safe_dump(cfg))
    env = dict(os.environ)
    for task, extra in (("retrieval", ["--batch_texts", "4"]),
                        ("captioning", []),
                        ("vqa", ["--n_answers", "5", "--k_test", "3"]),
                        ("grounding", [])):
        out = tmp_path / f"bundle_{task}"
        r = subprocess.run(
            [_sys.executable, "tools/export_serving.py", "--task", task,
             "--config", str(cfg_path), "--out", str(out),
             "--batch_images", "2", "--platform", "cpu"] + extra,
            capture_output=True, text=True, timeout=900,
            env=dict(env, JAX_PLATFORMS="", PYTHONPATH=env.get(
                "PYTHONPATH", "")))
        assert r.returncode == 0, r.stderr[-2000:]
        assert (out / "manifest.json").exists()
        assert (out / "params.npz").exists()
