"""End-to-end smoke for VQA / NLVR / grounding / captioning task loops."""

import json
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from x2vlm_tpu.data import (
    CaptioningEvalDataset, CaptioningTrainDataset, GroundingEvalDataset,
    GroundingTrainDataset, MapLoader, NLVRDataset, TextPreprocessor,
    VQAEvalDataset, VQATrainDataset, tokenize_answers, vqa_collate,
)
from x2vlm_tpu.data import transforms as T
from x2vlm_tpu.evalkit import grounding_eval_bbox
from x2vlm_tpu.models import (
    BEiT2Config, BertConfig, XVLMConfig, XVLMForGrounding,
    XVLMForMLMCaptioning, XVLMForNLVR, XVLMForVQA,
)
from x2vlm_tpu.tasks import (
    evaluate_classification, evaluate_vqa, generate_captions, predict_grounding,
)
from x2vlm_tpu.train import (
    create_optimizer, create_train_state, lr_schedule, make_train_step,
)

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy river bank small big red blue green house tree "
    "yes no one two three"
).split()


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("ft")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)
    rng = np.random.default_rng(0)
    img_dir = d / "imgs"
    img_dir.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 56, 3), np.uint8)).save(
            img_dir / f"im{i}.png")
    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=len(VOCAB), hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16)
    return d, tok, str(img_dir), cfg


def test_vqa_task(env):
    d, tok, img_dir, cfg = env
    ann = [{"image": f"im{i}.png", "question": "one or two dog",
            "answer": ["yes", "no", "yes"], "question_id": i} for i in range(4)]
    (d / "vqa_train.json").write_text(json.dumps(ann))
    (d / "answers.json").write_text(json.dumps(["yes", "no", "one", "two"]))

    pre = TextPreprocessor(tok, max_tokens=8)
    train = VQATrainDataset(str(d / "vqa_train.json"), T.test_transform(32),
                            img_dir, pre, tok, answer_max_tokens=5,
                            rng=random.Random(0))
    samples = [train[i] for i in range(2)]
    batch = vqa_collate(samples, answers_per_batch=6)
    assert batch["answer_ids"].shape == (6, 5)
    assert batch["answer_index"].shape == (6,)

    model = XVLMForVQA(cfg, num_dec_layers=2, pad_token_id=tok.pad_token_id,
                       dtype=jnp.float32)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jb)
    tx = create_optimizer(variables["params"], lr_schedule(1e-3, 10))
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False)
    state, metrics = step(state, jb, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_vqa"]))

    ev = VQAEvalDataset(str(d / "vqa_train.json"), T.test_transform(32),
                        img_dir, pre, tok,
                        answer_list_file=str(d / "answers.json"),
                        answer_max_tokens=5)
    results = evaluate_vqa(model, {"params": state.params}, ev,
                           ev.answer_list, ev.answer_ids, ev.answer_atts,
                           k_test=3, batch_size=2)
    assert len(results) == 4
    assert all(r["answer"] in ev.answer_list for r in results)


def test_nlvr_task(env):
    d, tok, img_dir, cfg = env
    ann = [{"images": [f"im{i}.png", f"im{(i+1) % 4}.png"],
            "sentence": "the dog runs", "label": "True" if i % 2 else "False"}
           for i in range(4)]
    (d / "nlvr.json").write_text(json.dumps(ann))
    pre = TextPreprocessor(tok, max_tokens=8)
    ds = NLVRDataset(str(d / "nlvr.json"), T.test_transform(32), img_dir, pre)
    model = XVLMForNLVR(cfg, dtype=jnp.float32)
    batch = jax.tree_util.tree_map(
        jnp.asarray, MapLoader(ds, 4, num_workers=1, shuffle=False,
                               drop_last=False).__iter__().__next__())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)
    out = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(float(out["loss_cls"]))
    metrics = evaluate_classification(model, variables, ds, batch_size=2)
    assert metrics["n"] == 4
    assert 0 <= metrics["accuracy"] <= 100


def test_grounding_task(env):
    d, tok, img_dir, cfg = env
    ann = [{"image": f"im{i}.png", "text": "small red house",
            "bbox": [10, 8, 20, 16], "ref_id": i} for i in range(4)]
    (d / "ground.json").write_text(json.dumps(ann))
    pre = TextPreprocessor(tok, max_tokens=8)
    train = GroundingTrainDataset(str(d / "ground.json"),
                                  T.box_transform(rng=random.Random(0)),
                                  img_dir, pre, image_res=32,
                                  rng=random.Random(0))
    s = train[0]
    assert s["target_bbox"].shape == (4,)
    assert (s["target_bbox"] >= 0).all() and (s["target_bbox"] <= 1).all()

    model = XVLMForGrounding(cfg, dtype=jnp.float32)
    batch = jax.tree_util.tree_map(
        jnp.asarray, MapLoader(train, 4, num_workers=1, shuffle=False,
                               drop_last=False).__iter__().__next__())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)
    out = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(float(out["loss_bbox"]))
    assert np.isfinite(float(out["loss_giou"]))

    ev = GroundingEvalDataset(str(d / "ground.json"), T.test_transform(32),
                              img_dir, pre)
    results = predict_grounding(model, variables, ev, batch_size=2)
    assert len(results) == 4
    refs = {i: {"split": "val", "bbox": [10, 8, 20, 16], "width": 56,
                "height": 40} for i in range(4)}
    metrics = grounding_eval_bbox(results, refs)
    assert "val_acc" in metrics


def test_captioning_task(env):
    d, tok, img_dir, cfg = env
    ann = [{"image": f"im{i}.png", "caption": ["the quick brown fox runs"],
            "image_id": i} for i in range(2)]
    (d / "cap.json").write_text(json.dumps(ann))
    for fg_free in (False, True):
        train = CaptioningTrainDataset(
            str(d / "cap.json"), T.test_transform(32), img_dir, tok,
            max_tokens=10, max_masks=3, fg_free=fg_free,
            rng=random.Random(0))
        s = train[0]
        L = train.seq_len
        assert s["text_ids_masked"].shape == (L,)
        assert s["text_atts_matrix"].shape == (L, L)
        assert s["position_ids"].shape == (L,)

    model = XVLMForMLMCaptioning(cfg, cls_token_id=tok.cls_token_id,
                                 dtype=jnp.float32)
    train = CaptioningTrainDataset(
        str(d / "cap.json"), T.test_transform(32), img_dir, tok,
        max_tokens=10, max_masks=3, rng=random.Random(0))
    batch = jax.tree_util.tree_map(
        jnp.asarray, MapLoader(train, 2, num_workers=1, shuffle=False,
                               drop_last=False).__iter__().__next__())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)
    out = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(float(out["loss_caption"]))

    ev = CaptioningEvalDataset(str(d / "cap.json"), T.test_transform(32), img_dir)
    results = generate_captions(model, variables, ev, tok, num_beams=2,
                                min_length=1, max_length=5, batch_size=2)
    assert len(results) == 2
    assert all(isinstance(r["caption"], str) for r in results)


def test_scst_training_step(rng):
    """SCST loop (capability beyond the reference, whose --scst flag is dead):
    sample rollouts on-device, CIDEr-D leave-one-out advantages, one
    policy-gradient step on advantage-weighted UniLM NLL."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from x2vlm_tpu.models import XVLMConfig, BEiT2Config, BertConfig
    from x2vlm_tpu.models.captioning import XVLMForMLMCaptioning
    from x2vlm_tpu.tasks.scst import scst_train_step
    from x2vlm_tpu.train import (
        create_optimizer, create_train_state, lr_schedule, make_train_step,
    )

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0,
                        attn_dropout=0.0),
        embed_dim=16)
    model = XVLMForMLMCaptioning(cfg, cls_token_id=2, dtype=jnp.float32)

    class Tok:
        mask_token_id = 4
        sep_token_id = 3
        pad_token_id = 0

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"w{t}" for t in ids if t > 4)

    B, L, M = 2, 8, 3
    tril = np.tril(np.ones((L, L), np.int32))
    init_batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "text_ids_masked": jnp.asarray(rng.integers(1, 31, (B, L)), jnp.int32),
        "text_atts_matrix": jnp.asarray(np.tile(tril, (B, 1, 1))),
        "position_ids": jnp.asarray(np.tile(np.arange(L), (B, 1))),
        "masked_pos": jnp.asarray(rng.integers(1, L, (B, M)), jnp.int32),
        "masked_ids": jnp.asarray(rng.integers(1, 31, (B, M)), jnp.int32),
        "masked_weight": jnp.ones((B, M), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch)
    tx = create_optimizer(variables["params"], lr_schedule(1e-4, 100, 10))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, donate=False)

    images = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)
    refs = [["w10 w11 w12"], ["w13 w14"]]
    p0 = state.params
    state, metrics, captions = scst_train_step(
        model, state, step_fn, images, refs, Tok(), jax.random.PRNGKey(5),
        prompt_ids=[2], num_samples=3, max_length=5)
    assert len(captions) == B * 3
    assert np.isfinite(float(metrics["loss_scst"]))
    # a finite update was applied to the params
    flat = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, state.params))
    assert all(np.isfinite(d) for d in flat)
