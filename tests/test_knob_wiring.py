"""Every shipped-config knob flagged by the round-4 audit now has a real
consumer: MIXED_PRECISION dtype, vision-switch exclusivity, CLIP hidden_act /
attention_dropout, optimizer/schedular selector validation, large_lr_for_dec,
start_eval, calc_image_bbox_loss, ckpt_frequent epoch saves, mixed_in_batch /
tokenized loud parity raises, length_penalty, vg_root, and video clip
combining (combine_continuous_clips / mininum_frames_before_sampling)."""

import json
import math
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.factory import (
    model_dtype, vision_config_from_yaml, xvlm_config_from_yaml,
)


def test_model_dtype_from_accelerator_block():
    assert model_dtype({}) == jnp.bfloat16
    assert model_dtype({"accelerator": {"MIXED_PRECISION": "bf16"}}) \
        == jnp.bfloat16
    # apex fp16 levels map to bf16 (TPU-native mixed precision)
    assert model_dtype({"accelerator": {"MIXED_PRECISION": "fp16"}}) \
        == jnp.bfloat16
    assert model_dtype({"accelerator": {"MIXED_PRECISION": "no"}}) \
        == jnp.float32
    with pytest.raises(ValueError, match="MIXED_PRECISION"):
        model_dtype({"accelerator": {"MIXED_PRECISION": "int8"}})


def test_vision_switches_mutually_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        vision_config_from_yaml({"image_res": 224, "use_clip_vit": True,
                                 "use_swin": True})
    with pytest.raises(ValueError, match="mutually exclusive"):
        vision_config_from_yaml({"image_res": 224, "use_beit_v2": True,
                                 "use_clip_vit": True})


def test_clip_act_and_attention_dropout_plumbed():
    """config_clipvitB.json's hidden_act / attention_dropout /
    local_attn_depth now reach (or loudly reject) the CLIP config."""
    base = {"image_res": 32, "use_clip_vit": True,
            "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                     "num_hidden_layers": 1,
                                     "num_attention_heads": 2,
                                     "intermediate_size": 64,
                                     "hidden_act": "quick_gelu",
                                     "attention_dropout": 0.1,
                                     "local_attn_depth": 0}}
    vc = vision_config_from_yaml(base)
    assert vc.act == "quick_gelu" and vc.attn_dropout_rate == 0.1

    # the two activations give different outputs on the same params
    from x2vlm_tpu.models.clip_vit import CLIPViT
    import dataclasses

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    m_q = CLIPViT(vc, dtype=jnp.float32)
    params = m_q.init(jax.random.PRNGKey(0), x)
    y_q = m_q.apply(params, x)
    m_g = CLIPViT(dataclasses.replace(vc, act="gelu"), dtype=jnp.float32)
    y_g = m_g.apply(params, x)
    assert not np.allclose(np.asarray(y_q), np.asarray(y_g))

    # local_attn_depth reaches the config; -1 (reference's off value) → 0
    la = dict(base)
    la["vision_config_inline"] = dict(base["vision_config_inline"],
                                      local_attn_depth=4)
    assert vision_config_from_yaml(la).local_attn_depth == 4
    la["vision_config_inline"] = dict(base["vision_config_inline"],
                                      local_attn_depth=-1)
    assert vision_config_from_yaml(la).local_attn_depth == 0


def test_optimizer_and_scheduler_selectors_validated():
    from x2vlm_tpu.run import make_optimizer

    params = {"w": jnp.zeros((2, 2))}
    with pytest.raises(ValueError, match="optimizer.opt"):
        make_optimizer({"optimizer": {"opt": "sgd"}}, params, 10,
                       fusion_layer=0)
    with pytest.raises(ValueError, match="schedular.sched"):
        make_optimizer({"schedular": {"sched": "cosine"}}, params, 10,
                       fusion_layer=0)
    # accepted spellings
    make_optimizer({"optimizer": {"opt": "adamW"},
                    "schedular": {"sched": "linear"}}, params, 10,
                   fusion_layer=0)


def test_large_lr_for_dec_labels_decoder_fresh():
    """large_lr_for_dec: true → every text_decoder/dec_head param lands in
    the lr_mult 'fresh' group (reference model_generation.py:445-447)."""
    from x2vlm_tpu.train.optim import param_labels

    params = {"params": {
        "base": {"text_encoder": {"layer_0": {"w": jnp.zeros(2)}}},
        "text_decoder": {"layer_0": {"w": jnp.zeros(2)}},
        "dec_head": {"bias": jnp.zeros(2)},
    }}
    labels = param_labels(params, fusion_layer=6,
                          fresh_prefixes=("text_decoder", "dec_head"))
    flat = labels["params"]
    assert flat["text_decoder"]["layer_0"]["w"] == "fresh"
    assert flat["dec_head"]["bias"] == "fresh"
    assert flat["base"]["text_encoder"]["layer_0"]["w"] == "text"
    # without the knob the decoder is a normal ('other') group
    labels0 = param_labels(params, fusion_layer=6)
    assert labels0["params"]["text_decoder"]["layer_0"]["w"] == "other"


def test_start_eval_gates_epoch_evals():
    """start_eval: N skips eval for epochs < N (reference VQA.py:233,249)."""
    from x2vlm_tpu.tasks.finetune import train_epochs
    from x2vlm_tpu.train.trainer import TrainState

    calls = []

    class _State:
        step = 0
        params = {}

    def step_fn(state, batch, rng):
        return state, {"loss": 0.0}

    def eval_fn(state):
        calls.append(1)
        return {"acc": 1.0}

    train_epochs(None, _State(), step_fn, [{"x": np.zeros(1)}],
                 num_epochs=3, rng_key=jax.random.PRNGKey(0),
                 eval_fn=eval_fn, eval_start_epoch=2, metric_key="acc",
                 output_dir=None)
    assert len(calls) == 1  # only epoch 2


def test_mixed_in_batch_false_and_tokenized_true_raise():
    from x2vlm_tpu.run import run_pretrain

    with pytest.raises(ValueError, match="mixed_in_batch"):
        run_pretrain(None, {"mixed_in_batch": False}, None)
    with pytest.raises(ValueError, match="tokenized"):
        run_pretrain(None, {"images": {"tokenized": True}}, None)


def test_length_penalty_changes_traceback_pick():
    """The reference divides a finished beam's cumulative log-prob by
    ((5+fid+1)/6)^lp (model_generation.py:359-360) — a length normalization
    that shrinks the negative score, so longer beams gain under penalty."""
    from x2vlm_tpu.models.captioning import _trace_back

    EOS = 9
    # B=1, K=2, 3 steps. Beam pos0 finishes at step 0 (score -0.5, best raw);
    # the pos1→pos1→pos0 path finishes at step 2 with score -1.0.
    step_ids = [np.array([[EOS, 3]]), np.array([[EOS, 4]]),
                np.array([[EOS, EOS]])]
    ptrs = [np.array([[0, 1]]), np.array([[0, 1]]), np.array([[1, 1]])]
    scores = [np.array([[-0.5, -0.2]]), np.array([[-0.9, -0.3]]),
              np.array([[-1.0, -1.1]])]
    no_pen = _trace_back(1, step_ids, ptrs, scores, EOS, 0.0)
    assert no_pen[0] == []  # the step-0 EOS beam wins raw → empty sequence
    # lp normalizes: -1.0/((5+3)/6)^lp beats -0.5/((5+1)/6)^lp
    lp = 5.0
    assert (-1.0 / math.pow(8 / 6, lp)) > (-0.5 / math.pow(6 / 6, lp))
    pen = _trace_back(1, step_ids, ptrs, scores, EOS, lp)
    assert pen[0] == [3, 4]  # the long beam wins under length penalty


def test_vqa_vg_root_routes_by_dataset_field(tmp_path):
    from PIL import Image

    from x2vlm_tpu.data.factory import create_dataset
    from x2vlm_tpu.data.transforms import test_transform

    (tmp_path / "vqa").mkdir()
    (tmp_path / "vg").mkdir()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(tmp_path / "vqa" / "a.png")
    Image.new("RGB", (8, 8), (0, 255, 0)).save(tmp_path / "vg" / "b.png")
    ann = [{"image": "a.png", "question": "what", "answer": ["red"],
            "question_id": 0, "dataset": "vqa"},
           {"image": "b.png", "question": "what", "answer": ["green"],
            "question_id": 1, "dataset": "vg"}]
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "green"]))

    cfg = {"image_res": 16, "train_file": [str(tmp_path / "ann.json")],
           "test_file": str(tmp_path / "ann.json"),
           "vqa_root": str(tmp_path / "vqa"),
           "vg_root": str(tmp_path / "vg"),
           "answer_list": str(tmp_path / "answers.json"),
           "max_tokens": 8}
    from transformers import BertTokenizerFast

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join("[PAD] [UNK] [CLS] [SEP] [MASK] what red "
                               "green".split()))
    tok = BertTokenizerFast(vocab_file=str(vocab))
    _, ev = create_dataset("vqa", cfg, evaluate=True, tokenizer=tok,
                           rng=random.Random(0))
    # both rows load — the vg row resolves against vg_root; a red vs green
    # pixel check proves the right file was opened
    s0, s1 = ev[0], ev[1]
    assert s0["image"][..., 0].mean() > s0["image"][..., 1].mean()
    assert s1["image"][..., 1].mean() > s1["image"][..., 0].mean()


def test_sample_clip_ids_contiguous_and_min_frames():
    from x2vlm_tpu.data.pretrain import sample_clip_ids

    clips = [[f"f{i}{j}" for j in range(3)] for i in range(6)]  # 6 clips × 3
    rng = random.Random(0)
    ids = sample_clip_ids(clips, minimum_frames=8, rng=rng)
    assert ids == sorted(ids)
    assert ids == list(range(ids[0], ids[-1] + 1))  # contiguous run
    assert sum(len(clips[i]) for i in ids) >= 8
    # skip-set captions contribute no frames and are dropped from the result
    caps = ["ok", "[Music]", "ok", "ok", "ok", "ok"]
    ids2 = sample_clip_ids(clips, minimum_frames=8, clip_captions=caps,
                           skip_caption_set={"[Music]"}, rng=random.Random(1))
    assert 1 not in ids2
    assert sum(len(clips[i]) for i in ids2) >= 8


def test_video_stream_combines_continuous_clips(tmp_path):
    import base64
    import io as _io

    from PIL import Image

    from x2vlm_tpu.data import DistLineReader, TextPreprocessor
    from x2vlm_tpu.data.pretrain import VideoTextStream
    from x2vlm_tpu.data.transforms import test_transform
    from transformers import BertTokenizerFast

    def b64():
        img = Image.new("RGB", (8, 8), (1, 2, 3))
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    clips = [[b64(), b64()] for _ in range(4)]       # 4 clips × 2 frames
    row = {"frames": clips, "caption": ["a dog", "[Music]", "a cat", "runs"],
           "is_continuous": True}
    f = tmp_path / "v.jsonl"
    f.write_text(json.dumps(row) + "\n")
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join("[PAD] [UNK] [CLS] [SEP] [MASK] a dog cat "
                               "runs".split()))
    tok = BertTokenizerFast(vocab_file=str(vocab))
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=2,
                           rng=random.Random(0))

    reader = DistLineReader([str(f)], shuffle=False, repeat=False)
    stream = VideoTextStream(reader, pre, test_transform(16), frame_len=3,
                             combine_continuous_clips=True,
                             minimum_frames_before_sampling=5,
                             rng=random.Random(0))
    samples = list(stream)
    assert len(samples) == 1 and stream.broken == 0
    assert samples[0]["image"].shape == (3, 16, 16, 3)

    # without the knob: a single clip (2 frames, wrapped to frame_len)
    reader2 = DistLineReader([str(f)], shuffle=False, repeat=False)
    stream2 = VideoTextStream(reader2, pre, test_transform(16), frame_len=3,
                              rng=random.Random(0))
    assert len(list(stream2)) == 1 and stream2.broken == 0


def test_uint8_transport_matches_host_normalize():
    """PatchEmbed's uint8 fast path (on-device CLIP normalize) is
    bit-identical to host-normalized float input — the pretrain feed-rate
    lever (tools/bench_input_pipeline.py) cannot drift numerics."""
    from x2vlm_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from x2vlm_tpu.ops.layers import IMAGE_MEAN, IMAGE_STD, PatchEmbed

    np.testing.assert_array_equal(np.asarray(IMAGE_MEAN), CLIP_MEAN)
    np.testing.assert_array_equal(np.asarray(IMAGE_STD), CLIP_STD)

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    host = (raw.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD

    m = PatchEmbed(embed_dim=16, patch_size=16, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(host))
    y_float = m.apply(params, jnp.asarray(host))
    y_uint8 = m.apply(params, jnp.asarray(raw))
    np.testing.assert_array_equal(np.asarray(y_float), np.asarray(y_uint8))


def test_pretrain_transform_uint8_mode():
    from PIL import Image

    from x2vlm_tpu.data.transforms import pretrain_transform

    img = Image.new("RGB", (64, 48), (120, 30, 200))
    t8 = pretrain_transform(32, rng=random.Random(0), as_float=False)
    tf = pretrain_transform(32, rng=random.Random(0))
    a8, af = t8(img), tf(img)
    assert a8.dtype == np.uint8 and a8.shape == (32, 32, 3)
    assert af.dtype == np.float32
    # same rng stream → same augmentation; normalize(a8) == af
    from x2vlm_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    np.testing.assert_allclose((a8.astype(np.float32) / 255 - CLIP_MEAN)
                               / CLIP_STD, af, atol=1e-6)
