"""Mixed-stream pretraining: synthetic JSONL streams end-to-end."""

import base64
import io
import json
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from x2vlm_tpu.data import DistLineReader, TextPreprocessor, iter_batches
from x2vlm_tpu.data import transforms as T
from x2vlm_tpu.data.pretrain import (
    ImageTextStream, RegionTextStream, TextStream, VideoTextStream,
    region_collate, sample_frame_ids,
)
from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig, XVLMForPretrain
from x2vlm_tpu.models.heads import pretrain_init_inputs
from x2vlm_tpu.tasks.pretrain import PretrainStreams, pretrain_loop
from x2vlm_tpu.train import create_optimizer, create_train_state, lr_schedule

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy river bank small big red blue green house tree"
).split()


def _b64_image(rng, w=48, h=48):
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("pretrain")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)
    rng = np.random.default_rng(0)

    img_file = d / "images.jsonl"
    with open(img_file, "w") as f:
        for i in range(8):
            f.write(json.dumps({"binary": _b64_image(rng),
                                "desc": f"the quick fox {i % 3}"}) + "\n")

    region_file = d / "regions.jsonl"
    with open(region_file, "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "binary": _b64_image(rng, 64, 64),
                "caption": "a big green tree",
                "elems": [
                    {"bb": [4, 4, 24, 24], "caption": "small red house"},
                    {"bb": [30, 30, 20, 20], "caption": "lazy dog",
                     "attributes": "brown"},
                ]}) + "\n")

    text_file = d / "texts.jsonl"
    with open(text_file, "w") as f:
        for i in range(8):
            f.write(json.dumps({"text": "the lazy dog jumps over the river"}) + "\n")

    video_file = d / "videos.jsonl"
    with open(video_file, "w") as f:
        for i in range(4):
            f.write(json.dumps({"frames": [_b64_image(rng) for _ in range(5)],
                                "caption": "a cat runs"}) + "\n")
    return d, tok


def test_sample_frame_ids():
    ids = sample_frame_ids(10, 3, training=False)
    assert len(ids) == 3 and ids == sorted(ids)
    ids = sample_frame_ids(2, 3, training=True)
    assert ids == [0, 1, 0]
    r = random.Random(0)
    for _ in range(10):
        ids = sample_frame_ids(30, 4, training=True, rng=r)
        assert len(ids) == 4 and all(0 <= i < 30 for i in ids)


def test_image_and_text_streams(corpus):
    d, tok = corpus
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3,
                           rng=random.Random(0))
    reader = DistLineReader([str(d / "images.jsonl")], shuffle=False, repeat=False)
    stream = ImageTextStream(reader, pre, T.test_transform(32))
    samples = list(stream)
    assert len(samples) == 8 and stream.broken == 0
    assert samples[0]["image"].shape == (32, 32, 3)
    assert samples[0]["text_ids"].shape == (10,)

    treader = DistLineReader([str(d / "texts.jsonl")], shuffle=False, repeat=False)
    tsamples = list(TextStream(treader, pre))
    assert len(tsamples) == 8
    assert "image" not in tsamples[0]


def test_video_stream(corpus):
    d, tok = corpus
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3, rng=random.Random(0))
    reader = DistLineReader([str(d / "videos.jsonl")], shuffle=False, repeat=False)
    stream = VideoTextStream(reader, pre, T.test_transform(32), frame_len=3)
    s = next(iter(stream))
    assert s["image"].shape == (3, 32, 32, 3)


def test_region_stream_and_collate(corpus):
    d, tok = corpus
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3, rng=random.Random(0))
    reader = DistLineReader([str(d / "regions.jsonl")], shuffle=False, repeat=False)
    stream = RegionTextStream(
        reader, pre, T.box_transform(rng=random.Random(0)), image_res=32,
        patch_size=16, max_regions=3, min_perc_in_image=0.3,
        rng=random.Random(0))
    samples = list(stream)
    assert stream.broken == 0 and len(samples) == 8
    s = samples[0]
    assert s["image"].shape == (32, 32, 3)
    assert 1 <= len(s["rows"]) <= 3
    row = s["rows"][0]
    assert row["image_atts"].shape == (5,)  # 1 cls + 4 patches at 32/16
    assert row["image_atts"][0] == 1
    assert row["is_image"] == 1  # full-image caption row first

    batch = region_collate(samples[:2], batch_size=4, max_images=2,
                           rng=random.Random(0))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["text_ids"].shape == (4, 10)
    assert batch["idx_to_group_img"].shape == (4,)
    assert batch["target_bbox"].shape == (4, 4)
    assert (np.asarray(batch["idx_to_group_img"]) < 2).all()


def test_pretrain_loop_mixed_streams(corpus):
    d, tok = corpus
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3, rng=random.Random(0))
    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16)
    model = XVLMForPretrain(cfg, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pretrain_init_inputs(cfg), rng=jax.random.PRNGKey(2),
        ret_bbox_loss=True)
    tx = create_optimizer(variables["params"], lr_schedule(1e-3, 10))
    state = create_train_state(variables, tx)

    def image_batches():
        while True:
            reader = DistLineReader([str(d / "images.jsonl")], shuffle=False,
                                    repeat=True)
            stream = ImageTextStream(reader, pre, T.test_transform(32))
            yield from iter_batches(iter(stream), 4)

    def region_batches():
        reader = DistLineReader([str(d / "regions.jsonl")], shuffle=False,
                                repeat=True)
        stream = RegionTextStream(
            reader, pre, T.box_transform(rng=random.Random(0)), image_res=32,
            patch_size=16, max_regions=3, min_perc_in_image=0.3,
            rng=random.Random(0))
        it = iter(stream)
        while True:
            yield region_collate([next(it), next(it)], batch_size=4,
                                 max_images=2, rng=random.Random(1))

    def text_batches():
        reader = DistLineReader([str(d / "texts.jsonl")], shuffle=False,
                                repeat=True)
        yield from iter_batches(iter(TextStream(reader, pre)), 4)

    streams = PretrainStreams(
        image=image_batches(), region=region_batches(), text=text_batches(),
        region_perc=1.0, text_perc=1.0, rng=random.Random(0))

    def shard(b):
        return jax.tree_util.tree_map(jnp.asarray, b)

    state = pretrain_loop(model, state, tx, streams, num_steps=3,
                          rng_key=jax.random.PRNGKey(5), shard_fn=shard,
                          log_every=1)
    assert int(state.step) == 3


def _tiny_pretrain_model():
    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16)
    model = XVLMForPretrain(cfg, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pretrain_init_inputs(cfg), rng=jax.random.PRNGKey(2),
        ret_bbox_loss=True)
    tx = create_optimizer(variables["params"], lr_schedule(1e-3, 10))
    return model, tx, create_train_state(variables, tx)


def test_calc_image_bbox_loss_includes_full_image_rows(corpus):
    """calc_image_bbox_loss: true keeps full-image region rows in the bbox
    loss (reference Pretrain.py:87-88 is_image=None) — the region bbox metric
    must differ from the default run on the same data/rng."""
    d, tok = corpus
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3, rng=random.Random(0))

    def region_batches():
        reader = DistLineReader([str(d / "regions.jsonl")], shuffle=False,
                                repeat=True)
        stream = RegionTextStream(
            reader, pre, T.box_transform(rng=random.Random(0)), image_res=32,
            patch_size=16, max_regions=3, min_perc_in_image=0.3,
            rng=random.Random(0))
        it = iter(stream)
        while True:
            yield region_collate([next(it), next(it)], batch_size=4,
                                 max_images=2, rng=random.Random(1))

    def image_batches():
        while True:
            reader = DistLineReader([str(d / "images.jsonl")], shuffle=False,
                                    repeat=True)
            stream = ImageTextStream(reader, pre, T.test_transform(32))
            yield from iter_batches(iter(stream), 4)

    def shard(b):
        return jax.tree_util.tree_map(jnp.asarray, b)

    logs = {}
    for flag in (False, True):
        model, tx, state = _tiny_pretrain_model()
        streams = PretrainStreams(image=image_batches(),
                                  region=region_batches(),
                                  rng=random.Random(0))
        from x2vlm_tpu.train.metrics import MetricLogger

        logger = MetricLogger()
        pretrain_loop(model, state, tx, streams, num_steps=1,
                      rng_key=jax.random.PRNGKey(5), shard_fn=shard,
                      calc_image_bbox_loss=flag, log_every=10, logger=logger)
        logs[flag] = logger.meters["region_loss_bbox"].global_avg
    # a region_collate with max_images=2 over 2-sample batches pads rows with
    # is_image=1 full-image rows; including them must change the bbox loss
    assert logs[True] != logs[False]


def test_pretrain_epoch_save_cadence(corpus):
    """ckpt_frequent: save at every Nth epoch boundary AND the final step
    (reference Pretrain.py:377), on top of the step cadence."""
    d, tok = corpus
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3, rng=random.Random(0))

    def image_batches():
        while True:
            reader = DistLineReader([str(d / "images.jsonl")], shuffle=False,
                                    repeat=True)
            stream = ImageTextStream(reader, pre, T.test_transform(32))
            yield from iter_batches(iter(stream), 4)

    model, tx, state = _tiny_pretrain_model()
    streams = PretrainStreams(image=image_batches(), rng=random.Random(0))
    saved = []
    pretrain_loop(model, state, tx, streams, num_steps=6,
                  rng_key=jax.random.PRNGKey(5),
                  shard_fn=lambda b: jax.tree_util.tree_map(jnp.asarray, b),
                  checkpoint_fn=lambda st, step: saved.append(step),
                  checkpoint_every=0, epoch_steps=2, epoch_save_frequent=2,
                  log_every=10)
    # epochs end at steps 2,4,6; every-2nd epoch → steps 4 and 6 (6 = final)
    assert saved == [4, 6]


def test_get_clips_bounded_skip_set():
    """_get_clips must not spin forever on all-skipped rows and must handle a
    shared (non-list) caption — regression for an unbounded re-roll loop."""
    vs = VideoTextStream.__new__(VideoTextStream)
    vs.rng = random.Random(0)
    vs.skip_captions = {"[Music]"}
    vs.combine_continuous_clips = False
    vs.minimum_frames_before_sampling = 0

    frames, ids = vs._get_clips([["a"], ["b"]], ["[Music]", "ok"], False)
    assert frames == ["b"] and ids == [1]

    frames, ids = vs._get_clips([["a"], ["b"]], "one shared caption", False)
    assert frames == [["a"], ["b"]][ids[0]]

    with pytest.raises(ValueError):
        vs._get_clips([["a"], ["b"]], ["[Music]", "[Music]"], False)
