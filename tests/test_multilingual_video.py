import base64
import io
import json
import random

import numpy as np
import pytest
from PIL import Image

from x2vlm_tpu.core.io import hcountline, hexists, hlist_files, hopen
from x2vlm_tpu.data import DistLineReader, TextPreprocessor
from x2vlm_tpu.data import transforms as T
from x2vlm_tpu.data.multilingual import (
    ImageMultiTextStream, ParaTextStream, RegionMultiTextStream, choose_language,
)
from x2vlm_tpu.data.video import VideoQADataset, VideoRetrievalDataset

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy hund lauft der schnelle"
).split()


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("mlv")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)


def _b64(rng, w=40, h=40):
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_choose_language():
    r = random.Random(0)
    caps = {"en": "the dog", "de": "der hund"}
    for _ in range(5):
        assert choose_language(caps, ["en", "de"], r) in caps.values()
    assert choose_language(caps, ["fr", "de"], r) == "der hund"


def test_image_multitext_stream(tmp_path, tok):
    rng = np.random.default_rng(0)
    f = tmp_path / "mt.jsonl"
    with open(f, "w") as fh:
        for i in range(4):
            fh.write(json.dumps({
                "binary": _b64(rng),
                "caption": {"en": "the quick dog", "de": "der schnelle hund"},
            }) + "\n")
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3,
                           rng=random.Random(0))
    reader = DistLineReader([str(f)], shuffle=False, repeat=False)
    stream = ImageMultiTextStream(reader, pre, T.test_transform(32),
                                  languages=["en", "de"], rng=random.Random(0))
    samples = list(stream)
    assert len(samples) == 4 and stream.broken == 0


def test_region_multitext_code_switch(tmp_path, tok):
    rng = np.random.default_rng(0)
    f = tmp_path / "rmt.jsonl"
    with open(f, "w") as fh:
        for i in range(4):
            fh.write(json.dumps({
                "binary": _b64(rng, 64, 64),
                "elems": [
                    {"bb": [4, 4, 24, 24],
                     "caption": {"en": "quick dog", "de": "schnelle hund"}},
                    {"bb": [30, 30, 20, 20],
                     "caption": {"en": "lazy cat", "de": "der cat"}},
                ]}) + "\n")
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3, rng=random.Random(0))
    reader = DistLineReader([str(f)], shuffle=False, repeat=False)
    stream = RegionMultiTextStream(
        reader, pre, T.box_transform(rng=random.Random(0)),
        image_res=32, patch_size=16, max_regions=3, min_perc_in_image=0.3,
        rng=random.Random(0), languages=["en", "de"], code_switch=True)
    samples = list(stream)
    assert stream.broken == 0 and len(samples) == 4


def test_para_text_stream(tmp_path, tok):
    f = tmp_path / "para.jsonl"
    with open(f, "w") as fh:
        for i in range(4):
            fh.write(json.dumps({"text1": "the quick dog runs",
                                 "text2": "der schnelle hund lauft"}) + "\n")
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3, rng=random.Random(0))
    reader = DistLineReader([str(f)], shuffle=False, repeat=False)
    stream = ParaTextStream(reader, pre, rng=random.Random(0))
    samples = list(stream)
    assert len(samples) == 4
    s = samples[0]
    assert s["text_ids_2"].shape == (10,)
    assert "image" not in s


def test_video_datasets(tmp_path, tok):
    rng = np.random.default_rng(0)
    vdir = tmp_path / "vids" / "v0"
    vdir.mkdir(parents=True)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            vdir / f"f{i:03d}.png")
    ann = [{"video": "v0", "question": "the dog runs", "answer": "dog"}]
    (tmp_path / "vqa.json").write_text(json.dumps(ann))
    pre = TextPreprocessor(tok, max_tokens=8)
    ds = VideoQADataset(str(tmp_path / "vqa.json"), T.test_transform(32),
                        str(tmp_path / "vids"), pre, ["dog", "cat"],
                        frame_len=3, training=False)
    s = ds[0]
    assert s["image"].shape == (3, 32, 32, 3)
    assert s["labels"] == 0

    rann = [{"video": "v0", "caption": ["the dog runs", "a cat"]}]
    (tmp_path / "vret.json").write_text(json.dumps(rann))
    rds = VideoRetrievalDataset(str(tmp_path / "vret.json"), T.test_transform(32),
                                str(tmp_path / "vids"), pre, frame_len=3)
    assert rds.n_images() == 1 and rds.n_texts() == 2
    assert rds.image_batch([0]).shape == (1, 3, 32, 32, 3)


def test_local_io_helpers(tmp_path):
    f = tmp_path / "x.txt"
    with hopen(str(f), "w") as fh:
        fh.write("a\nb\nc\n")
    assert hexists(str(f))
    assert hcountline(str(f)) == 3
    assert str(f) in hlist_files([str(tmp_path)])


def test_collect_results_fs(tmp_path):
    from x2vlm_tpu.tasks.collect import collect_results_fs, dedup_by_key

    r0 = [{"question_id": 1, "answer": "a"}, {"question_id": 2, "answer": "b"}]
    r1 = [{"question_id": 2, "answer": "b"}, {"question_id": 3, "answer": "c"}]
    assert collect_results_fs(r1, str(tmp_path), "res", host_id=1, num_hosts=2) is None
    merged = collect_results_fs(r0, str(tmp_path), "res", host_id=0, num_hosts=2,
                                dedup_key="question_id")
    assert sorted(r["question_id"] for r in merged) == [1, 2, 3]
    assert (tmp_path / "res.json").exists()
    assert dedup_by_key(r0 + r1, "question_id") == r0 + [r1[1]]


def test_collect_results_single_host():
    from x2vlm_tpu.tasks.collect import collect_results

    out = collect_results([{"question_id": 1}], dedup_key="question_id")
    assert out == [{"question_id": 1}]


def test_video_qa_classification_end_to_end(tmp_path, tok):
    """VideoQA dataset → XVLMForClassification with 5-D video input
    (avgpool frame encoding) → evaluate_classification."""
    import jax
    import jax.numpy as jnp
    from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig
    from x2vlm_tpu.models.classification import XVLMForClassification
    from x2vlm_tpu.tasks.classification import evaluate_classification

    rng = np.random.default_rng(0)
    vdir = tmp_path / "v" / "clip0"
    vdir.mkdir(parents=True)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            vdir / f"f{i}.png")
    ann = [{"video": "clip0", "question": "the dog runs", "answer": "dog"}]
    (tmp_path / "vqa2.json").write_text(json.dumps(ann))
    pre = TextPreprocessor(tok, max_tokens=8)
    ds = VideoQADataset(str(tmp_path / "vqa2.json"), T.test_transform(32),
                        str(tmp_path / "v"), pre, ["dog", "cat"],
                        frame_len=2, training=False)
    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=len(tok.get_vocab()), hidden_size=32,
                        num_layers=4, fusion_layer=2, num_heads=2,
                        intermediate_size=64, encoder_width=32,
                        hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16, video_encoding="avgpool", frame_len=2,
        add_frame_pos=True)
    model = XVLMForClassification(cfg, num_labels=2, dtype=jnp.float32)
    s = ds[0]
    batch = {"image": jnp.asarray(s["image"])[None],
             "text_ids": jnp.asarray(s["text_ids"])[None],
             "text_atts": jnp.asarray(s["text_atts"])[None],
             "labels": jnp.asarray([s["labels"]])}
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch)
    assert "frame_pos_embed" in v["params"]["base"]
    out = model.apply(v, batch, deterministic=True)
    assert np.isfinite(float(out["loss_cls"]))
    metrics = evaluate_classification(model, v, ds, batch_size=1)
    assert metrics["n"] == 1


@pytest.fixture()
def fake_hdfs(tmp_path, monkeypatch):
    """A fake `hdfs` CLI on PATH mapping hdfs://test/... to a local dir —
    exercises the real core/io subprocess pipes end-to-end."""
    import os
    import stat

    root = tmp_path / "hdfs_root"
    root.mkdir()
    script = tmp_path / "bin" / "hdfs"
    script.parent.mkdir()
    script.write_text(f"""#!/usr/bin/env python3
import os, sys
ROOT = {str(root)!r}
def local(p):
    assert p.startswith("hdfs://test/"), p
    return os.path.join(ROOT, p[len("hdfs://test/"):])
args = sys.argv[1:]          # ['dfs', '-cat'|-ls|-test|..., ...]
op = args[1]
if op == "-cat":
    sys.stdout.buffer.write(open(local(args[2]), "rb").read())
elif op == "-ls":
    d = local(args[2])
    for f in sorted(os.listdir(d)):
        rel = os.path.relpath(os.path.join(d, f), ROOT)
        print(f"-rw-r--r--   1 u g 0 2024-01-01 00:00 hdfs://test/{{rel}}")
elif op == "-test":
    sys.exit(0 if os.path.exists(local(args[3])) else 1)
else:
    sys.exit(2)
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{script.parent}:{os.environ['PATH']}")
    return root


def test_hdfs_train_file_streams_end_to_end(fake_hdfs, tok):
    """An hdfs:// train_file lists, shards, and streams through
    DistLineReader → ImageTextStream exactly like a local one (reference
    dist_dataset.py:30-44 + utils/hdfs_io.py:24-82), and annotation/image
    opens accept remote paths."""
    from x2vlm_tpu.data import DistLineReader
    from x2vlm_tpu.data.imageio import open_image
    from x2vlm_tpu.data.pretrain import ImageTextStream
    from x2vlm_tpu.data.retrieval import _load_annotations
    from x2vlm_tpu.data.streaming import list_data_files
    from x2vlm_tpu.data.tokenization import TextPreprocessor

    rng = np.random.default_rng(5)
    ddir = fake_hdfs / "data"
    ddir.mkdir()
    for s in range(2):
        with open(ddir / f"part{s}.jsonl", "w") as f:
            for i in range(4):
                f.write(json.dumps({"binary": _b64(rng),
                                    "caption": f"the quick fox {i}"}) + "\n")
    (ddir / "_SUCCESS").write_text("")

    files = list_data_files(["hdfs://test/data"])
    assert files == ["hdfs://test/data/part0.jsonl",
                     "hdfs://test/data/part1.jsonl"]

    reader = DistLineReader(["hdfs://test/data"], shuffle=False, repeat=False)
    pre = TextPreprocessor(tok, max_tokens=8, max_masks=2,
                           rng=random.Random(0))
    stream = ImageTextStream(reader, pre, T.test_transform(32),
                             caption_key="caption")
    samples = list(stream)
    assert len(samples) == 8
    assert samples[0]["image"].shape == (32, 32, 3)

    # remote annotation file + remote image path
    img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8))
    img.save(fake_hdfs / "im0.png")
    (fake_hdfs / "ann.json").write_text(json.dumps(
        [{"image": "hdfs://test/im0.png", "caption": ["a dog"]}]))
    ann = _load_annotations("hdfs://test/ann.json")
    assert ann[0]["caption"] == ["a dog"]
    assert open_image(ann[0]["image"]).size == (40, 40)


def test_image_multitext_stream_uint8_transport(tmp_path, tok):
    """The multilingual image stream must keep the transform's dtype (uint8
    transport + on-device normalize, like the monolingual ImageTextStream) —
    regression for a float32 cast that skipped normalization entirely."""
    rng = np.random.default_rng(1)
    f = tmp_path / "mt8.jsonl"
    with open(f, "w") as fh:
        fh.write(json.dumps({
            "binary": _b64(rng),
            "caption": {"en": "the quick dog"},
        }) + "\n")
    pre = TextPreprocessor(tok, max_tokens=10, max_masks=3,
                           rng=random.Random(0))
    reader = DistLineReader([str(f)], shuffle=False, repeat=False)
    stream = ImageMultiTextStream(
        reader, pre, T.pretrain_transform(32, as_float=False),
        languages=["en"], rng=random.Random(0))
    (sample,) = list(stream)
    assert sample["image"].dtype == np.uint8
