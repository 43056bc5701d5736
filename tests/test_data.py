import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from x2vlm_tpu.data import (
    DistLineReader, MapLoader, RetrievalEvalDataset, RetrievalTrainDataset,
    TextMaskingGenerator, TextPreprocessor, batch_indices, collate,
    iter_batches, list_data_files, pre_caption, split_shard, IGNORE_INDEX,
)
from x2vlm_tpu.data import transforms as T


VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy river bank small big red blue green house tree"
).split()


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("vocab")
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB))
    return BertTokenizerFast(vocab_file=str(vocab_file), do_lower_case=True)


def test_pre_caption():
    assert pre_caption("A Quick  (Brown) FOX!!", 10) == "a quick brown fox"
    assert pre_caption("one two three four", 2) == "one two"


def test_masking_never_masks_cls_and_respects_max(tokenizer):
    gen = TextMaskingGenerator(tokenizer, mask_prob=0.9, mask_max=3,
                               rng=random.Random(0))
    tokens = ["[CLS]", "the", "quick", "brown", "fox", "jump", "##s"]
    for _ in range(50):
        masked, pos = gen(list(tokens))
        assert 0 not in pos
        assert len(pos) <= 3
        assert masked[0] == "[CLS]"


def test_masking_whole_word_spans(tokenizer):
    gen = TextMaskingGenerator(tokenizer, mask_prob=0.5, mask_max=4,
                               skipgram_prb=0.0, rng=random.Random(1))
    tokens = ["[CLS]", "jump", "##s", "jump", "##ing", "fox"]
    hit_continuation_without_start = False
    for _ in range(100):
        masked, pos = gen(list(tokens))
        for p in pos:
            if tokens[p].startswith("##") and (p - 1) not in pos:
                hit_continuation_without_start = True
    # whole-word: a '##' piece is only masked as part of its word
    assert not hit_continuation_without_start


def test_text_preprocessor_shapes(tokenizer):
    pre = TextPreprocessor(tokenizer, max_tokens=12, max_masks=4,
                           rng=random.Random(0))
    ids, atts = pre("the quick brown fox jumps over the lazy dog")
    assert ids.shape == (12,) and atts.shape == (12,)
    assert ids[0] == tokenizer.cls_token_id
    n = int(atts.sum())
    assert ids[n - 1] == tokenizer.sep_token_id
    assert (ids[n:] == tokenizer.pad_token_id).all()

    out = pre("the quick brown fox", with_masking=True)
    ids, atts, ids_masked, pos, labels = out
    assert ids_masked.shape == (12,) and pos.shape == (4,) and labels.shape == (4,)
    valid = labels != IGNORE_INDEX
    # labels at masked positions must equal original ids
    for p, l, v in zip(pos, labels, valid):
        if v:
            assert ids[p] == l


def test_split_shard_partition():
    items = list(range(10))
    shards = [split_shard(items, i, 3) for i in range(3)]
    assert sum(shards, []) == items
    assert all(abs(len(s) - 10 / 3) < 1.5 for s in shards)


def test_dist_line_reader_shards_and_resumes(tmp_path):
    files = []
    for fi in range(4):
        p = tmp_path / f"part-{fi}.jsonl"
        p.write_text("\n".join(json.dumps({"i": fi * 10 + li}) for li in range(5)))
        files.append(str(p))

    # two ranks partition all lines within an epoch
    seen = []
    for rank in range(2):
        r = DistLineReader([str(tmp_path)], rank=rank, world_size=2,
                           shuffle=True, repeat=False, seed=3)
        seen.extend(json.loads(l)["i"] for l in r)
    assert sorted(seen) == sorted(fi * 10 + li for fi in range(4) for li in range(5))

    # cursor resume: read 7 lines, save state, resume reads the rest
    r = DistLineReader(files, shuffle=False, repeat=False)
    it = iter(r)
    first = [json.loads(next(it))["i"] for _ in range(7)]
    state = r.state()
    r2 = DistLineReader(files, shuffle=False, repeat=False, start_state=state)
    rest = [json.loads(l)["i"] for l in r2]
    assert sorted(first + rest) == sorted(fi * 10 + li for fi in range(4) for li in range(5))


def test_batch_indices_distributed_cover():
    batches_a = batch_indices(10, 2, shuffle=True, seed=0, epoch=0,
                              host_id=0, num_hosts=2, drop_last=False)
    batches_b = batch_indices(10, 2, shuffle=True, seed=0, epoch=0,
                              host_id=1, num_hosts=2, drop_last=False)
    got = sorted(i for b in batches_a + batches_b for i in b)
    assert got == sorted(range(10))
    # drop_last trims ragged host batches
    trimmed = batch_indices(10, 2, shuffle=False, seed=0, epoch=0,
                            host_id=0, num_hosts=2, drop_last=True)
    assert all(len(b) == 2 for b in trimmed)


def _make_retrieval_fixture(tmp_path, n_imgs=4, caps_per=2):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    ann = []
    rng = np.random.default_rng(0)
    for i in range(n_imgs):
        name = f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(img_dir / name)
        ann.append({"image": name, "image_id": i,
                    "caption": [f"the quick fox {i}", f"a lazy dog {i}"][:caps_per]})
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


def test_retrieval_datasets_and_loader(tmp_path, tokenizer):
    ann_file, img_dir = _make_retrieval_fixture(tmp_path)
    pre = TextPreprocessor(tokenizer, max_tokens=10)
    train = RetrievalTrainDataset(ann_file, T.train_transform(32, rng=random.Random(0)),
                                  img_dir, pre, rng=random.Random(0))
    sample = train[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["text_ids"].shape == (10,)

    loader = MapLoader(train, batch_size=2, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 32, 32, 3)
    assert batches[0]["idx"].shape == (2,)

    ev = RetrievalEvalDataset(ann_file, T.test_transform(32), img_dir, pre)
    assert ev.n_images() == 4 and ev.n_texts() == 8
    assert ev.txt2img[3] == 1 and 3 in ev.img2txt[1]
    imgs = ev.image_batch([0, 1])
    assert imgs.shape == (2, 32, 32, 3)
    ids, atts = ev.text_batch([0, 1, 2])
    assert ids.shape == (3, 10)


def test_iter_batches():
    samples = ({"x": np.full((2,), i)} for i in range(7))
    out = list(iter_batches(samples, 3))
    assert len(out) == 2  # drops ragged tail
    assert out[0]["x"].shape == (3, 2)


def test_pre_tokenized_preprocessor(tokenizer):
    pre = TextPreprocessor(tokenizer, max_tokens=8, pre_tokenized=True)
    ids, atts = pre("the quick jump ##s")
    toks = tokenizer.convert_ids_to_tokens([int(i) for i in ids[: int(atts.sum())]])
    assert toks == ["[CLS]", "the", "quick", "jump", "##s", "[SEP]"]


def test_retrieval_eval_native_decode(tmp_path, tokenizer):
    from x2vlm_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native dataplane not built")
    ann_file, img_dir = _make_retrieval_fixture(tmp_path)
    pre = TextPreprocessor(tokenizer, max_tokens=10)
    ev = RetrievalEvalDataset(ann_file, T.test_transform(32), img_dir, pre,
                              use_native_decode=True, image_res=32)
    assert ev.native is not None
    native = ev.image_batch([0, 1])
    ev.native = None
    pil = ev.image_batch([0, 1])
    assert native.shape == pil.shape == (2, 32, 32, 3)
    corr = np.corrcoef(native.ravel(), pil.ravel())[0, 1]
    assert corr > 0.99, corr


def test_prefetcher_preserves_order_and_bounds_queue():
    """The per-stream background Prefetcher (run_pretrain wires one per
    stream with depth = the block's num_workers) yields items in order,
    exhausts cleanly, and never buffers more than `depth` ahead."""
    import threading
    import time as _time

    from x2vlm_tpu.data import Prefetcher

    produced = []

    def slow_gen():
        for i in range(8):
            produced.append(i)
            yield i

    pf = Prefetcher(slow_gen(), depth=2)
    _time.sleep(0.2)  # give the thread time to run ahead
    # depth-2 queue + the one item the producer may hold: strictly bounded
    assert len(produced) <= 4
    assert list(pf) == list(range(8))
    assert produced == list(range(8))

    # exceptions in the producer propagate (not swallowed)
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    pf2 = iter(Prefetcher(bad_gen(), depth=2))
    assert next(pf2) == 1
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(pf2)
