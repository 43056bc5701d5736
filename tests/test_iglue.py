import base64
import io
import json
import random

import numpy as np
import pytest
from PIL import Image

from x2vlm_tpu.data import TextPreprocessor
from x2vlm_tpu.data import transforms as T
from x2vlm_tpu.data.iglue import (
    MARVLDataset, WITRetrievalDataset, XFlickrCODataset, XVNLIDataset,
)
from x2vlm_tpu.data.tokenization_dropout import WordpieceTokenizerWithDropout

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump jumps ##s ##ing over lazy"
).split()


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("iglue")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)


def _png_b64(rng):
    img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_wit_dataset(tmp_path, tok):
    rng = np.random.default_rng(0)
    f = tmp_path / "wit.jsonl"
    with open(f, "w") as fh:
        fh.write(json.dumps({"image_content": _png_b64(rng),
                             "image_url": "u1",
                             "caption_reference_description": "the quick dog"}) + "\n")
        fh.write(json.dumps({"image_content": _png_b64(rng),
                             "image_url": "u2",
                             "caption_reference_description": ""}) + "\n")
    pre = TextPreprocessor(tok, max_tokens=8)
    ds = WITRetrievalDataset(str(f), T.test_transform(32), pre)
    assert ds.n_images() == 1  # empty caption row dropped
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert ds.image_batch([0]).shape == (1, 32, 32, 3)


def test_xflickrco_dataset(tmp_path, tok):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
        img_dir / "a.jpg")
    f = tmp_path / "xf.jsonl"
    f.write_text(json.dumps({"sentences": ["the dog", "a cat"],
                             "id": "a", "img_path": "a.jpg"}) + "\n")
    pre = TextPreprocessor(tok, max_tokens=8)
    ds = XFlickrCODataset(str(f), T.test_transform(32), str(img_dir), pre)
    assert ds.n_images() == 1 and ds.n_texts() == 2
    assert ds.txt2img[1] == 0
    assert len(ds) == 2
    assert ds[1]["idx"] == 0


def test_xvnli_and_marvl(tmp_path, tok):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
        img_dir / "x1.jpg")
    pre = TextPreprocessor(tok, max_tokens=8)

    f = tmp_path / "xvnli.jsonl"
    with open(f, "w") as fh:
        fh.write(json.dumps({"Flikr30kID": "x1", "sentence2": "a dog runs",
                             "gold_label": "entailment"}) + "\n")
        fh.write(json.dumps({"Flikr30kID": "x1", "sentence2": "bad",
                             "gold_label": "-"}) + "\n")  # invalid, dropped
    ds = XVNLIDataset(str(f), T.test_transform(32), str(img_dir), pre)
    assert len(ds) == 1
    assert ds[0]["labels"] == 1

    f2 = tmp_path / "marvl.jsonl"
    f2.write_text(json.dumps({"left_img": "x1.jpg", "right_img": "x1.jpg",
                              "caption": "the dog", "label": True}) + "\n")
    m = MARVLDataset(str(f2), T.test_transform(32), str(img_dir), pre)
    s = m[0]
    assert s["labels"] == 1
    assert s["image0"].shape == (32, 32, 3)


def test_wordpiece_dropout(tok):
    wp = WordpieceTokenizerWithDropout(tok, dropout=0.0, rng=random.Random(0))
    base = wp.tokenize("the quick jumps")
    assert base == tok.tokenize("the quick jumps")
    wp = WordpieceTokenizerWithDropout(tok, dropout=0.9, rng=random.Random(0))
    # "jumps" segments as ["jumps"] (longest) or ["jump", "##s"] under dropout
    seen = {tuple(wp.tokenize("jumps")) for _ in range(20)}
    # high dropout must produce at least one alternative segmentation
    assert len(seen) >= 2
    for seg in seen:
        assert all(t in tok.get_vocab() or t == tok.unk_token for t in seg)
