"""End-to-end slice: synthetic retrieval data → train steps → two-stage eval."""

import json
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from x2vlm_tpu.data import (
    MapLoader, RetrievalEvalDataset, RetrievalTrainDataset, TextPreprocessor,
)
from x2vlm_tpu.data import transforms as T
from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig, XVLMForRetrieval
from x2vlm_tpu.tasks.retrieval import evaluate_retrieval, itm_eval
from x2vlm_tpu.train import (
    create_optimizer, create_train_state, lr_schedule, make_train_step,
)


def tiny_cfg():
    return XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16)


VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a b c d e dog cat runs the quick brown fox "
    "jump ##s ##ing over lazy river bank small big red blue green house tree"
).split()


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("retr")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)

    img_dir = d / "imgs"
    img_dir.mkdir()
    words = ["dog", "cat", "fox", "tree"]
    rng = np.random.default_rng(0)
    ann = []
    for i in range(4):
        name = f"im{i}.png"
        # visually distinct images
        arr = np.full((48, 48, 3), i * 60, np.uint8)
        arr += rng.integers(0, 30, arr.shape, np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        ann.append({"image": name, "image_id": i,
                    "caption": [f"the {words[i]} runs", f"a {words[i]} over the river"]})
    ann_file = d / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir), tok


def test_merge_row_sharded_ownership():
    """Each host's owned row range survives verbatim; foreign rows (whatever
    garbage they hold, including values above the owner's) are discarded —
    the merge must not depend on the -100 sentinel ordering."""
    from x2vlm_tpu.tasks.retrieval import merge_row_sharded

    n, m, hosts = 7, 5, 3  # step = 7//3+1 = 3 → ranges [0,3) [3,6) [6,7)
    rng = np.random.default_rng(0)
    truth = rng.standard_normal((n, m)).astype(np.float32)
    gathered = np.full((hosts, n, m), 1e9, np.float32)  # poison foreign rows
    for h, (lo, hi) in enumerate([(0, 3), (3, 6), (6, 7)]):
        gathered[h, lo:hi] = truth[lo:hi]
    np.testing.assert_array_equal(merge_row_sharded(gathered, hosts), truth)


def test_itm_eval_perfect_and_random():
    txt2img = {0: 0, 1: 0, 2: 1, 3: 1}
    img2txt = {0: [0, 1], 1: [2, 3]}
    # perfect scores
    s_i2t = np.asarray([[5.0, 4.0, 0, 0], [0, 0, 5.0, 4.0]])
    s_t2i = np.asarray([[5.0, 0], [5.0, 0], [0, 5.0], [0, 5.0]])
    m = itm_eval(s_i2t, s_t2i, txt2img, img2txt)
    assert m["txt_r1"] == 100.0 and m["img_r1"] == 100.0 and m["r_mean"] == 100.0


def test_end_to_end_train_and_eval(fixture):
    ann_file, img_dir, tok = fixture
    cfg = tiny_cfg()
    pre = TextPreprocessor(tok, max_tokens=10)

    class Wrapper(XVLMForRetrieval):
        def __call__(self, batch, rng=None, deterministic=False):
            return XVLMForRetrieval.__call__(
                self, batch["image"], batch["text_ids"], batch["text_atts"],
                batch["idx"], rng=rng, deterministic=deterministic)

    model = Wrapper(cfg, dtype=jnp.float32)
    train_ds = RetrievalTrainDataset(
        ann_file, T.test_transform(32), img_dir, pre, rng=random.Random(0))
    loader = MapLoader(train_ds, batch_size=8, num_workers=1, drop_last=False,
                       shuffle=True, seed=0)

    batch0 = jax.tree_util.tree_map(jnp.asarray, next(iter(loader)))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch0, rng=jax.random.PRNGKey(2))
    tx = create_optimizer(variables["params"],
                          lr_schedule(2e-3, 60, warmup_steps=0))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, donate=False)

    first_loss = None
    for ep in range(15):
        loader.set_epoch(ep)
        for batch in loader:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
            if first_loss is None:
                first_loss = float(metrics["loss_total"])
    last_loss = float(metrics["loss_total"])
    assert last_loss < first_loss

    eval_ds = RetrievalEvalDataset(ann_file, T.test_transform(32), img_dir, pre)
    results = evaluate_retrieval(
        model, {"params": state.params}, eval_ds,
        k_test=3, batch_images=2, batch_texts=4, rerank_rows=2)
    for k in ("txt_r1", "img_r1", "r_mean"):
        assert 0.0 <= results[k] <= 100.0
    # overfit on 4 images: retrieval should be well above chance (25%)
    assert results["r_mean"] > 50.0, results
