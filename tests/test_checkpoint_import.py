"""Import-parity: a tiny torch model with reference state-dict naming must
produce identical activations after conversion into the flax XVLM."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from x2vlm_tpu.models import (  # noqa: E402
    BEiT2Config, BertConfig, XVLMConfig, XVLMForPretrain,
)
from x2vlm_tpu.models.heads import pretrain_init_inputs  # noqa: E402
from x2vlm_tpu.train.checkpoint import (  # noqa: E402
    convert_xvlm_state_dict, merge_imported,
)
from tests.golden_torch import GoldenXVLM  # noqa: E402


@pytest.fixture(scope="module")
def parity_setup():
    torch.manual_seed(0)
    golden = GoldenXVLM().eval()

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=100, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0,
                        max_position_embeddings=64),
        embed_dim=16)
    model = XVLMForPretrain(cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    image = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 100, (2, 8)).astype(np.int32)
    atts = np.ones((2, 8), np.int32)
    atts[1, 6:] = 0  # padding

    batch = {
        "image": jnp.asarray(image),
        "text_ids": jnp.asarray(ids),
        "text_atts": jnp.asarray(atts),
        "text_ids_masked": jnp.asarray(ids),
        "masked_pos": jnp.zeros((2, 2), jnp.int32),
        "masked_ids": jnp.zeros((2, 2), jnp.int32),
    }
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pretrain_init_inputs(cfg), rng=jax.random.PRNGKey(2),
        ret_bbox_loss=True)

    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    tree, unused = convert_xvlm_state_dict(sd, vision_depth=2)
    params, missing = merge_imported(init, tree)

    with torch.no_grad():
        ref = golden(torch.from_numpy(image).permute(0, 3, 1, 2),
                     torch.from_numpy(ids.astype(np.int64)),
                     torch.from_numpy(atts.astype(np.float32)))
    ref = {k: v.numpy() for k, v in ref.items()}
    return model, params, batch, ref, unused, missing


def test_all_keys_consumed(parity_setup):
    _, _, _, _, unused, missing = parity_setup
    # buffers (rel-pos index) excluded by the converter; nothing else may be left
    assert unused == [], unused
    assert missing == [], missing


def test_vision_parity(parity_setup):
    model, params, batch, ref, _, _ = parity_setup
    embeds, _ = model.apply(
        params, batch["image"],
        method=lambda m, img: m.base.get_vision_embeds(img, deterministic=True))
    np.testing.assert_allclose(np.asarray(embeds), ref["img_embeds"],
                               rtol=1e-4, atol=1e-4)


def test_text_and_cross_parity(parity_setup):
    model, params, batch, ref, _, _ = parity_setup
    text = model.apply(
        params, batch["text_ids"], batch["text_atts"],
        method=lambda m, i, a: m.base.get_text_embeds(i, a, deterministic=True))
    np.testing.assert_allclose(np.asarray(text), ref["text_embeds"],
                               rtol=1e-4, atol=1e-4)

    def cross_fn(m, img, ids, atts):
        img_embeds, img_atts = m.base.get_vision_embeds(img, deterministic=True)
        return m.base.get_cross_embeds(img_embeds, img_atts, text_ids=ids,
                                       text_atts=atts, deterministic=True)

    cross = model.apply(params, batch["image"], batch["text_ids"],
                        batch["text_atts"], method=cross_fn)
    np.testing.assert_allclose(np.asarray(cross), ref["cross"],
                               rtol=1e-4, atol=1e-4)


def test_features_and_heads_parity(parity_setup):
    model, params, batch, ref, _, _ = parity_setup

    def feats_fn(m, img, ids, atts):
        img_embeds, img_atts = m.base.get_vision_embeds(img, deterministic=True)
        text_embeds = m.base.get_text_embeds(ids, atts, deterministic=True)
        fi, ft = m.base.get_features(img_embeds, text_embeds)
        cross = m.base.get_cross_embeds(img_embeds, img_atts, text_ids=ids,
                                        text_atts=atts, deterministic=True)
        itm = m.base.itm_head(cross[:, 0])
        mlm = m.base.mlm_head(cross, embedding_table=m.base._tied_table())
        import jax.nn
        bbox = jax.nn.sigmoid(m.base.bbox_head(cross[:, 0]).astype(jnp.float32))
        return fi, ft, itm, mlm, bbox

    fi, ft, itm, mlm, bbox = model.apply(
        params, batch["image"], batch["text_ids"], batch["text_atts"],
        method=feats_fn)
    np.testing.assert_allclose(np.asarray(fi), ref["img_feat"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ft), ref["txt_feat"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(itm), ref["itm"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mlm), ref["mlm"], rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(bbox), ref["bbox"], rtol=1e-4, atol=1e-4)


def test_converter_vqa_decoder_and_cls_head_keys():
    """Structural conversion of fine-tuned-checkpoint extras (text_decoder,
    cls_head) without a full golden model."""
    rng = np.random.default_rng(0)
    d, inter, vocab = 8, 16, 20

    def lin(out_d, in_d):
        return {"weight": rng.standard_normal((out_d, in_d)).astype(np.float32),
                "bias": np.zeros(out_d, np.float32)}

    sd = {}
    for i in range(2):
        p = f"text_decoder.bert.encoder.layer.{i}"
        for proj in ("query", "key", "value"):
            for k, v in lin(d, d).items():
                sd[f"{p}.attention.self.{proj}.{k}"] = v
                sd[f"{p}.crossattention.self.{proj}.{k}"] = v
        for blk in ("attention.output", "crossattention.output"):
            for k, v in lin(d, d).items():
                sd[f"{p}.{blk}.dense.{k}"] = v
            sd[f"{p}.{blk}.LayerNorm.weight"] = np.ones(d, np.float32)
            sd[f"{p}.{blk}.LayerNorm.bias"] = np.zeros(d, np.float32)
        for k, v in lin(inter, d).items():
            sd[f"{p}.intermediate.dense.{k}"] = v
        for k, v in lin(d, inter).items():
            sd[f"{p}.output.dense.{k}"] = v
        sd[f"{p}.output.LayerNorm.weight"] = np.ones(d, np.float32)
        sd[f"{p}.output.LayerNorm.bias"] = np.zeros(d, np.float32)
    sd["text_decoder.bert.embeddings.word_embeddings.weight"] = \
        rng.standard_normal((vocab, d)).astype(np.float32)
    for k, v in lin(d, d).items():
        sd[f"text_decoder.cls.predictions.transform.dense.{k}"] = v
    sd["text_decoder.cls.predictions.transform.LayerNorm.weight"] = np.ones(d, np.float32)
    sd["text_decoder.cls.predictions.transform.LayerNorm.bias"] = np.zeros(d, np.float32)
    sd["text_decoder.cls.predictions.decoder.weight"] = \
        rng.standard_normal((vocab, d)).astype(np.float32)
    sd["text_decoder.cls.predictions.bias"] = np.zeros(vocab, np.float32)
    # cls_head build_mlp
    for k, v in lin(2 * d, d).items():
        sd[f"cls_head.0.{k}"] = v
    sd["cls_head.1.weight"] = np.ones(2 * d, np.float32)
    sd["cls_head.1.bias"] = np.zeros(2 * d, np.float32)
    for k, v in lin(2, 2 * d).items():
        sd[f"cls_head.3.{k}"] = v

    tree, unused = convert_xvlm_state_dict(sd, vision_depth=0)
    assert unused == [], unused
    assert tree["text_decoder"]["layer_1"]["cross_attn"]["query"]["kernel"].shape == (d, d)
    assert tree["text_decoder"]["embeddings"]["word_embeddings"]["embedding"].shape == (vocab, d)
    assert tree["dec_head"]["decoder"]["kernel"].shape == (d, vocab)
    assert tree["cls_head"]["fc2"]["kernel"].shape == (2 * d, 2)


def test_frame_pos_embed_import_and_length_adaptation():
    """Video stage-2 checkpoints carry absolute_frame_pos_embed
    (1, frame_len, 1, C); importing into a model with a different frame_len
    loads the first min(frame_len) frames and keeps fresh init for the rest
    (reference xvlm.py:603-607)."""
    rng = np.random.default_rng(0)
    C = 8
    src = rng.standard_normal((1, 5, 1, C)).astype(np.float32)
    tree, unused = convert_xvlm_state_dict({"absolute_frame_pos_embed": src},
                                           vision_depth=0)
    assert unused == []
    for F in (5, 3, 7):
        init = {"params": {"base": {
            "frame_pos_embed": jnp.full((1, F, 1, C), 9.0, jnp.float32)}}}
        params, missing = merge_imported(init, tree)
        got = np.asarray(params["params"]["base"]["frame_pos_embed"])
        f = min(5, F)
        np.testing.assert_allclose(got[:, :f], src[:, :f])
        if F > 5:
            assert np.all(got[:, 5:] == 9.0)
        assert missing == []


def test_rel_pos_interpolation_import():
    """224→384-style fine-tune: import a small-window checkpoint into a model
    with a larger patch grid; tables interpolate, everything else transfers."""
    from x2vlm_tpu.train.checkpoint import _interp_rel_pos_table

    torch.manual_seed(1)
    golden = GoldenXVLM().eval()  # 32px/16 → window 2, table (2*2-1)²+3 = 12
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=48, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=100, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0,
                        max_position_embeddings=64),
        embed_dim=16)
    model = XVLMForPretrain(cfg, dtype=jnp.float32)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pretrain_init_inputs(cfg), rng=jax.random.PRNGKey(2),
        ret_bbox_loss=True)

    tree, unused = convert_xvlm_state_dict(sd, vision_depth=2, dst_window=3)
    params, missing = merge_imported(init, tree)
    assert unused == [] and missing == []
    # interpolated table has the 3x3-window size: (2*3-1)² + 3 = 28 rows
    assert params["params"]["base"]["vision_encoder"]["rel_pos_table_0"].shape \
        == (28, 2)

    # constant-table invariance: interpolation of a constant stays constant
    const = np.concatenate([np.full((9, 2), 0.5, np.float32),
                            np.zeros((3, 2), np.float32)])
    out = _interp_rel_pos_table(const, src_window=2, dst_window=5)
    np.testing.assert_allclose(out[:-3], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[-3:], 0.0)

    # imported 48px model runs
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((2, 48, 48, 3)), jnp.float32)
    embeds, _ = model.apply(
        params, image,
        method=lambda m, img: m.base.get_vision_embeds(img, deterministic=True))
    assert embeds.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(embeds)).all()


def test_convert_beit2_checkpoint_shared_table_expansion():
    from x2vlm_tpu.train.checkpoint import convert_beit2_checkpoint

    torch.manual_seed(2)
    golden = GoldenXVLM().eval()
    # strip to a raw beit2-style state dict: per-block → shared table
    sd = {k[len("vision_encoder."):]: v.detach().numpy()
          for k, v in golden.state_dict().items()
          if k.startswith("vision_encoder.")}
    shared = sd.pop("blocks.0.attn.relative_position_bias_table")
    sd.pop("blocks.1.attn.relative_position_bias_table")
    sd["rel_pos_bias.relative_position_bias_table"] = shared
    sd["head.weight"] = np.zeros((10, 32), np.float32)
    sd["head.bias"] = np.zeros(10, np.float32)

    tree, unused = convert_beit2_checkpoint(sd, depth=2)
    assert unused == [], unused
    np.testing.assert_array_equal(tree["rel_pos_table_0"], shared)
    np.testing.assert_array_equal(tree["rel_pos_table_1"], shared)
    assert tree["patch_embed"]["kernel"].shape == (16, 16, 3, 32)


def test_convert_hf_bert_checkpoint_with_expansion():
    from x2vlm_tpu.train.checkpoint import convert_hf_bert_checkpoint

    torch.manual_seed(3)
    golden = GoldenXVLM().eval()
    # raw HF-style names: bert.* (drop the text_encoder prefix); only
    # self-attention layers (a real HF BERT has no crossattention)
    sd = {}
    for k, v in golden.state_dict().items():
        if k.startswith("text_encoder.bert.") and "crossattention" not in k:
            sd[k[len("text_encoder."):]] = v.detach().numpy()
        elif k.startswith("text_encoder.cls."):
            sd[k[len("text_encoder."):]] = v.detach().numpy()

    tree, unused = convert_hf_bert_checkpoint(sd, to_layers=6, fusion_layer=4)
    text = tree["text_encoder"]
    assert "mlm_head" in tree
    # expansion: layers 0-3 identity, 4-5 duplicated from 2-3
    np.testing.assert_array_equal(
        text["layer_4"]["self_attn"]["query"]["kernel"],
        text["layer_2"]["self_attn"]["query"]["kernel"])
    np.testing.assert_array_equal(
        text["layer_5"]["mlp"]["fc1"]["kernel"],
        text["layer_3"]["mlp"]["fc1"]["kernel"])
    assert "layer_5" in text and "layer_6" not in text


def test_roberta_import_parity():
    """xroberta schema: .roberta. prefix, lm_head naming, position offset 2."""
    from x2vlm_tpu.models.bert import BertConfig, BertEncoder, BertMLMHead
    from tests.golden_torch import GoldenRoberta

    torch.manual_seed(4)
    golden = GoldenRoberta().eval()
    sd = {"text_encoder." + k: v.detach().numpy()
          for k, v in golden.state_dict().items()}
    tree, unused = convert_xvlm_state_dict(sd, vision_depth=0)
    assert unused == [], unused

    cfg = BertConfig(vocab_size=60, hidden_size=32, num_layers=2,
                     fusion_layer=2, num_heads=2, intermediate_size=64,
                     encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0,
                     max_position_embeddings=66, type_vocab_size=1,
                     position_offset=2)
    enc = BertEncoder(cfg, dtype=jnp.float32)
    head = BertMLMHead(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, (2, 7)).astype(np.int32)
    atts = np.ones((2, 7), np.int32)

    enc_init = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(atts), mode="text")
    import flax

    p = flax.core.unfreeze(enc_init)["params"]

    def overlay(dst, src):
        for k, v in dst.items():
            if isinstance(v, dict):
                overlay(v, src[k])
            else:
                dst[k] = jnp.asarray(src[k])

    overlay(p, tree["text_encoder"])
    out = enc.apply({"params": p}, jnp.asarray(ids), jnp.asarray(atts),
                    mode="text")

    table = p["embeddings"]["word_embeddings"]["embedding"]
    h_init = head.init(jax.random.PRNGKey(0), out, embedding_table=table)
    hp = flax.core.unfreeze(h_init)["params"]
    overlay(hp, tree["mlm_head"])
    logits = head.apply({"params": hp}, out, embedding_table=table)

    with torch.no_grad():
        ref_hidden, ref_logits = golden(
            torch.from_numpy(ids.astype(np.int64)),
            torch.from_numpy(atts.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(out), ref_hidden.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=1e-4, atol=2e-4)


def test_rel_pos_interpolation_matches_reference_algorithm():
    """Numerical parity of _interp_rel_pos_table with a direct port of the
    reference's geometric-progression + cubic scheme (reference
    beit2.py:517-578) at the real fine-tune transition 224→384px
    (window 14→24). The port below mirrors the reference line-by-line;
    scipy's RectBivariateSpline stands in for the removed interp2d (scipy
    documents it as the bug-for-bug replacement on regular grids)."""
    import numpy as np
    from scipy.interpolate import RectBivariateSpline

    from x2vlm_tpu.train.checkpoint import _interp_rel_pos_table

    src_size, dst_size, heads = 2 * 14 - 1, 2 * 24 - 1, 4
    rng = np.random.default_rng(7)
    table = rng.standard_normal((src_size * src_size + 3, heads)).astype(
        np.float32)

    # ---- direct port of reference load_pretrained_beit2 interpolation ----
    rel_pos_bias = table[:-3]
    extra_tokens = table[-3:]

    def geometric_progression(a, r, n):
        return a * (1.0 - r ** n) / (1.0 - r)

    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        gp = geometric_progression(1, q, src_size // 2)
        if gp > dst_size // 2:
            right = q
        else:
            left = q
    dis = []
    cur = 1
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-v for v in reversed(dis)]
    x = r_ids + [0] + dis
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)

    all_heads = []
    for i in range(heads):
        z = rel_pos_bias[:, i].reshape(src_size, src_size).astype(np.float64)
        # f = interp2d(x, y, z, kind='cubic'); f(dx, dy)
        f = RectBivariateSpline(np.asarray(x), np.asarray(x), z, kx=3, ky=3)
        all_heads.append(f(dx, dx).reshape(-1, 1))
    expected = np.concatenate(
        [np.concatenate(all_heads, axis=1), extra_tokens], axis=0)

    got = _interp_rel_pos_table(table, src_window=14, dst_window=24)
    assert got.shape == (dst_size * dst_size + 3, heads)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def _plus_cfg_dict(replace_text_encoder):
    """Tiny CCLM config matching GoldenXVLM's dims (vocab 100, width 32):
    2-layer uni-modal text tower + 2-layer standalone cross encoder, importing
    from an XVLMBase .th whose fused text stack has 4 layers split at 2."""
    return {
        "model_type": "cclm",
        "image_res": 32,
        "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2},
        "text_encoder": "bert-tiny",
        "text_num_hidden_layers": 2,
        "text_fusion_start_at": 2,
        "num_cross_layers": 2,
        "text_config_inline": {"vocab_size": 100, "hidden_size": 32,
                               "num_heads": 2, "intermediate_size": 64,
                               "hidden_dropout": 0.0, "attn_dropout": 0.0,
                               "max_position_embeddings": 64},
        "embed_dim": 16,
        "is_xvlm_ckpt": True,
        "xvlm_ckpt_text_num_hidden_layers": 2,
        "replace_text_encoder": replace_text_encoder,
    }


def test_base_to_plus_import_end_to_end(tmp_path):
    """launcher-level Base→Plus checkpoint split (reference
    load_pretrained_xvlm, xvlm.py:1073-1121, config contract
    multilingual_cclm_x2vlm_base.yaml:65-67): importing an XVLMBase .th into
    a CCLM/Plus model through run.load_initial_params must map the fused
    text stack's upper layers onto the standalone cross encoder — numerically,
    and with no cross_encoder path left fresh."""
    from types import SimpleNamespace

    from x2vlm_tpu.factory import build_model
    from x2vlm_tpu.models.heads import pretrain_init_inputs
    from x2vlm_tpu.run import load_initial_params

    torch.manual_seed(0)
    golden = GoldenXVLM().eval()  # 4-layer fused text stack, fusion at 2
    sd = golden.state_dict()
    path = str(tmp_path / "x2vlm_base.th")
    torch.save(sd, path)
    args = SimpleNamespace(checkpoint=path, resume=False)

    cfg = _plus_cfg_dict(replace_text_encoder=False)
    model, mcfg = build_model(cfg, "pretrain", dtype=jnp.float32)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pretrain_init_inputs(mcfg), rng=jax.random.PRNGKey(2),
        ret_bbox_loss=True)
    variables, missing = load_initial_params(args, cfg, model, init)
    base = variables["params"]["base"]

    assert not any(p.startswith("cross_encoder") for p in missing), \
        [p for p in missing if p.startswith("cross_encoder")]
    # cross layer j == golden fused-text layer (split + j), numerically
    for j, src in ((0, 2), (1, 3)):
        got = np.asarray(
            base["cross_encoder"][f"layer_{j}"]["self_attn"]["query"]["kernel"])
        want = sd[f"text_encoder.bert.encoder.layer.{src}"
                  f".attention.self.query.weight"].numpy().T
        np.testing.assert_allclose(got, want, rtol=1e-6)
        got_mlp = np.asarray(
            base["cross_encoder"][f"layer_{j}"]["mlp"]["fc1"]["kernel"])
        want_mlp = sd[f"text_encoder.bert.encoder.layer.{src}"
                      f".intermediate.dense.weight"].numpy().T
        np.testing.assert_allclose(got_mlp, want_mlp, rtol=1e-6)
    # the lower text layers stay in the (kept) text tower
    got = np.asarray(
        base["text_encoder"]["layer_0"]["self_attn"]["query"]["kernel"])
    want = sd["text_encoder.bert.encoder.layer.0"
              ".attention.self.query.weight"].numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_base_to_plus_import_replace_text_encoder(tmp_path):
    """CCLM variant: replace_text_encoder drops the .th's text tower (a fresh
    XLM-R takes its place) and the MLM head keeps only its vocab-independent
    transform (reference xvlm.py:1105-1115)."""
    from types import SimpleNamespace

    from x2vlm_tpu.factory import build_model
    from x2vlm_tpu.models.heads import pretrain_init_inputs
    from x2vlm_tpu.run import load_initial_params

    torch.manual_seed(0)
    golden = GoldenXVLM().eval()
    sd = golden.state_dict()
    path = str(tmp_path / "x2vlm_base.th")
    torch.save(sd, path)
    args = SimpleNamespace(checkpoint=path, resume=False)

    cfg = _plus_cfg_dict(replace_text_encoder=True)
    model, mcfg = build_model(cfg, "pretrain", dtype=jnp.float32)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pretrain_init_inputs(mcfg), rng=jax.random.PRNGKey(2),
        ret_bbox_loss=True)
    variables, missing = load_initial_params(args, cfg, model, init)
    base = variables["params"]["base"]

    assert not any(p.startswith("cross_encoder") for p in missing)
    # text tower entirely fresh (the golden values must NOT have landed)
    assert any(p.startswith("text_encoder/") for p in missing)
    got = np.asarray(
        base["text_encoder"]["layer_0"]["self_attn"]["query"]["kernel"])
    want = sd["text_encoder.bert.encoder.layer.0"
              ".attention.self.query.weight"].numpy().T
    assert not np.allclose(got, want)
    # vocab-tied MLM decoder bias stays fresh; the transform transfers
    assert any(p.startswith("mlm_head/") and "decoder" in p for p in missing)
    got_t = np.asarray(base["mlm_head"]["transform_dense"]["kernel"])
    want_t = sd["text_encoder.cls.predictions.transform.dense.weight"].numpy().T
    np.testing.assert_allclose(got_t, want_t, rtol=1e-6)
