"""Stochastic depth (drop-path) parity: text/cross schedules in the BERT
stack (reference xbert.py:633-650, knobs read at xvlm.py:299-300) and the
Swin drop_path_rate (timm schedule, built at reference xvlm.py:260)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.models.bert import BertConfig, BertEncoder, drop_path_schedule
from x2vlm_tpu.models.swin import SwinConfig, SwinTransformer


def _tiny_cfg(**kw):
    kw.setdefault("vocab_size", 31)
    kw.setdefault("hidden_size", 32)
    kw.setdefault("num_layers", 4)
    kw.setdefault("fusion_layer", 2)
    kw.setdefault("num_heads", 2)
    kw.setdefault("intermediate_size", 64)
    kw.setdefault("encoder_width", 32)
    kw.setdefault("hidden_dropout", 0.0)
    kw.setdefault("attn_dropout", 0.0)
    return BertConfig(**kw)


def test_schedule_matches_reference_linspace():
    """Per-layer rates == torch.linspace(0, text, n_text) ++
    torch.linspace(0, cross, n_cross) (reference xbert.py:643-648)."""
    import torch

    cfg = BertConfig(num_layers=18, fusion_layer=12,
                     text_drop_path_rate=0.1, cross_drop_path_rate=0.1)
    got = drop_path_schedule(cfg)
    want = [x.item() for x in torch.linspace(0, 0.1, 12)] + \
           [x.item() for x in torch.linspace(0, 0.1, 6)]
    assert len(got) == 18
    np.testing.assert_allclose(got, want, atol=1e-7)
    # text-only stacks (fusion_layer == num_layers) get the pure text ramp
    cfg2 = BertConfig(num_layers=12, fusion_layer=12,
                      text_drop_path_rate=0.2, cross_drop_path_rate=0.2)
    np.testing.assert_allclose(
        drop_path_schedule(cfg2),
        [x.item() for x in torch.linspace(0, 0.2, 12)], atol=1e-7)
    # decoder stacks (fusion_layer=0): pure cross ramp
    cfg3 = BertConfig(num_layers=6, fusion_layer=0,
                      cross_drop_path_rate=0.3)
    np.testing.assert_allclose(
        drop_path_schedule(cfg3),
        [x.item() for x in torch.linspace(0, 0.3, 6)], atol=1e-7)


def test_text_rate_zeroes_hidden_dropout_and_requires_cross():
    cfg = _tiny_cfg(hidden_dropout=0.1, text_drop_path_rate=0.1,
                    cross_drop_path_rate=0.1)
    assert cfg.hidden_dropout == 0.0  # reference xbert.py:639-641 "fixed"
    # cross-only is allowed and does NOT zero hidden dropout
    cfg2 = _tiny_cfg(hidden_dropout=0.1, cross_drop_path_rate=0.1)
    assert cfg2.hidden_dropout == 0.1
    with pytest.raises(ValueError):
        _tiny_cfg(text_drop_path_rate=0.1)  # xbert.py:638 assert


def test_bert_drop_path_train_stochastic_eval_identical(rng):
    cfg0 = _tiny_cfg()
    cfg1 = _tiny_cfg(text_drop_path_rate=0.5, cross_drop_path_rate=0.5)
    ids = jnp.asarray(rng.integers(0, 31, (4, 8)), jnp.int32)
    att = jnp.ones((4, 8), jnp.int32)
    img = jnp.asarray(rng.standard_normal((4, 5, 32)), jnp.float32)
    m0 = BertEncoder(cfg0, dtype=jnp.float32)
    m1 = BertEncoder(cfg1, dtype=jnp.float32)
    params = m0.init(jax.random.PRNGKey(0), ids, att,
                     encoder_hidden_states=img, encoder_attention_mask=None)
    # DropPath has no params: the same tree loads into the dp>0 model
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(m1.init(
            jax.random.PRNGKey(0), ids, att, encoder_hidden_states=img,
            encoder_attention_mask=None))

    kw = dict(encoder_hidden_states=img, encoder_attention_mask=None)
    # eval mode: bit-identical to the no-drop-path model
    y0 = m0.apply(params, ids, att, **kw)
    y1 = m1.apply(params, ids, att, **kw)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    # train mode: stochastic across rng keys, differs from eval
    t1 = m1.apply(params, ids, att, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)}, **kw)
    t2 = m1.apply(params, ids, att, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)}, **kw)
    assert not np.allclose(np.asarray(t1), np.asarray(y1))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # the no-drop-path model is rng-invariant here (all dropouts are 0)
    t0 = m0.apply(params, ids, att, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)}, **kw)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(y0))

    # grads flow and are rng-dependent under drop-path
    def loss(p, key):
        out = m1.apply(p, ids, att, deterministic=False,
                       rngs={"dropout": key}, **kw)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss)(params, jax.random.PRNGKey(1))
    g2 = jax.grad(loss)(params, jax.random.PRNGKey(2))
    l0 = jax.tree_util.tree_leaves(g1)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in l0)
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(l0, jax.tree_util.tree_leaves(g2))]
    assert any(diffs)


def test_swin_drop_path_live(rng):
    """SwinConfig.drop_path_rate is applied (was a dead field): train mode is
    stochastic, eval mode bit-identical to a rate-0 model on the same params."""
    base = dict(image_res=16, patch_size=4, embed_dim=8, depths=(1, 1),
                num_heads=(2, 2), window_size=2)
    cfg0 = SwinConfig(drop_path_rate=0.0, **base)
    cfg1 = SwinConfig(drop_path_rate=0.5, **base)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    m0 = SwinTransformer(cfg0, dtype=jnp.float32)
    m1 = SwinTransformer(cfg1, dtype=jnp.float32)
    params = m0.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(0), x))
    y0 = m0.apply(params, x)
    y1 = m1.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    t1 = m1.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = m1.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(y1))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_factory_plumbs_drop_path_and_plus_raises():
    from x2vlm_tpu.factory import text_config_from_yaml, xvlm_config_from_yaml

    yaml = {
        "image_res": 32,
        "vision_config_inline": {"vision_width": 32, "patch_size": 16,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2},
        "text_encoder": "bert-tiny",
        "text_num_hidden_layers": 4,
        "text_fusion_start_at": 2,
        "text_drop_path_rate": 0.1,
        "cross_drop_path_rate": 0.1,
    }
    tcfg = text_config_from_yaml(yaml, 32)
    assert tcfg.text_drop_path_rate == 0.1
    assert tcfg.cross_drop_path_rate == 0.1
    assert tcfg.hidden_dropout == 0.0
    mcfg = xvlm_config_from_yaml(yaml)
    assert mcfg.text.text_drop_path_rate == 0.1
    # the reference's Plus stack asserts the knob away (xvlm.py:1012)
    with pytest.raises(ValueError):
        xvlm_config_from_yaml(dict(yaml, model_type="cclm"))
    # `dropout` YAML knob (reference xvlm.py:298) reaches hidden_dropout
    tcfg2 = text_config_from_yaml({"text_encoder": "bert-tiny",
                                   "dropout": 0.2}, 32)
    assert tcfg2.hidden_dropout == 0.2


def test_grounding_large_yaml_carries_drop_path():
    """The ported refcoco_grounding_large.yaml keeps the reference's
    stochastic-depth knobs (reference refcoco_grounding_large.yaml:24-25)."""
    import yaml as _yaml

    with open("configs/finetune/refcoco_grounding_large.yaml") as f:
        cfg = _yaml.safe_load(f)
    assert cfg["text_drop_path_rate"] == 0.1
    assert cfg["cross_drop_path_rate"] == 0.1
