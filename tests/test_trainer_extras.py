"""Gradient accumulation, remat, and Plus-base task heads."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.models import (
    BEiT2Config, BertConfig, XVLMConfig, XVLMForRetrieval, XVLMPlusConfig,
)
from x2vlm_tpu.models.classification import XVLMForNLVR
from x2vlm_tpu.train import (
    create_optimizer, create_train_state, lr_schedule, make_train_step,
)


def tiny_cfg(remat=False, plus=False, remat_policy=None):
    vision = BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                         num_heads=2, drop_path_rate=0.0, dropout_rate=0.0,
                         remat=remat, remat_policy=remat_policy)
    text = BertConfig(vocab_size=31, hidden_size=32, num_layers=4,
                      fusion_layer=4 if plus else 2, num_heads=2,
                      intermediate_size=64, encoder_width=32,
                      hidden_dropout=0.0, attn_dropout=0.0, remat=remat,
                      remat_policy=remat_policy)
    if plus:
        return XVLMPlusConfig(vision=vision, text=text, embed_dim=16,
                              num_cross_layers=2)
    return XVLMConfig(vision=vision, text=text, embed_dim=16)


def _batch(rng, bs=8):
    return {
        "image": jnp.asarray(rng.standard_normal((bs, 32, 32, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(1, 31, (bs, 8)), jnp.int32),
        "text_atts": jnp.ones((bs, 8), jnp.int32),
        "idx": jnp.arange(bs, dtype=jnp.int32),
    }


def test_grad_accumulation_runs_and_matches_step_count(rng):
    model = XVLMForRetrieval(tiny_cfg(), dtype=jnp.float32)
    batch = _batch(rng, bs=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2))
    tx = create_optimizer(variables["params"], lr_schedule(1e-3, 10))
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False, accum_steps=2)
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state.step) == 1


def test_remat_matches_no_remat_loss(rng):
    """Remat (full and dots-saveable policy) must not change loss or grads —
    it only changes what is saved for the backward."""
    batch = _batch(rng, bs=4)
    losses = {}
    grads = {}
    for remat, policy in ((False, None), (True, None), (True, "dots")):
        model = XVLMForRetrieval(
            tiny_cfg(remat=remat, remat_policy=policy), dtype=jnp.float32)
        variables = jax.jit(lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            batch, rng=jax.random.PRNGKey(2)))(jax.random.PRNGKey(0))
        # loss + grad in one jitted program (also: warm suite runs load it
        # from the persistent compile cache instead of eager re-dispatch)
        @jax.jit
        def loss_and_grad(p):
            def f(p_):
                return model.apply({"params": p_}, batch,
                                   rng=jax.random.PRNGKey(3),
                                   deterministic=True)["loss_itc"]
            return f(p), jax.grad(f)(p)

        loss, g = loss_and_grad(variables["params"])
        losses[(remat, policy)] = float(loss)
        grads[(remat, policy)] = g
        # gradient flows through remat
        gn = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0))
        assert np.isfinite(gn) and gn > 0
    base = losses[(False, None)]
    assert base == pytest.approx(losses[(True, None)], rel=1e-5)
    assert base == pytest.approx(losses[(True, "dots")], rel=1e-5)
    for variant in ((True, None), (True, "dots")):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            grads[(False, None)], grads[variant])


def test_checkpoint_policy_names():
    from x2vlm_tpu.ops.layers import checkpoint_policy
    assert checkpoint_policy(None) is None
    assert checkpoint_policy("full") is None
    assert checkpoint_policy("dots") is not None
    assert checkpoint_policy("dots_saveable") is not None
    with pytest.raises(ValueError, match="remat_policy"):
        checkpoint_policy("typo")


def test_plus_base_heads(rng):
    """Task heads on the Plus/CCLM base (multilingual tasks: WIT/xFlickrCO
    retrieval, XVNLI/MARVL classification)."""
    cfg = tiny_cfg(plus=True)
    model = XVLMForRetrieval(cfg, dtype=jnp.float32)
    batch = _batch(rng, bs=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2))
    assert "cross_encoder" in variables["params"]["base"]
    out = model.apply(variables, batch, rng=jax.random.PRNGKey(3),
                      deterministic=True)
    assert np.isfinite(float(out["loss_itc"]))
    assert np.isfinite(float(out["loss_itm"]))

    nlvr = XVLMForNLVR(cfg, dtype=jnp.float32)
    nb = {"image0": batch["image"], "image1": batch["image"],
          "text_ids": batch["text_ids"], "text_atts": batch["text_atts"],
          "labels": jnp.asarray([0, 1, 0, 1], jnp.int32)}
    v = nlvr.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, nb)
    out = nlvr.apply(v, nb, deterministic=True)
    assert np.isfinite(float(out["loss_cls"]))
