import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.core import create_mesh, global_mesh, shard_batch
from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig, XVLMForRetrieval
from x2vlm_tpu.train import (
    create_optimizer, create_train_state, lr_schedule, make_train_step,
    param_labels,
)


def tiny_cfg():
    return XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=100, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16)


class RetrievalWrapper(XVLMForRetrieval):
    """Adapts the (batch-dict, rng) train-step calling convention."""

    def __call__(self, batch, rng=None, deterministic=False):
        return super().__call__(batch["image"], batch["text_ids"],
                                batch["text_atts"], batch["idx"], rng=rng,
                                deterministic=deterministic)


def _batch(rng, bs=16):
    return {
        "image": rng.standard_normal((bs, 32, 32, 3)).astype(np.float32),
        "text_ids": rng.integers(0, 100, (bs, 8)).astype(np.int32),
        "text_atts": np.ones((bs, 8), np.int32),
        "idx": np.arange(bs).astype(np.int32),
    }


def test_lr_schedule_shape():
    sched = lr_schedule(1e-4, total_steps=100, warmup_steps=10, min_rate=0.1)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 1e-5, rtol=1e-4)
    assert float(sched(5)) == pytest.approx(5e-5, rel=1e-5)


def test_param_labels_groups():
    cfg = tiny_cfg()
    model = RetrievalWrapper(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = jax.tree_util.tree_map(jnp.asarray, _batch(rng, bs=4))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2))["params"]
    labels = param_labels(params, fusion_layer=cfg.text.fusion_layer)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    got = {"/".join(str(p.key) for p in path): lab for path, lab in flat}
    assert got["base/vision_encoder/cls_token"] == "vision"
    assert got["base/text_encoder/layer_0/self_attn/query/kernel"] == "text"
    assert got["base/text_encoder/layer_3/cross_attn/query/kernel"] == "cross"
    assert got["base/vision_proj/kernel"] == "other"


def test_train_step_runs_and_improves_on_mesh():
    cfg = tiny_cfg()
    model = RetrievalWrapper(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    raw = _batch(rng, bs=16)

    mesh = create_mesh()
    with global_mesh(mesh):
        batch = shard_batch(raw)
        params = jax.jit(lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            batch, rng=jax.random.PRNGKey(2)))(jax.random.PRNGKey(0))
        labels = param_labels(params["params"], fusion_layer=cfg.text.fusion_layer)
        tx = create_optimizer(
            params["params"], lr_schedule(1e-3, 100, warmup_steps=0),
            labels=labels)
        state = create_train_state(params, tx)
        step_fn = make_train_step(model, tx, donate=False)

        losses = []
        key = jax.random.PRNGKey(7)
        for i in range(8):
            state, metrics = step_fn(state, batch, key)
            losses.append(float(metrics["loss_total"]))
        assert np.isfinite(losses).all()
        # overfit one batch: loss should drop
        assert losses[-1] < losses[0]
        assert int(state.step) == 8


def test_temp_projection_stays_in_bounds():
    cfg = tiny_cfg()
    model = RetrievalWrapper(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = jax.tree_util.tree_map(jnp.asarray, _batch(rng, bs=8))
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2)))(jax.random.PRNGKey(0))
    tx = create_optimizer(params["params"], lr_schedule(0.5, 100, warmup_steps=0))
    state = create_train_state(params, tx)
    step_fn = make_train_step(model, tx, donate=False)
    for _ in range(5):  # huge lr would push temp out of range without projection
        state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    temp = float(state.params["base"]["temp"])
    assert 0.001 <= temp <= 0.5


def test_flat_adamw_matches_tree_chain():
    """flatten=True (one fused flat-vector update, segment-wise coefficients)
    is numerically identical to the optax chain, including global-norm clip,
    masked weight decay, per-group lr scales, and the temp projection."""
    from x2vlm_tpu.train.optim import param_labels

    key = jax.random.PRNGKey(0)
    params = {
        "base": {
            "temp": jnp.asarray(0.07, jnp.float32),
            "vision_encoder": {
                "patch_embed": {"kernel": jax.random.normal(key, (4, 8)),
                                "bias": jnp.zeros((8,))},
            },
            "text_encoder": {
                "layer_0": {"mlp": {"kernel": jax.random.normal(key, (8, 8)),
                                    "bias": jnp.zeros((8,))}},
                "layer_3": {"mlp": {"kernel": jax.random.normal(key, (8, 8)),
                                    "bias": jnp.zeros((8,))}},
            },
            "itm_head": {"kernel": jax.random.normal(key, (8, 2))},
        }
    }
    labels = param_labels(params, fusion_layer=2,
                         fresh_paths=["itm_head/kernel"])
    sched = lr_schedule(1e-2, 50, warmup_steps=5)
    kw = dict(weight_decay=0.05, clip_grad_norm=1.0, lr_mult=2.0,
              vision_lr_scale=0.5, text_lr_scale=1.5, cross_lr_scale=0.8,
              labels=labels)
    tx_tree = create_optimizer(params, sched, **kw)
    tx_flat = create_optimizer(params, sched, flatten=True, **kw)

    import optax

    p_tree = params
    p_flat = params
    s_tree = tx_tree.init(p_tree)
    s_flat = tx_flat.init(p_flat)
    for step in range(4):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.fold_in(key, step),
                                        p.shape) * 3.0, params)
        u_tree, s_tree = tx_tree.update(g, s_tree, p_tree)
        u_flat, s_flat = tx_flat.update(g, s_flat, p_flat)
        p_tree = optax.apply_updates(p_tree, u_tree)
        p_flat = optax.apply_updates(p_flat, u_flat)
    flat_leaves = jax.tree_util.tree_leaves(p_flat)
    for a, b in zip(jax.tree_util.tree_leaves(p_tree), flat_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)
    # temp stayed projected
    assert 0.001 <= float(p_flat["base"]["temp"]) <= 0.5


def test_fused_adamw_matches_optax_chain():
    """The per-leaf fused AdamW (fused=True; measured at parity on v5e and
    kept non-default) is numerically identical to the default optax chain:
    global-norm clip (triggered AND untriggered steps), masked weight decay,
    per-group lr scales, bias correction, schedule indexing, and the temp
    projection."""
    from x2vlm_tpu.train.optim import param_labels

    key = jax.random.PRNGKey(7)
    params = {
        "base": {
            "temp": jnp.asarray(0.07, jnp.float32),
            "vision_encoder": {
                "patch_embed": {"kernel": jax.random.normal(key, (4, 8)),
                                "bias": jnp.zeros((8,))},
            },
            "text_encoder": {
                "layer_0": {"mlp": {"kernel": jax.random.normal(key, (8, 8)),
                                    "bias": jnp.zeros((8,))}},
                "layer_3": {"mlp": {"kernel": jax.random.normal(key, (8, 8)),
                                    "bias": jnp.zeros((8,))}},
            },
            "itm_head": {"kernel": jax.random.normal(key, (8, 2))},
        }
    }
    labels = param_labels(params, fusion_layer=2,
                          fresh_paths=["itm_head/kernel"])
    sched = lr_schedule(1e-2, 50, warmup_steps=5)
    kw = dict(weight_decay=0.05, clip_grad_norm=1.0, lr_mult=2.0,
              vision_lr_scale=0.5, text_lr_scale=1.5, cross_lr_scale=0.8,
              labels=labels)
    tx_fused = create_optimizer(params, sched, fused=True, **kw)
    tx_chain = create_optimizer(params, sched, **kw)          # default: chain

    import optax

    p_f = p_c = params
    s_f, s_c = tx_fused.init(p_f), tx_chain.init(p_c)
    for step in range(4):
        scale = 3.0 if step % 2 == 0 else 0.01  # clip on, then off
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.fold_in(key, step),
                                        p.shape) * scale, params)
        u_f, s_f = tx_fused.update(g, s_f, p_f)
        u_c, s_c = tx_chain.update(g, s_c, p_c)
        for a, b in zip(jax.tree_util.tree_leaves(u_f),
                        jax.tree_util.tree_leaves(u_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-7)
        p_f = optax.apply_updates(p_f, u_f)
        p_c = optax.apply_updates(p_c, u_c)
    # the fused state stashes the pre-clip grad norm for the step metric
    assert "gnorm" in s_f and float(s_f["gnorm"]) > 0
    # temp stayed in range through both
    assert 0.001 <= float(p_f["base"]["temp"]) <= 0.5
