"""Orbax save → restore round-trip (true resume: params + opt state + step —
the reference saves optimizer state but never restores it, SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.models import BEiT2Config, BertConfig, XVLMConfig, XVLMForRetrieval
from x2vlm_tpu.train import (
    create_optimizer, create_train_state, lr_schedule, make_train_step,
)
from x2vlm_tpu.train.checkpoint import restore_train_state, save_train_state


def test_save_restore_roundtrip(tmp_path, rng):
    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=1,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=2,
                        fusion_layer=1, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16)
    model = XVLMForRetrieval(cfg, dtype=jnp.float32)
    batch = {
        "image": jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(1, 31, (4, 8)), jnp.int32),
        "text_atts": jnp.ones((4, 8), jnp.int32),
        "idx": jnp.arange(4, dtype=jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2))
    tx = create_optimizer(variables["params"], lr_schedule(1e-3, 10))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, donate=False)
    state, _ = step_fn(state, batch, jax.random.PRNGKey(3))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(3))

    ckpt_dir = str(tmp_path / "ckpt")
    save_train_state(ckpt_dir, state, int(state.step))

    # template-based restore (resume path)
    restored, step = restore_train_state(ckpt_dir, jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state))
    assert step == 2
    assert int(restored.step) == 2
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.allclose(a, b)), restored.params, state.params))
    assert chex_equal

    # template-free restore (eval path): raw pytree with params inside
    raw, step2 = restore_train_state(ckpt_dir, None)
    assert step2 == 2
    flat = raw["params"] if isinstance(raw, dict) and "params" in raw else raw
    leaf = jax.tree_util.tree_leaves(flat)[0]
    assert np.isfinite(np.asarray(leaf)).all()

    # resuming training from the restored state works
    state2, metrics = step_fn(restored, batch, jax.random.PRNGKey(4))
    assert int(state2.step) == 3
    assert np.isfinite(float(metrics["loss_total"]))
