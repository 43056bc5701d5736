"""On-chip verification: CLIP-ViT and Swin composed inside XVLM compile and
run forward + backward on the real TPU (axon backend).

Exercises the real Mosaic/XLA lowering of both alternate towers at the
production 224px retrieval config (CLIP-B/16: 197-token stream through the
shared attention core incl. the tiny/flash kernel dispatch; Swin-B: roll +
window partition/merge + rel-pos-table gathers). The CPU suite runs these
paths in interpret mode only — this script is the hardware gate.

Usage: python tools/verify_vision_swap.py  (plain python → axon backend)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.factory import build_model

CLIP_CFG = {
    "image_res": 224, "use_clip_vit": True,
    "vision_config_inline": {"patch_size": 16, "vision_width": 768,
                             "num_hidden_layers": 12,
                             "num_attention_heads": 12,
                             "intermediate_size": 3072},
    "text_encoder": "bert-base-uncased",
    "text_num_hidden_layers": 12, "text_fusion_start_at": 8,
    "embed_dim": 256,
}

SWIN_CFG = {
    "image_res": 224, "use_swin": True, "patch_size": 32,
    "vision_config_inline": {"embed_dim": 128, "depths": [2, 2, 18, 2],
                             "num_heads": [4, 8, 16, 32], "window_size": 7},
    "text_encoder": "bert-base-uncased",
    "text_num_hidden_layers": 12, "text_fusion_start_at": 8,
    "embed_dim": 256,
}


def drive(name, cfg, batch=4):
    print(f"== {name} ==", flush=True)
    model, mcfg = build_model(dict(cfg), "retrieval")
    res = cfg["image_res"]
    rng = np.random.default_rng(0)
    ex = {
        "image": jnp.asarray(rng.standard_normal((batch, res, res, 3)),
                             jnp.bfloat16).astype(jnp.float32),
        "text_ids": jnp.asarray(rng.integers(5, 1000, (batch, 40)), jnp.int32),
        "text_atts": jnp.ones((batch, 40), jnp.int32),
        "idx": jnp.arange(batch, dtype=jnp.int32),
    }
    t0 = time.time()
    variables = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.PRNGKey(1)}, ex,
        rng=jax.random.PRNGKey(2)))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print(f"  init: {time.time() - t0:.1f}s", flush=True)

    @jax.jit
    def fwd(v, b):
        out = model.apply(v, b, rng=jax.random.PRNGKey(3),
                          rngs={"dropout": jax.random.PRNGKey(4)})
        return {k: x.astype(jnp.float32) for k, x in out.items()}

    t0 = time.time()
    losses = {k: float(x) for k, x in fwd(variables, ex).items()}
    print(f"  forward ({time.time() - t0:.1f}s): {losses}", flush=True)
    assert all(np.isfinite(v) for v in losses.values()), losses

    @jax.jit
    def gstep(p, b):
        def loss_fn(p):
            out = model.apply({"params": p}, b, rng=jax.random.PRNGKey(3),
                              rngs={"dropout": jax.random.PRNGKey(4)},
                              deterministic=False)
            return sum(x.astype(jnp.float32) for x in out.values())

        loss, g = jax.value_and_grad(loss_fn)(p)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                          for x in jax.tree_util.tree_leaves(g)))
        return loss, gn

    t0 = time.time()
    loss, gn = gstep(variables["params"], ex)
    loss, gn = float(loss), float(gn)
    print(f"  backward ({time.time() - t0:.1f}s): loss={loss:.4f} "
          f"grad_norm={gn:.4f}", flush=True)
    assert np.isfinite(loss) and np.isfinite(gn) and gn > 0
    print(f"  {name}: OK", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    drive("clip-vit-B/16 224px", CLIP_CFG)
    drive("swin-B 224px", SWIN_CFG)
    print("ALL OK", flush=True)
