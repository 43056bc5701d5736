"""CLIP local_attn_depth region path (reference models/clip_vit.py:252-335):
the last k layers attend with per-row key masks over [region ‖ full] rows.

Semantic contracts tested, not just shapes:
- with an all-ones region mask, gather-then-encode == encode-then-gather
  (key masking with everything visible is full attention, and every other op
  is per-row) — the wiring adds nothing;
- with a real mask and local_attn_depth == depth, pixels in a masked-out
  patch CANNOT influence the region row's unmasked tokens (patchify/LN/MLP
  are per-token, attention is key-masked everywhere); with local_attn_depth
  < depth the influence flows through the early unmasked layers.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.factory import build_model
from x2vlm_tpu.models.clip_vit import CLIPViT, CLIPViTConfig

CFG = CLIPViTConfig(image_res=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2, intermediate_size=64, local_attn_depth=1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _pixels(rng, b=2):
    return jnp.asarray(rng.standard_normal((b, 32, 32, 3)), jnp.float32)


@pytest.mark.parametrize("remat", [False, True], ids=["plain", "remat"])
def test_ones_mask_equals_plain_gather(rng, remat):
    cfg = dataclasses.replace(CFG, remat=remat)
    model = CLIPViT(cfg, dtype=jnp.float32)
    pixels = _pixels(rng)
    params = model.init(jax.random.PRNGKey(0), pixels)
    plain = model.apply(params, pixels)

    idx = jnp.asarray([1, 0, 1], jnp.int32)
    atts = jnp.ones((3, plain.shape[1]), jnp.float32)
    region, full = model.apply(params, pixels, idx_to_group_img=idx,
                               image_atts=atts)
    np.testing.assert_allclose(np.asarray(region),
                               np.asarray(plain)[np.asarray(idx)],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(full), np.asarray(plain),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("k,leaks", [(2, False), (1, True)],
                         ids=["all-local", "one-local"])
def test_masked_patch_influence(rng, k, leaks):
    """Perturbing a masked-out patch's pixels must leave the region row's
    unmasked tokens bit-unchanged iff every layer is key-masked."""
    cfg = dataclasses.replace(CFG, local_attn_depth=k)
    model = CLIPViT(cfg, dtype=jnp.float32)
    pixels = _pixels(rng)
    params = model.init(jax.random.PRNGKey(0), pixels)

    # 4 patches on the 2x2 grid; region keeps CLS + patches 1,2, masks 3,4
    idx = jnp.asarray([0], jnp.int32)
    atts = jnp.asarray([[1, 1, 1, 0, 0]], jnp.float32)
    region0, _ = model.apply(params, pixels, idx_to_group_img=idx,
                             image_atts=atts)

    # patch 4 = bottom-right 16x16 block of image 0
    perturbed = pixels.at[0, 16:, 16:, :].add(3.0)
    region1, _ = model.apply(params, perturbed, idx_to_group_img=idx,
                             image_atts=atts)
    visible = np.asarray(region0)[:, :3] - np.asarray(region1)[:, :3]
    if leaks:
        assert np.abs(visible).max() > 1e-6
    else:
        np.testing.assert_array_equal(visible, 0.0)


def test_region_mask_changes_output_vs_poolmask_path(rng):
    """local_attn region rows differ from plain-encode rows (the mask bites),
    and the tower refuses region args when local_attn_depth == 0."""
    model = CLIPViT(CFG, dtype=jnp.float32)
    pixels = _pixels(rng)
    params = model.init(jax.random.PRNGKey(0), pixels)
    plain = model.apply(params, pixels)
    idx = jnp.asarray([0], jnp.int32)
    atts = jnp.asarray([[1, 1, 0, 1, 0]], jnp.float32)
    region, _ = model.apply(params, pixels, idx_to_group_img=idx,
                            image_atts=atts)
    assert np.abs(np.asarray(region[0]) - np.asarray(plain[0])).max() > 1e-4

    off = CLIPViT(dataclasses.replace(CFG, local_attn_depth=0),
                  dtype=jnp.float32)
    with pytest.raises(ValueError, match="local_attn_depth"):
        off.apply(params, pixels, idx_to_group_img=idx, image_atts=atts)


def test_xvlm_clip_local_attn_grouped_pretrain(rng):
    """End-to-end: region stream through XVLM with a local-attn CLIP tower —
    all pretrain losses finite, grads flow (reference xvlm.py:689-696)."""
    from x2vlm_tpu.models.heads import pretrain_init_inputs

    yaml_cfg = {
        "image_res": 32, "use_clip_vit": True,
        "vision_config_inline": {"patch_size": 16, "vision_width": 32,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2,
                                 "intermediate_size": 64,
                                 "local_attn_depth": 1},
        "text_encoder": "bert-tiny", "text_num_hidden_layers": 4,
        "text_fusion_start_at": 2,
        "text_config_inline": {"vocab_size": 31, "hidden_size": 32,
                               "num_heads": 2, "intermediate_size": 64,
                               "hidden_dropout": 0.0, "attn_dropout": 0.0},
        "embed_dim": 16,
    }
    model, mcfg = build_model(yaml_cfg, "pretrain")
    assert mcfg.vision.local_attn_depth == 1
    batch = pretrain_init_inputs(mcfg)
    batch["image"] = jnp.asarray(
        rng.standard_normal(batch["image"].shape), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2), ret_bbox_loss=True)

    def loss_fn(params):
        losses = model.apply({"params": params}, batch,
                             rng=jax.random.PRNGKey(3), ret_bbox_loss=True,
                             deterministic=True,
                             rngs={"dropout": jax.random.PRNGKey(4)})
        return sum(jnp.asarray(v) for v in losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for key in ("loss_itc", "loss_itm", "loss_mlm", "loss_bbox", "loss_giou"):
        assert np.isfinite(float(losses[key])), key
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_local_attn_depth_exceeding_depth_raises(rng):
    """local_attn_depth > depth would make local_from negative and silently
    return full-image rows as 'regions' — must raise instead."""
    cfg = dataclasses.replace(CFG, local_attn_depth=3)  # depth is 2
    model = CLIPViT(cfg, dtype=jnp.float32)
    pixels = _pixels(rng)
    with pytest.raises(ValueError, match="exceeds"):
        model.init(jax.random.PRNGKey(0), pixels)
