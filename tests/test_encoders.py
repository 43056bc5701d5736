"""CLIP-ViT / Swin / Resampler / XVLMPlus variants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2vlm_tpu.models import (
    BertConfig, BEiT2Config, CLIPViT, CLIPViTConfig, PerceiverResampler,
    SwinConfig, SwinTransformer, XVLMPlusConfig, XVLMPlusForPretrain,
    split_params_to_plus,
)


def test_int8_quant_dense_parity(rng):
    """QDense (W8A8 dynamic int8) is param-compatible with nn.Dense and its
    output stays within the expected quantization error."""
    import flax.linen as nn
    from x2vlm_tpu.ops.quant import QDense

    x = jnp.asarray(rng.standard_normal((4, 16, 64)), jnp.float32)
    ref = nn.Dense(32, dtype=jnp.float32, param_dtype=jnp.float32)
    qd = QDense(32, dtype=jnp.float32)
    p = ref.init(jax.random.PRNGKey(0), x)
    # identical param tree → the same params load into both
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        qd.init(jax.random.PRNGKey(0), x))
    y_ref = ref.apply(p, x)
    y_q = qd.apply(p, x)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel


def test_int8_quant_encoder_close(rng):
    """BEiT-2 with quant_int8 produces features close to the fp path (same
    params — serving-mode quantization, no calibration)."""
    import dataclasses as dc
    from x2vlm_tpu.models import BEiT2, BEiT2Config

    cfg = BEiT2Config(image_res=32, patch_size=16, embed_dim=64, depth=2,
                      num_heads=2, drop_path_rate=0.0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m = BEiT2(cfg, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    mq = BEiT2(dc.replace(cfg, quant_int8=True), dtype=jnp.float32)
    y = m.apply(p, x)
    yq = mq.apply(p, x)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.05, rel


def test_patch_embed_matches_conv(rng):
    """PatchEmbed (space-to-depth + matmul) is numerically and
    parameter-tree identical to the stride=patch nn.Conv it replaces."""
    import flax.linen as nn

    from x2vlm_tpu.ops.layers import PatchEmbed

    p, C = 8, 24
    pixels = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    for use_bias in (True, False):
        conv = nn.Conv(C, kernel_size=(p, p), strides=(p, p), padding="VALID",
                       use_bias=use_bias, dtype=jnp.float32,
                       param_dtype=jnp.float32)
        pe = PatchEmbed(C, p, use_bias=use_bias, dtype=jnp.float32)
        cvars = conv.init(jax.random.PRNGKey(0), pixels)
        # same param names/shapes → conv params load directly
        pvars = jax.tree_util.tree_map(lambda x: x, cvars)
        ref = conv.apply(cvars, pixels).reshape(2, -1, C)
        got = pe.apply(pvars, pixels)
        assert got.shape == ref.shape == (2, 16, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_plain_vit_shapes(rng):
    from x2vlm_tpu.models import ViT, ViTConfig
    cfg = ViTConfig(image_res=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=2)
    model = ViT(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 5, 32)  # [CLS ‖ 4 patches], final-LN'd
    assert np.isfinite(np.asarray(out)).all()
    # abs pos embed + cls token exist with the reference's shapes
    p = params["params"]
    assert p["pos_embed"].shape == (1, 5, 32)
    assert p["cls_token"].shape == (1, 1, 32)


def test_clip_vit_shapes(rng):
    cfg = CLIPViTConfig(image_res=32, patch_size=16, embed_dim=32, depth=2,
                        num_heads=2, intermediate_size=64)
    model = CLIPViT(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 5, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_shapes(rng):
    cfg = SwinConfig(image_res=32, patch_size=4, embed_dim=16,
                     depths=(1, 1), num_heads=(2, 4), window_size=4,
                     drop_path_rate=0.0)
    model = SwinTransformer(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # 32/4 = 8 → one merge → 4x4 = 16 patches, width 32
    assert out.shape == (2, 17, 32)
    assert np.isfinite(np.asarray(out)).all()
    # token 0 is the mean of the patches
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.asarray(out[:, 1:].mean(axis=1)), atol=1e-5)


def test_swin_shifted_window_mask_runs(rng):
    # larger grid so shift > 0 actually engages (8x8 grid, window 4, shift 2)
    cfg = SwinConfig(image_res=32, patch_size=4, embed_dim=16,
                     depths=(2,), num_heads=(2,), window_size=4,
                     drop_path_rate=0.0)
    model = SwinTransformer(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 65, 16)


def test_resampler(rng):
    model = PerceiverResampler(dim=32, depth=1, num_latents=8, num_heads=2,
                               head_dim=16, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 3, 10, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 8, 32)


def _plus_cfg():
    return XVLMPlusConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=31, hidden_size=32, num_layers=3,
                        fusion_layer=3, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0, attn_dropout=0.0),
        embed_dim=16, num_cross_layers=2)


def test_xvlm_plus_multimodal_and_para_text(rng):
    cfg = _plus_cfg()
    model = XVLMPlusForPretrain(cfg, dtype=jnp.float32)
    B, L = 4, 8
    batch = {
        "image": jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(1, 31, (B, L)), jnp.int32),
        "text_atts": jnp.ones((B, L), jnp.int32),
        "text_ids_masked": jnp.asarray(rng.integers(1, 31, (B, L)), jnp.int32),
        "masked_pos": jnp.asarray(rng.integers(0, L, (B, 2)), jnp.int32),
        "masked_ids": jnp.asarray(rng.integers(1, 31, (B, 2)), jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, rng=jax.random.PRNGKey(2))
    losses = model.apply(variables, batch, rng=jax.random.PRNGKey(3),
                         deterministic=True)
    for k in ("loss_itc", "loss_itm", "loss_mlm"):
        assert np.isfinite(float(losses[k])), k

    para = dict(batch)
    para["image"] = None
    para["text_ids_2"] = jnp.asarray(rng.integers(1, 31, (B, L)), jnp.int32)
    para["text_atts_2"] = jnp.ones((B, L), jnp.int32)
    plosses = model.apply(variables, para, rng=jax.random.PRNGKey(4),
                          deterministic=True)
    for k in ("loss_ttc", "loss_ttm", "loss_mlm"):
        assert np.isfinite(float(plosses[k])), k


def test_split_params_to_plus():
    base = {"text_encoder": {
        "embeddings": {"e": np.ones(1)},
        **{f"layer_{i}": {"w": np.full(1, i)} for i in range(5)}},
        "vision_encoder": {"v": np.ones(1)}}
    out = split_params_to_plus(base, fusion_layer=3, num_layers=5)
    assert out["cross_encoder"]["layer_0"]["w"][0] == 3
    assert out["cross_encoder"]["layer_1"]["w"][0] == 4
    assert "layer_4" not in out["text_encoder"]
    assert "layer_2" in out["text_encoder"]
    out2 = split_params_to_plus(base, fusion_layer=3, num_layers=5,
                                replace_text_encoder=True)
    assert "text_encoder" not in out2


def _keys(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out |= _keys(v, p)
        else:
            out.add(p)
    return out


def test_clip_vit_checkpoint_import_covers_tree(rng):
    from x2vlm_tpu.train.checkpoint import convert_clip_vit_checkpoint

    cfg = CLIPViTConfig(image_res=32, patch_size=16, embed_dim=32, depth=2,
                        num_heads=2, intermediate_size=64)
    model = CLIPViT(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), x)["params"]

    sd = {"vision_model.embeddings.patch_embedding.weight":
              rng.standard_normal((32, 3, 16, 16)).astype(np.float32),
          "vision_model.embeddings.class_embedding":
              rng.standard_normal(32).astype(np.float32),
          "vision_model.embeddings.position_embedding.weight":
              rng.standard_normal((5, 32)).astype(np.float32),
          "vision_model.embeddings.position_ids": np.arange(5),
          "vision_model.pre_layrnorm.weight": np.ones(32, np.float32),
          "vision_model.pre_layrnorm.bias": np.zeros(32, np.float32),
          "vision_model.post_layernorm.weight": np.ones(32, np.float32),
          "vision_model.post_layernorm.bias": np.zeros(32, np.float32)}
    for i in range(2):
        p = f"vision_model.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = rng.standard_normal((32, 32)).astype(np.float32)
            sd[f"{p}.self_attn.{proj}.bias"] = np.zeros(32, np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{ln}.weight"] = np.ones(32, np.float32)
            sd[f"{p}.{ln}.bias"] = np.zeros(32, np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.standard_normal((64, 32)).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = np.zeros(64, np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.standard_normal((32, 64)).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = np.zeros(32, np.float32)

    tree, unused = convert_clip_vit_checkpoint(sd, depth=2)
    assert unused == [], unused
    assert _keys(tree) == _keys(init)  # exact structural coverage


def test_swin_checkpoint_import_covers_tree(rng):
    from x2vlm_tpu.train.checkpoint import convert_swin_checkpoint

    cfg = SwinConfig(image_res=32, patch_size=4, embed_dim=16,
                     depths=(1, 1), num_heads=(2, 4), window_size=4,
                     drop_path_rate=0.0)
    model = SwinTransformer(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), x)["params"]

    sd = {"patch_embed.proj.weight": rng.standard_normal((16, 3, 4, 4)).astype(np.float32),
          "patch_embed.proj.bias": np.zeros(16, np.float32),
          "patch_embed.norm.weight": np.ones(16, np.float32),
          "patch_embed.norm.bias": np.zeros(16, np.float32),
          "norm.weight": np.ones(32, np.float32),
          "norm.bias": np.zeros(32, np.float32),
          "head.weight": np.zeros((10, 32), np.float32)}
    for s, dim, heads in ((0, 16, 2), (1, 32, 4)):
        p = f"layers.{s}.blocks.0"
        for ln in ("norm1", "norm2"):
            sd[f"{p}.{ln}.weight"] = np.ones(dim, np.float32)
            sd[f"{p}.{ln}.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.attn.qkv.weight"] = rng.standard_normal((3 * dim, dim)).astype(np.float32)
        sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.standard_normal((dim, dim)).astype(np.float32)
        sd[f"{p}.attn.proj.bias"] = np.zeros(dim, np.float32)
        window = 4
        sd[f"{p}.attn.relative_position_bias_table"] = \
            rng.standard_normal(((2 * window - 1) ** 2, heads)).astype(np.float32)
        sd[f"{p}.attn.relative_position_index"] = np.zeros((16, 16), np.int64)
        sd[f"{p}.mlp.fc1.weight"] = rng.standard_normal((4 * dim, dim)).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.standard_normal((dim, 4 * dim)).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
    sd["layers.0.downsample.reduction.weight"] = \
        rng.standard_normal((32, 64)).astype(np.float32)
    sd["layers.0.downsample.norm.weight"] = np.ones(64, np.float32)
    sd["layers.0.downsample.norm.bias"] = np.zeros(64, np.float32)

    tree, unused = convert_swin_checkpoint(sd, depths=(1, 1))
    assert unused == [], unused
    assert _keys(tree) == _keys(init)

    # window change: rel-pos tables interpolate onto the (2w-1)² lattice
    # (reference swin_transformer.py:61-77,698 — 224px/window-7 checkpoints
    # fine-tune at 384px/window-12); other params import unchanged, and the
    # resized model runs a forward pass with the imported tree
    cfg8 = SwinConfig(image_res=64, patch_size=4, embed_dim=16,
                      depths=(1, 1), num_heads=(2, 4), window_size=8,
                      drop_path_rate=0.0)
    model8 = SwinTransformer(cfg8, dtype=jnp.float32)
    x8 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    init8 = model8.init(jax.random.PRNGKey(0), x8)["params"]
    tree8, unused8 = convert_swin_checkpoint(sd, depths=(1, 1), dst_window=8)
    assert unused8 == []
    assert _keys(tree8) == _keys(init8)
    t8 = tree8["stage_0_block_0"]["attn"]["rel_pos_table"]
    assert t8.shape == ((2 * 8 - 1) ** 2, 2)
    # interpolation preserves the bias range (no blow-up from cubic overshoot)
    src_table = sd["layers.0.blocks.0.attn.relative_position_bias_table"]
    assert np.abs(t8).max() <= np.abs(src_table).max() * 1.5
    out = model8.apply({"params": tree8}, x8)
    assert np.isfinite(np.asarray(out)).all()


def test_resampler_wired_as_video_encoding(rng):
    """`video_encoding: resampler` routes 5-D video input through the
    PerceiverResampler (fixed-latent summary) instead of frame avg-pooling —
    the opt-in path for the reference's unwired resampler capability."""
    import jax
    from x2vlm_tpu.models import BertConfig, BEiT2Config
    from x2vlm_tpu.models.heads import XVLMForRetrieval
    from x2vlm_tpu.models.xvlm import XVLMConfig

    cfg = XVLMConfig(
        vision=BEiT2Config(image_res=32, patch_size=16, embed_dim=32, depth=2,
                           num_heads=2, drop_path_rate=0.0, dropout_rate=0.0),
        text=BertConfig(vocab_size=64, hidden_size=32, num_layers=4,
                        fusion_layer=2, num_heads=2, intermediate_size=64,
                        encoder_width=32, hidden_dropout=0.0,
                        attn_dropout=0.0),
        embed_dim=16, video_encoding="resampler", frame_len=2,
        add_frame_pos=True, resampler_depth=1, resampler_latents=6)
    model = XVLMForRetrieval(cfg, dtype=jnp.float32)
    frames = jnp.asarray(rng.standard_normal((2, 2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 64, (2, 8)), jnp.int32)
    atts = jnp.ones((2, 8), jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   frames, ids, atts, jnp.arange(2, dtype=jnp.int32),
                   rng=jax.random.PRNGKey(2), deterministic=True)
    assert "resampler" in v["params"]["base"]
    embeds, feat = model.apply(v, frames, method=model.encode_images)
    # fixed number of latents, not S+1 tokens
    assert embeds.shape == (2, 6, 32)
    losses = model.apply(v, frames, ids, atts, jnp.arange(2, dtype=jnp.int32),
                         rng=jax.random.PRNGKey(3), deterministic=True)
    assert np.isfinite(float(losses["loss_itc"]))
    assert np.isfinite(float(losses["loss_itm"]))
