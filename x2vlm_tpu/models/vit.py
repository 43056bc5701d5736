"""Plain (DeiT-style) Vision Transformer — the reference's legacy vision
backbone (models/vit.py, VisionTransformer:106). No released X2-VLM config
selects it (BEiT-2 / CLIP-ViT / Swin cover them all), but it completes the
encoder family for users migrating older X-VLM checkpoints.

Contract parity with reference vit.py:177-220:
- conv patchify + CLS token + learnable absolute position embedding
  (truncated-normal 0.02), pre-LN blocks, final LayerNorm
- output: (B, num_patches + 1, C) with CLS at index 0 — unlike BEiT-2 there
  is no mean-pooling; CLS is the pooled representation
- the grouped-image / region-attention path (`local_attn_depth`,
  reference vit.py:199-213) is deliberately handled at the composition level
  (``grouped_image_embeds`` in models/beit2.py, same policy as CLIP-ViT —
  see models/clip_vit.py docstring)
- checkpoint import: absolute pos-embed bicubic interpolation across
  resolutions is shared with CLIP-ViT (reference vit.py:224-247
  interpolate_pos_embed; train/checkpoint.py handles the remap)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.ops.layers import (
    ACTIVATIONS, DropPath, FusedLayerNorm, Mlp, MultiHeadAttention, PatchEmbed,
    checkpoint_policy,
)

__all__ = ["ViTConfig", "ViT"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_res: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0
    ln_eps: float = 1e-6
    act: str = "gelu"
    remat: bool = False
    remat_policy: Optional[str] = None  # None/"full" | "dots" | "dots_saveable"

    @property
    def num_patches(self) -> int:
        return (self.image_res // self.patch_size) ** 2

    @classmethod
    def base(cls, image_res: int = 224, **kw) -> "ViTConfig":
        return cls(image_res=image_res, **kw)

    @classmethod
    def large(cls, image_res: int = 224, **kw) -> "ViTConfig":
        return cls(image_res=image_res, embed_dim=1024, depth=24,
                   num_heads=16, **kw)


class ViTBlock(nn.Module):
    config: ViTConfig
    drop_path: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        ln = lambda name: FusedLayerNorm(epsilon=cfg.ln_eps, name=name)
        h = ln("norm1")(x)
        h = MultiHeadAttention(
            num_heads=cfg.num_heads,
            qkv_bias_mode="full",
            attn_dropout_rate=cfg.attn_dropout_rate,
            proj_dropout_rate=cfg.dropout_rate,
            dtype=self.dtype,
            name="attn",
        )(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="dp1")(h, deterministic)
        h = Mlp(hidden_dim=int(cfg.embed_dim * cfg.mlp_ratio),
                act=ACTIVATIONS[cfg.act],
                dropout_rate=cfg.dropout_rate, dtype=self.dtype, name="mlp")(
                    ln("norm2")(x), deterministic=deterministic)
        return x + DropPath(self.drop_path, name="dp2")(h, deterministic)


class ViT(nn.Module):
    """Returns (B, num_patches + 1, C): [CLS ‖ patch tokens], final-LN'd."""

    config: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        B = pixels.shape[0]
        x = PatchEmbed(cfg.embed_dim, cfg.patch_size, dtype=self.dtype,
                       name="patch_embed")(pixels)
        if x.shape[1] != cfg.num_patches:
            raise ValueError(
                f"input {pixels.shape} gives {x.shape[1]} patches, config "
                f"expects {cfg.num_patches}")

        cls_token = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                               (1, 1, cfg.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, cfg.embed_dim)), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, cfg.num_patches + 1, cfg.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        if cfg.dropout_rate > 0.0:
            x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        block_cls = nn.remat(
            ViTBlock, static_argnums=(2,),
            policy=checkpoint_policy(cfg.remat_policy),
        ) if cfg.remat else ViTBlock
        for i in range(cfg.depth):
            x = block_cls(cfg, drop_path=float(dpr[i]), dtype=self.dtype,
                          name=f"block_{i}")(x, deterministic)
        return FusedLayerNorm(epsilon=cfg.ln_eps, name="norm")(x)
