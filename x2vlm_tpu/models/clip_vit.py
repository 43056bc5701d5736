"""CLIP-ViT vision encoder (alternative backbone; reference models/clip_vit.py).

Pre-LN ViT: bias-free conv patchify, learnable class embedding, learned
absolute position embeddings, pre-LN blocks with QuickGELU, pre- and
post-LayerNorm (eps 1e-5). Output (B, S+1, C), token 0 = CLS (unlike BEiT-2's
mean-pool token).

``local_attn_depth > 0`` enables the region path inside the tower (reference
clip_vit.py:252-335): the last k layers run on [gathered region rows ‖ full
rows] with a per-row *key* mask (region patches only for the gathered rows,
all-ones for the originals), so region CLS features attend only inside their
region. With ``local_attn_depth <= 0`` (every shipped reference config) the
tower takes no region arguments and region handling stays at the composition
level (grouped_image_embeds masked avgpool)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2vlm_tpu.ops.layers import MultiHeadAttention, PatchEmbed, checkpoint_policy

__all__ = ["CLIPViTConfig", "CLIPViT", "quick_gelu"]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# `hidden_act` values accepted by the vision JSON (HF CLIP ships quick_gelu)
CLIP_ACTIVATIONS = {
    "quick_gelu": quick_gelu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    image_res: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    attn_dropout_rate: float = 0.0  # vision JSON `attention_dropout`
    act: str = "quick_gelu"         # vision JSON `hidden_act` (ACT2FN lookup,
                                    # reference clip_vit.py:176-178)
    # region path: the last k layers attend with per-row key masks on
    # [region ‖ full] rows (reference clip_vit.py:308-322); <= 0 disables
    local_attn_depth: int = 0
    ln_eps: float = 1e-5
    remat: bool = False        # gradient checkpointing per block
    remat_policy: Optional[str] = None  # None/"full" | "dots" | "dots_saveable"

    @property
    def num_patches(self) -> int:
        return (self.image_res // self.patch_size) ** 2

    @classmethod
    def base(cls, image_res: int = 224, **kw):
        return cls(image_res=image_res, **kw)


class CLIPBlock(nn.Module):
    config: CLIPViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic: bool = True):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        h = ln("layer_norm1")(x.astype(jnp.float32)).astype(self.dtype)
        h = MultiHeadAttention(num_heads=cfg.num_heads,
                               attn_dropout_rate=cfg.attn_dropout_rate,
                               dtype=self.dtype, name="attn")(
                                   h, key_mask=key_mask,
                                   deterministic=deterministic)
        x = x + h
        h = ln("layer_norm2")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = CLIP_ACTIVATIONS[cfg.act](h)
        h = nn.Dense(cfg.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class CLIPViT(nn.Module):
    config: CLIPViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixels, deterministic: bool = True,
                 idx_to_group_img=None, image_atts=None):
        """Plain: (B, H, W, 3) → (B, S+1, C).

        Region mode (requires ``local_attn_depth > 0``; reference
        clip_vit.py:304-335): also pass ``idx_to_group_img`` (B_r,) int — the
        image each region row comes from — and ``image_atts`` (B_r, S+1)
        region key masks (position 0 = CLS, always 1). The first
        ``depth - local_attn_depth`` layers run on the B images; region rows
        are then gathered, concatenated with the full rows, and the last k
        layers attend with key masks [image_atts ‖ ones]. Returns
        (region (B_r, S+1, C), full (B, S+1, C)), both post-LayerNormed."""
        cfg = self.config
        grouped = idx_to_group_img is not None
        if grouped and cfg.local_attn_depth <= 0:
            raise ValueError("region arguments require local_attn_depth > 0; "
                             "use the composition-level grouped path instead")
        if cfg.local_attn_depth > cfg.depth:
            # otherwise local_from goes negative, the region gather never
            # fires, and the final split silently returns full-image rows
            raise ValueError(
                f"local_attn_depth={cfg.local_attn_depth} exceeds "
                f"depth={cfg.depth}")
        B = pixels.shape[0]
        x = PatchEmbed(cfg.embed_dim, cfg.patch_size, use_bias=False,
                       dtype=self.dtype, name="patch_embed")(pixels)
        cls = self.param("class_embedding", nn.initializers.normal(1.0),
                         (cfg.embed_dim,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, cfg.embed_dim)), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.embed_dim), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="pre_layernorm")(
                             x.astype(jnp.float32)).astype(self.dtype)
        block_cls = nn.remat(
            CLIPBlock, static_argnums=(3,),
            policy=checkpoint_policy(cfg.remat_policy),
        ) if cfg.remat else CLIPBlock
        local_from = (cfg.depth - cfg.local_attn_depth
                      if cfg.local_attn_depth > 0 else cfg.depth)
        key_mask = None
        for i in range(cfg.depth):
            if grouped and i == local_from:
                # gather region rows from their source images, run the last
                # k layers on [region ‖ full] with per-row key masks
                # (reference clip_vit.py:311-317; gather is cross-batch →
                # all-gather once, take shard-locally, re-pin to batch)
                from x2vlm_tpu.core import mesh as mesh_lib

                region = mesh_lib.constrain_batch(jnp.take(
                    mesh_lib.constrain_replicated(x), idx_to_group_img,
                    axis=0))
                x = jnp.concatenate([region, x], axis=0)
                key_mask = jnp.concatenate(
                    [image_atts.astype(jnp.int32),
                     jnp.ones((B, x.shape[1]), jnp.int32)], axis=0)
            mask_i = key_mask if (grouped and i >= local_from) else None
            x = block_cls(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, mask_i, deterministic)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="post_layernorm")(
                             x.astype(jnp.float32))
        x = x.astype(self.dtype)
        if grouped:
            n_region = idx_to_group_img.shape[0]
            return x[:n_region], x[n_region:]
        return x
