"""CLIP-ViT vision encoder (alternative backbone; reference models/clip_vit.py).

Pre-LN ViT: bias-free conv patchify, learnable class embedding, learned
absolute position embeddings, pre-LN blocks with QuickGELU, pre- and
post-LayerNorm (eps 1e-5). Output (B, S+1, C), token 0 = CLS (unlike BEiT-2's
mean-pool token). The deprecated ``local_attn_depth`` region path is
intentionally absent — region handling is unified at the composition level
(grouped_image_embeds), which the reference's BEiT-2 default also uses.
"""

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
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        h = ln("layer_norm1")(x.astype(jnp.float32)).astype(self.dtype)
        h = MultiHeadAttention(num_heads=cfg.num_heads,
                               attn_dropout_rate=cfg.attn_dropout_rate,
                               dtype=self.dtype, name="attn")(
                                   h, deterministic=deterministic)
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
    def __call__(self, pixels, deterministic: bool = True):
        cfg = self.config
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
            CLIPBlock, static_argnums=(2,),
            policy=checkpoint_policy(cfg.remat_policy),
        ) if cfg.remat else CLIPBlock
        for i in range(cfg.depth):
            x = block_cls(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, deterministic)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="post_layernorm")(
                             x.astype(jnp.float32))
        return x.astype(self.dtype)
