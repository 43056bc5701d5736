"""BEiT-2 vision encoder — the default X2-VLM vision backbone.

Capability parity with reference models/beit2.py (VisionTransformer:274), as
an idiomatic flax stack on the shared attention core:

- patch conv embedding (NHWC — TPU-native conv layout), learnable CLS token,
  no absolute positional embedding (X2-VLM builds BEiT-2 with
  use_abs_pos_emb=False, use_rel_pos_bias=True; reference xvlm.py:262-268)
- per-block relative-position bias tables over a static (Wh, Ww) window with
  the 3 extra cls-interaction indices (reference beit2.py:89-115); the index
  matrix is computed host-side once (static shapes) and the gathered bias
  feeds the flash kernel as a streamed additive bias
- pre-LN blocks with LayerScale (gamma_1/gamma_2, init 0.1) and stochastic
  depth (linearly increasing rate; reference beit2.py:185-207,313)
- output contract: token 0 is the *mean-pooled* patch representation
  (use_mean_pooling=True → fc_norm LayerNorm, no final norm), tokens 1..S are
  the patches — ``[avgpool ‖ patches]`` (reference beit2.py:409-424)

Size presets: base (768/12/12), large (1024/24/16), huge, giant
(reference beit2.py:439-470).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from x2vlm_tpu.ops.layers import (
    ACTIVATIONS, DropPath, FusedLayerNorm, Mlp, MultiHeadAttention, PatchEmbed,
    checkpoint_policy, gelu_exact,
)

__all__ = ["BEiT2Config", "BEiT2", "relative_position_index"]


@dataclasses.dataclass(frozen=True)
class BEiT2Config:
    image_res: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    init_values: float = 0.1  # LayerScale init
    drop_path_rate: float = 0.1
    dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0
    ln_eps: float = 1e-6
    act: str = "gelu"          # "gelu" (erf; torch parity) | "gelu_fast" (tanh)
    remat: bool = False        # gradient checkpointing per block (jax.checkpoint)
    remat_policy: Optional[str] = None  # None/"full" | "dots" | "dots_saveable"
    quant_int8: bool = False   # serving: int8 W8A8 projections/FFN (ops/quant.py)

    @property
    def window(self) -> Tuple[int, int]:
        w = self.image_res // self.patch_size
        return (w, w)

    @property
    def num_patches(self) -> int:
        w, h = self.window
        return w * h

    @property
    def num_relative_distance(self) -> int:
        wh, ww = self.window
        return (2 * wh - 1) * (2 * ww - 1) + 3

    @classmethod
    def base(cls, image_res: int = 224, **kw) -> "BEiT2Config":
        return cls(image_res=image_res, embed_dim=768, depth=12, num_heads=12, **kw)

    @classmethod
    def large(cls, image_res: int = 224, **kw) -> "BEiT2Config":
        return cls(image_res=image_res, embed_dim=1024, depth=24, num_heads=16, **kw)

    @classmethod
    def huge(cls, image_res: int = 224, **kw) -> "BEiT2Config":
        return cls(image_res=image_res, patch_size=14, embed_dim=1280, depth=32,
                   num_heads=16, **kw)

    @classmethod
    def giant(cls, image_res: int = 224, **kw) -> "BEiT2Config":
        return cls(image_res=image_res, patch_size=14, embed_dim=1408, depth=40,
                   num_heads=16, mlp_ratio=6144 / 1408, **kw)


def relative_position_index(window: Tuple[int, int]) -> np.ndarray:
    """Static (Wh*Ww+1, Wh*Ww+1) index into the rel-pos table, with the last 3
    table rows reserved for cls→token / token→cls / cls→cls."""
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, Wh*Ww)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class BEiT2Block(nn.Module):
    config: BEiT2Config
    drop_path: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, deterministic: bool = True):
        cfg = self.config
        # bf16-I/O LayerNorm with fp32 stats + recompute-in-backward (the
        # stock fp32-materializing path cost ~20 ms/step in fusion traffic)
        ln = lambda name: FusedLayerNorm(epsilon=cfg.ln_eps, name=name)
        h = ln("norm1")(x.astype(self.dtype))
        h = MultiHeadAttention(
            num_heads=cfg.num_heads,
            qkv_bias_mode="qv",
            attn_dropout_rate=cfg.attn_dropout_rate,
            proj_dropout_rate=cfg.dropout_rate,
            dtype=self.dtype,
            quant=cfg.quant_int8,
            name="attn",
        )(h, bias=rel_pos_bias, deterministic=deterministic)
        gamma_1 = self.param("gamma_1", nn.initializers.constant(cfg.init_values),
                             (cfg.embed_dim,), jnp.float32)
        x = x + DropPath(self.drop_path, name="dp1")(
            h * gamma_1.astype(self.dtype), deterministic)

        h = ln("norm2")(x.astype(self.dtype))
        h = Mlp(hidden_dim=int(cfg.embed_dim * cfg.mlp_ratio),
                act=ACTIVATIONS[cfg.act],
                dropout_rate=cfg.dropout_rate, dtype=self.dtype,
                quant=cfg.quant_int8, name="mlp")(
                    h, deterministic=deterministic)
        gamma_2 = self.param("gamma_2", nn.initializers.constant(cfg.init_values),
                             (cfg.embed_dim,), jnp.float32)
        x = x + DropPath(self.drop_path, name="dp2")(
            h * gamma_2.astype(self.dtype), deterministic)
        return x


class BEiT2(nn.Module):
    """Returns (B, num_patches + 1, C): [mean-pooled-cls ‖ patch tokens]."""

    config: BEiT2Config
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, deterministic: bool = True):
        cfg = self.config
        B = pixels.shape[0]
        x = PatchEmbed(cfg.embed_dim, cfg.patch_size, dtype=self.dtype,
                       name="patch_embed")(pixels)
        S = x.shape[1]
        if S != cfg.num_patches:
            raise ValueError(
                f"input {pixels.shape} gives {S} patches, config expects {cfg.num_patches}"
            )

        cls_token = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                               (1, 1, cfg.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, cfg.embed_dim)), x],
            axis=1,
        )

        rel_index = jnp.asarray(relative_position_index(cfg.window))  # (S+1, S+1)
        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        # rematerialization: recompute block activations in backward (replaces
        # the reference's unused gradient-checkpointing flag, xbert.py:700-724)
        block_cls = nn.remat(
            BEiT2Block, static_argnums=(3,),
            policy=checkpoint_policy(cfg.remat_policy),
        ) if cfg.remat else BEiT2Block

        # All depth × H bias tables gathered in ONE wide gather (and one
        # scatter-add in backward): 12 per-layer (40k-row, 12-col) gathers ran
        # at ~2.1 ms fwd + 3.5 ms scatter bwd per step on v5e — TPU gathers
        # are index-bound, so one 144-wide gather amortizes them. Emitted in
        # compute dtype: the flash kernel streams the bias per KV block and
        # bf16 halves its HBM traffic (the table params stay fp32).
        tables = [
            self.param(f"rel_pos_table_{i}", nn.initializers.zeros,
                       (cfg.num_relative_distance, cfg.num_heads), jnp.float32)
            for i in range(cfg.depth)
        ]
        stacked = jnp.concatenate(tables, axis=-1)       # (nrel, depth*H)
        gathered = stacked[rel_index]                    # (S+1, S+1, depth*H)
        S1 = gathered.shape[0]
        biases = jnp.transpose(gathered, (2, 0, 1)).reshape(
            cfg.depth, 1, cfg.num_heads, S1, S1).astype(self.dtype)

        for i in range(cfg.depth):
            x = block_cls(cfg, drop_path=float(dpr[i]), dtype=self.dtype,
                          name=f"block_{i}")(x, biases[i], deterministic)

        # use_mean_pooling contract: final norm is identity; fc_norm over patches;
        # "cls" output token = mean over patch tokens (reference beit2.py:409-416).
        patches = x[:, 1:, :].astype(jnp.float32)
        patches = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                               param_dtype=jnp.float32, name="fc_norm")(patches)
        pooled = jnp.mean(patches, axis=1, keepdims=True)
        out = jnp.concatenate([pooled, patches], axis=1)
        return out.astype(self.dtype)


def grouped_image_embeds(
    vision_embeds: jnp.ndarray,
    idx_to_group_img: jnp.ndarray,
    image_atts: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Region-text path: expand per-image embeddings to per-region rows and
    replace the pooled token with a region-masked average pool.

    vision_embeds: (B_img, S+1, C) from the encoder ([pooled ‖ patches]).
    idx_to_group_img: (B_region,) int — which image each region row uses.
    image_atts: (B_region, S+1) float/bool — 1 for patches inside the region
    (position 0 is the cls slot; reference beit2.py:426-436 uses [:, 1:]).

    Returns (region_embeds, full_embeds): region rows with masked avgpool cls,
    and the gathered full-attention rows (for bbox prediction on full images).
    """
    from x2vlm_tpu.core import mesh as mesh_lib

    # cross-batch expansion (regions of one image land on several shards):
    # all-gather the per-image rows once, take shard-locally, keep the
    # per-region result batch-sharded — avoids SPMD involuntary remat
    vision_embeds = mesh_lib.constrain_replicated(vision_embeds)
    full = mesh_lib.constrain_batch(
        jnp.take(vision_embeds, idx_to_group_img, axis=0))  # (B_r, S+1, C)
    patches = full[:, 1:, :]
    weights = image_atts[:, 1:, None].astype(patches.dtype)  # (B_r, S, 1)
    pooled = jnp.sum(weights * patches, axis=1, keepdims=True) / jnp.maximum(
        jnp.sum(weights, axis=1, keepdims=True), 1e-6
    )
    region = jnp.concatenate([pooled, patches], axis=1)
    return region, full
