"""Flamingo-style Perceiver resampler (reference models/resampler.py:17-120;
optional capability — not wired into any reference config, kept for parity).

Learned latent queries cross-attend to (time-flattened) visual features; the
media sequence compresses to a fixed number of latents — useful for long
video-frame streams ahead of the fusion encoder.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from x2vlm_tpu.ops.attention import dot_product_attention

__all__ = ["PerceiverResampler"]


class PerceiverAttention(nn.Module):
    dim: int
    num_heads: int = 8
    head_dim: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, latents):
        # x: (B, T, N, C) media features; latents: (B, T, L, C)
        inner = self.num_heads * self.head_dim
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        x = ln("norm_media")(x.astype(jnp.float32)).astype(self.dtype)
        latents = ln("norm_latents")(latents.astype(jnp.float32)).astype(self.dtype)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)  # keys include latents
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(kv_input)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(kv_input)

        B, T, L, _ = q.shape
        S = k.shape[-2]

        def split(t, n):
            # bhsd layout for the attention core
            return t.reshape(B * T, n, self.num_heads,
                             self.head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q, L), split(k, S), split(v, S),
                                    impl="xla")
        out = out.transpose(0, 2, 1, 3).reshape(B, T, L, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class PerceiverResampler(nn.Module):
    dim: int
    depth: int = 2
    num_latents: int = 64
    num_heads: int = 8
    head_dim: int = 64
    ff_mult: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, T, N, C) frame features → (B, num_latents, C)."""
        B, T = x.shape[:2]
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (self.num_latents, self.dim), jnp.float32)
        time_pos = self.param("time_pos_emb", nn.initializers.normal(0.02),
                              (1, T, 1, self.dim), jnp.float32)
        x = x.astype(self.dtype) + time_pos.astype(self.dtype)
        lat = jnp.broadcast_to(latents.astype(self.dtype)[None, None],
                               (B, T, self.num_latents, self.dim))
        for i in range(self.depth):
            lat = lat + PerceiverAttention(self.dim, self.num_heads,
                                           self.head_dim, dtype=self.dtype,
                                           name=f"attn_{i}")(x, lat)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"ff_norm_{i}")(
                                 lat.astype(jnp.float32)).astype(self.dtype)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"ff1_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"ff2_{i}")(h)
            lat = lat + h
        # pool over time then final norm
        lat = jnp.mean(lat, axis=1)
        lat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           param_dtype=jnp.float32, name="norm_out")(
                               lat.astype(jnp.float32))
        return lat.astype(self.dtype)
