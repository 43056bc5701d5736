"""The single attention core shared by every encoder family.

One function covers all attention variants in the framework (reference spreads
these across models/beit2.py:124-166, models/xbert.py:236-430,
models/clip_vit.py:252-335, models/swin_transformer.py:167-263):

- self-attention (vision + text stacks)
- additive bias (BEiT-2 relative-position tables, Swin window bias)
- cross-attention: K/V from another sequence (fusion layers; K/V width may
  differ upstream — projection happens in the calling module)
- boolean key masks (text padding, per-region patch bitmaps)
- causal masking + incremental decode cache (UniLM caption decoding)

Layout: **(B, H, S, D)** — the TPU-native attention layout. q (B, H, Sq, D);
k, v (B, H, Skv, D); bias broadcastable to (B, H, Sq, Skv); key_mask (B, Skv),
True=attend; or an explicit full mask (B, 1|H, Sq, Skv). Output (B, H, Sq, D).

Callers produce this layout straight out of the QKV projections (reshape +
transpose fused into the projection matmul by XLA) — a standalone
(B,S,H,D)→(B,H,S,D) transpose of a 38 MB activation costs ~1 ms on v5e and
used to dominate the 224px encode when the Pallas kernel forced it.

Dispatch: the Pallas flash kernel (ops/flash_attention.py) is used on TPU for
image-stream-length sequences (197 @224px up to 2304 patches @768px); the XLA
path is used for short text sequences (<=64 tokens, where flash tiling
overhead loses) and on CPU test backends. Both paths compute softmax in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention", "make_attention_mask"]

_NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free


def make_attention_mask(
    key_mask: Optional[jnp.ndarray],
    q_len: int,
    causal: bool = False,
) -> Optional[jnp.ndarray]:
    """Build a (B, 1, Sq, Skv) boolean mask from a (B, Skv) key mask and/or causality."""
    mask = None
    if key_mask is not None:
        mask = key_mask[:, None, None, :].astype(bool)
        mask = jnp.broadcast_to(mask, (key_mask.shape[0], 1, q_len, key_mask.shape[1]))
    if causal:
        kv_len = mask.shape[-1] if mask is not None else q_len
        tri = jnp.tril(jnp.ones((q_len, kv_len), dtype=bool), k=kv_len - q_len)
        tri = tri[None, None]
        mask = tri if mask is None else (mask & tri)
    return mask


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, S, D) tensors.

    Returns (B, H, Sq, D).

    `impl`: "auto" | "xla" | "flash". "auto" picks the flash kernel on TPU when
    the variant is supported (no explicit full `mask`, no active dropout) and
    the sequence is long enough to benefit.
    """
    B, H, Sq, D = q.shape
    if scale is None:
        scale = D ** -0.5

    dropout_active = dropout_rate > 0.0 and not deterministic
    if impl != "xla" and mask is None and not dropout_active:
        from x2vlm_tpu.ops.flash_attention import flash_attention, flash_supported

        if impl == "flash" or flash_supported(q, k, bias=bias):
            return flash_attention(
                q, k, v, bias=bias, key_mask=key_mask, causal=causal, scale=scale
            )

    if mask is None and (key_mask is not None or causal):
        mask = make_attention_mask(key_mask, Sq, causal=causal)

    # XLA path — softmax in fp32; XLA fuses the elementwise chain into the matmuls.
    out_dtype = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_active:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(out_dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
