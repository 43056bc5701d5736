"""Pallas TPU flash attention (block-wise online-softmax, O(Sq·D) memory).

Covers the framework's long-sequence hot paths — image token streams of
(res/16)²+1 tokens: 197 @224px, 577 @384px, 2305 @768px (reference runs these
as materialized quadratic attention, e.g. models/beit2.py:124-166) — with:

- additive bias broadcastable to (B, H, Sq, Skv): BEiT-2 relative-position
  tables (1, H, S, S) stream in block-by-block, never materialized per-batch;
- key padding masks (B, Skv) folded into an additive f32 row;
- causal masking computed from block indices (nothing materialized);
- cross-attention (Skv != Sq).

Grid: (B, H, Sq/block_q). Each program keeps its full (Skv, D) K/V panel in
VMEM (<=2305·128·2B ≈ 0.6 MB per operand at head_dim 128 — far under the
16 MB/core budget) and loops over Skv blocks with the online-softmax
recurrence; stats and accumulator live in the loop carry (vector registers).

Backward: recompute-based VJP through the XLA path — O(Sq·Skv) memory only
inside the backward of long-sequence ops, which in this workload run
forward-only (retrieval/VQA encode). A Pallas backward kernel is the
designated follow-up optimization.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30

# Set X2VLM_FLASH_INTERPRET=1 to run the Pallas kernel in interpreter mode on
# CPU backends (used by the test suite to exercise the kernel itself).
_INTERPRET = os.environ.get("X2VLM_FLASH_INTERPRET", "0") == "1"

__all__ = ["flash_attention", "flash_supported"]


def flash_supported(q: jnp.ndarray, k: jnp.ndarray, bias=None) -> bool:
    """Heuristic dispatch: flash wins once the KV panel is long enough that the
    materialized (Sq, Skv) logits dominate HBM traffic."""
    if jax.default_backend() != "tpu":
        return False
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    if D > 256:
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return Skv >= 512 and Sq >= 128


def _kernel(has_bias: bool, causal: bool, block_q: int, block_kv: int,
            sq: int, skv: int, *refs):
    if has_bias:
        q_ref, k_ref, v_ref, krow_ref, bias_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, krow_ref, o_ref = refs
        bias_ref = None

    qi = pl.program_id(2)
    q = q_ref[0, 0, :, :].astype(jnp.float32)  # (block_q, D) — pre-scaled
    d = q.shape[-1]
    num_kv = skv // block_kv

    if causal:
        # Skip KV blocks strictly above the diagonal for this Q block.
        q_end = (qi + 1) * block_q
        num_kv_run = jax.lax.div(q_end + block_kv - 1, block_kv)
    else:
        num_kv_run = num_kv

    def body(j, carry):
        acc, m, l = carry
        kv_slice = pl.ds(j * block_kv, block_kv)
        kb = k_ref[0, 0, kv_slice, :].astype(jnp.float32)      # (block_kv, D)
        vb = v_ref[0, 0, kv_slice, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_kv)
        s = s + krow_ref[0, 0, kv_slice][None, :]
        if bias_ref is not None:
            s = s + bias_ref[0, 0, :, kv_slice].astype(jnp.float32)
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            kv_ids = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(q_ids >= kv_ids, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_new = acc * alpha + pv
        return acc_new, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), _NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, num_kv_run, body, init)
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _flash_forward(q, k, v, bias, key_mask, causal, scale,
                   block_q: int = 256, block_kv: int = 512):
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    out_dtype = q.dtype

    # (B, H, S, D) layout for blocking.
    qt = jnp.swapaxes(q, 1, 2) * jnp.asarray(scale, q.dtype)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    block_q = min(block_q, max(Sq, 8))
    block_kv = min(block_kv, max(Skv, 128))
    qt = _pad_to(qt, 2, block_q)
    kt = _pad_to(kt, 2, block_kv)
    vt = _pad_to(vt, 2, block_kv)
    Sq_p, Skv_p = qt.shape[2], kt.shape[2]

    # Additive key row: 0 = attend, -inf = masked; also kills KV padding.
    if key_mask is not None:
        krow = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)
    else:
        krow = jnp.zeros((B, Skv), jnp.float32)
    krow = _pad_to(krow, 1, block_kv, value=_NEG_INF)
    # (B, 1, Skv_p): TPU block shapes need the trailing dims to be full-size
    # or tile-aligned; the singleton axis makes (1, Skv_p) a full-size block.
    krow = krow[:, None, :]

    has_bias = bias is not None
    operands = [qt, kt, vt, krow]
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, Skv_p, D), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Skv_p, D), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Skv_p), lambda b, h, i: (b, 0, 0)),
    ]
    if has_bias:
        Bb, Hb = bias.shape[0], bias.shape[1]
        bias_p = _pad_to(_pad_to(bias.astype(jnp.float32), 3, block_kv), 2, block_q)
        operands.append(bias_p)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, Skv_p),
                lambda b, h, i, _Bb=Bb, _Hb=Hb: (b if _Bb > 1 else 0,
                                                 h if _Hb > 1 else 0, i, 0),
            )
        )

    grid = (B, H, Sq_p // block_q)
    kernel = functools.partial(_kernel, has_bias, causal, block_q, block_kv, Sq_p, Skv_p)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_p, D), out_dtype),
        interpret=_INTERPRET,
    )(*operands)
    out = out[:, :, :Sq, :]
    return jnp.swapaxes(out, 1, 2)


def _xla_attention(q, k, v, bias, key_mask, causal, scale):
    from x2vlm_tpu.ops.attention import make_attention_mask

    mask = make_attention_mask(key_mask, q.shape[1], causal=causal) \
        if (key_mask is not None or causal) else None
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash(q, k, v, bias, key_mask, causal, scale):
    return _flash_forward(q, k, v, bias, key_mask, causal, scale)


def _flash_fwd(q, k, v, bias, key_mask, causal, scale):
    out = _flash_forward(q, k, v, bias, key_mask, causal, scale)
    return out, (q, k, v, bias, key_mask)


def _flash_bwd(causal, scale, residuals, g):
    q, k, v, bias, key_mask = residuals
    if bias is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention(q_, k_, v_, None, key_mask, causal, scale),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
        db = None
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_, b_: _xla_attention(q_, k_, v_, b_, key_mask, causal, scale),
            q, k, v, bias,
        )
        dq, dk, dv, db = vjp(g)
    return dq, dk, dv, db, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over (B, S, H, D) tensors. See module docstring."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if jax.default_backend() != "tpu" and not _INTERPRET:
        # CPU/GPU test backends: same math via XLA (keeps tests backend-agnostic).
        return _xla_attention(q, k, v, bias, key_mask, causal, scale)
    return _flash(q, k, v, bias, key_mask, causal, scale)
