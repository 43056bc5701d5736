"""Block-diagonal tiny-attention Pallas kernel for short-sequence multi-head
self-attention (text/fusion towers, Sq = Skv = S ≈ 40).

Why: batched (B·H, S, S) attention matmuls at S≈40 pay a measured ~0.4 µs
per batched element on the MXU regardless of batching strategy (CLAUDE.md) —
a dispatch-shape floor that costs ~19 ms/step in X2VLM-base pretraining
(profiler breakdown, STATUS.md). This kernel computes ALL heads of one batch
row with ONE matmul pair by assembling K and V into a block-diagonal
(H·S, H·D) scratch in VMEM:

    logits_all = Qw (S, H·D) @ Kblock^T-free layout (H·S, H·D)ᵀ→ (S, H·S)
    out_all    = P  (S, H·S) @ Vblock (H·S, H·D)            → (S, H·D)

Off-diagonal products hit zero blocks, so the result is exact; the ~H×
padded FLOPs are negligible at these sizes (≈30 MFLOP/row) while the MXU
dispatch count drops by H× per row and the head-split/merge transposes
disappear entirely (I/O is the projection layout (B, S, H·D)).

The zero off-diagonal blocks are written ONCE (first grid step) — scratch
persists across the sequential TPU grid, and per-row updates only overwrite
the diagonal blocks. The XLA-level version of this trick was measured
construction-bound (STATUS.md round-2); VMEM assembly is what makes it pay.

Attention-probability dropout is supported via a caller-provided multiplier
mask (values 0 or 1/(1-p)), generated with jax.random outside the kernel —
(B, S, H·S) bf16 is ~2 MB at pretrain shapes, and reusing the operand in the
backward pass keeps fwd/bwd masks identical without in-kernel RNG.

Interpret-mode tested against the XLA reference; the real-TPU Mosaic
lowering is compile-checked on the chip (see tests/test_tiny_attention.py
and .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = os.environ.get("X2VLM_FLASH_INTERPRET", "0") == "1"
_NEG_INF = -1e30

__all__ = ["tiny_block_attention"]


def _head_indicator(H, S):
    """B1 (H·S, H) f32: B1[c, h] = 1 iff column c belongs to head h.
    Iota-built (Mosaic rejects minor-dim reshapes like (S,H·S)→(S,H,S))."""
    c = jax.lax.broadcasted_iota(jnp.int32, (H * S, H), 0)
    h = jax.lax.broadcasted_iota(jnp.int32, (H * S, H), 1)
    return (c // S == h).astype(jnp.float32)


def _key_selector(H, S):
    """Esel (S, H·S) f32: Esel[j, c] = 1 iff c's in-head key position == j —
    lifts a per-key (S,) row to all heads' columns with one matmul."""
    j = jax.lax.broadcasted_iota(jnp.int32, (S, H * S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, H * S), 1)
    return (c % S == j).astype(jnp.float32)


def _headwise_softmax(logits, H, S):
    """Per-head softmax over the (S, H·S) wide layout, reshape-free:
    subtract the GLOBAL row max (softmax is shift-invariant per row, so this
    is exact), then normalize per head block via indicator matmuls."""
    b1 = _head_indicator(H, S)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    seg = jax.lax.dot_general(e, b1, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (S, H)
    denom = jax.lax.dot_general(seg, b1, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return e / denom


def _fwd_kernel(H, S, D, has_mask, has_drop, NB,
                *refs):
    """One grid step processes NB batch rows sequentially."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    if has_mask:
        km_ref = refs[i]; i += 1
    if has_drop:
        dm_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    p_ref = refs[i]; i += 1
    kb = refs[i]; i += 1   # (H*S, H*D) scratch
    vb = refs[i]; i += 1

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        kb[...] = jnp.zeros_like(kb)
        vb[...] = jnp.zeros_like(vb)

    esel = _key_selector(H, S) if has_mask else None
    for r in range(NB):
        # assemble diagonal blocks (static offsets)
        for h in range(H):
            kb[h * S:(h + 1) * S, h * D:(h + 1) * D] = k_ref[r, :, h * D:(h + 1) * D]
            vb[h * S:(h + 1) * S, h * D:(h + 1) * D] = v_ref[r, :, h * D:(h + 1) * D]
        q = q_ref[r]  # (S, H*D), scale pre-folded
        logits = jax.lax.dot_general(
            q, kb[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, H*S)
        if has_mask:
            krow = km_ref[r]  # (1, S) additive 0/-inf over key positions
            wide = jax.lax.dot_general(
                krow, esel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, H*S)
            logits = logits + wide
        p = _headwise_softmax(logits, H, S)
        p_ref[r] = p.astype(p_ref.dtype)
        if has_drop:
            p = p * dm_ref[r].astype(jnp.float32)
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), vb[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, H*D)
        out_ref[r] = out.astype(out_ref.dtype)


def _bwd_kernel(H, S, D, has_drop, NB, *refs):
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    p_ref = refs[i]; i += 1
    g_ref = refs[i]; i += 1
    if has_drop:
        dm_ref = refs[i]; i += 1
    dq_ref = refs[i]; i += 1
    dk_ref = refs[i]; i += 1
    dv_ref = refs[i]; i += 1
    kb = refs[i]; i += 1
    vb = refs[i]; i += 1

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        kb[...] = jnp.zeros_like(kb)
        vb[...] = jnp.zeros_like(vb)

    for r in range(NB):
        for h in range(H):
            kb[h * S:(h + 1) * S, h * D:(h + 1) * D] = k_ref[r, :, h * D:(h + 1) * D]
            vb[h * S:(h + 1) * S, h * D:(h + 1) * D] = v_ref[r, :, h * D:(h + 1) * D]
        g = g_ref[r]                        # (S, H*D)
        p = p_ref[r].astype(jnp.float32)    # (S, H*S) pre-dropout probs
        if has_drop:
            dm = dm_ref[r].astype(jnp.float32)
            p_used = p * dm
        else:
            p_used = p
        # dP_used = g @ Vblockᵀ  (contract H*D)
        dp = jax.lax.dot_general(
            g, vb[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, H*S)
        if has_drop:
            dp = dp * dm
        # softmax backward per head block, reshape-free: the per-head
        # row-dot Σ_j dP⊙P lifts back to columns via the indicator matmuls
        b1 = _head_indicator(H, S)
        seg = jax.lax.dot_general(dp * p, b1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (S,H)
        wide = jax.lax.dot_general(seg, b1, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dl = p * (dp - wide)
        # dQ = dlogits @ Kblock (contract H*S)
        dq = jax.lax.dot_general(
            dl.astype(kb.dtype), kb[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[r] = dq.astype(dq_ref.dtype)
        # dKfull = dlogitsᵀ @ Q (contract S) → (H*S, H*D); diag blocks = dK
        q = q_ref[r]
        dkf = jax.lax.dot_general(
            dl.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dVfull = P_usedᵀ @ g → (H*S, H*D); diag blocks = dV
        dvf = jax.lax.dot_general(
            p_used.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for h in range(H):
            dk_ref[r, :, h * D:(h + 1) * D] = dkf[
                h * S:(h + 1) * S, h * D:(h + 1) * D].astype(dk_ref.dtype)
            dv_ref[r, :, h * D:(h + 1) * D] = dvf[
                h * S:(h + 1) * S, h * D:(h + 1) * D].astype(dv_ref.dtype)


def _pick_nb(B):
    for nb in (8, 4, 2, 1):
        if B % nb == 0:
            return nb
    return 1


def _krow(key_mask):
    return jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _tiny(qs, k, v, krow, dmask, num_heads):
    out, _ = _tiny_fwd_impl(qs, k, v, krow, dmask, num_heads)
    return out


def _tiny_fwd_impl(qs, k, v, krow, dmask, H):
    B, S, HD = qs.shape
    D = HD // H
    NB = _pick_nb(B)
    has_mask = krow is not None
    has_drop = dmask is not None

    operands = [qs, k, v]
    in_specs = [pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0))] * 3
    if has_mask:
        # (B, 1, S): a 2-D (NB, S) block would put NB in the Mosaic sublane
        # slot, which must be %8 or ==B — fails for e.g. B=12. With the unit
        # middle dim the block's last two dims always equal the array dims.
        operands.append(krow[:, None, :])
        in_specs.append(pl.BlockSpec((NB, 1, S), lambda b: (b, 0, 0)))
    if has_drop:
        operands.append(dmask)
        in_specs.append(pl.BlockSpec((NB, S, H * S), lambda b: (b, 0, 0)))

    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_fwd_kernel, H, S, D, has_mask, has_drop, NB)
    out, probs = pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((NB, S, H * S), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, HD), qs.dtype),
            # probs residual kept fp32: bf16 here costs ~1e-2 relative error
            # in dK/dV (measured); the extra HBM is ~7 MB at pretrain shapes
            jax.ShapeDtypeStruct((B, S, H * S), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H * S, HD), qs.dtype),
            pltpu.VMEM((H * S, HD), qs.dtype),
        ],
        interpret=_INTERPRET,
    )(*operands)
    return out, probs


def _tiny_vjp_fwd(qs, k, v, krow, dmask, num_heads):
    out, probs = _tiny_fwd_impl(qs, k, v, krow, dmask, num_heads)
    return out, (qs, k, v, probs, dmask)


def _tiny_vjp_bwd(num_heads, res, g):
    qs, k, v, probs, dmask = res
    H = num_heads
    B, S, HD = qs.shape
    D = HD // H
    NB = _pick_nb(B)
    has_drop = dmask is not None

    operands = [qs, k, v, probs, g]
    in_specs = [
        pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, S, H * S), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
    ]
    if has_drop:
        operands.append(dmask)
        in_specs.append(pl.BlockSpec((NB, S, H * S), lambda b: (b, 0, 0)))

    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_bwd_kernel, H, S, D, has_drop, NB)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((NB, S, HD), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, HD), qs.dtype),
            jax.ShapeDtypeStruct((B, S, HD), k.dtype),
            jax.ShapeDtypeStruct((B, S, HD), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((H * S, HD), qs.dtype),
            pltpu.VMEM((H * S, HD), qs.dtype),
        ],
        interpret=_INTERPRET,
    )(*operands)
    return dq, dk, dv, None, None


_tiny.defvjp(_tiny_vjp_fwd, _tiny_vjp_bwd)


def tiny_block_attention(
    qw: jnp.ndarray,
    kw: jnp.ndarray,
    vw: jnp.ndarray,
    *,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head self-attention on projection-layout inputs.

    qw/kw/vw: (B, S, H·D) — the Q/K/V projection outputs, NOT head-split.
    Returns (B, S, H·D), ready for the output projection.
    """
    B, S, HD = qw.shape
    D = HD // num_heads
    if scale is None:
        scale = D ** -0.5
    qs = qw * jnp.asarray(scale, qw.dtype)
    krow = _krow(key_mask) if key_mask is not None else None
    dmask = None
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, (B, S, num_heads * S))
        dmask = (keep.astype(jnp.bfloat16) / (1.0 - dropout_rate))
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return _xla_reference(qs, kw, vw, krow, dmask, num_heads)
    return _tiny(qs, kw, vw, krow, dmask, num_heads)


def _xla_reference(qs, k, v, krow, dmask, H):
    """Same math via XLA (CPU/GPU test backends)."""
    B, S, HD = qs.shape
    D = HD // H
    q4 = qs.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    k4 = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v4 = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q4, k4,
                        preferred_element_type=jnp.float32)
    if krow is not None:
        logits = logits + krow[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    if dmask is not None:
        dm = dmask.reshape(B, S, H, S).transpose(0, 2, 1, 3).astype(jnp.float32)
        p = p * dm
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v4.dtype), v4)
    return out.transpose(0, 2, 1, 3).reshape(B, S, HD)
