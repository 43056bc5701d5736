"""Block-diagonal tiny-attention Pallas kernel for short-query multi-head
attention — self-attention in the text/fusion towers (Sq = Skv ≈ 40) AND the
fusion layers' cross-attention to the image stream (Sq ≈ 40, Skv ≈ 197).

Why: batched (B·H, Sq, Skv) attention matmuls at Sq ≈ 40 pay a measured
~0.4 µs per batched element on the MXU regardless of batching strategy
(CLAUDE.md) — a dispatch-shape floor that cost ~19 ms/step (self) plus
~14 ms/step (cross, 6 einsums/layer fwd+bwd) in X2VLM-base pretraining
(profiler breakdowns, STATUS.md). This kernel computes ALL heads of one batch
row with ONE matmul pair by assembling K and V into a block-diagonal
(H·Skv, H·D) scratch in VMEM:

    logits_all = Qw (Sq, H·D) @ Kblock (H·Skv, H·D)ᵀ → (Sq, H·Skv)
    out_all    = P  (Sq, H·Skv) @ Vblock (H·Skv, H·D) → (Sq, H·D)

Off-diagonal products hit zero blocks, so the result is exact; the ~H×
padded FLOPs are cheap at these sizes while the MXU dispatch count drops by
H× per row and the head-split/merge transposes disappear entirely (I/O is
the projection layout (B, S, H·D)).

The zero off-diagonal blocks are written ONCE (first grid step) — scratch
persists across the sequential TPU grid, and per-row updates only overwrite
the diagonal blocks. The XLA-level version of this trick was measured
construction-bound (STATUS.md round-2); VMEM assembly is what makes it pay.

Sequence lengths are padded to the Mosaic sublane quantum (%8) internally:
padded KEY positions are masked with -inf (they contribute exp→0), padded
QUERY rows compute garbage that is sliced off. Callers may pass any
Sq ≤ 64 and any Skv the VMEM estimate admits (see ``tiny_supported``).

Attention-probability dropout is supported via a caller-provided multiplier
mask (values 0 or 1/(1-p)), generated with jax.random outside the kernel —
reusing the operand in the backward pass keeps fwd/bwd masks identical
without in-kernel RNG.

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
_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the ~16 MB scoped stack

__all__ = ["tiny_block_attention", "tiny_supported"]


def _head_indicator(H, Skv):
    """B1 (H·Skv, H) f32: B1[c, h] = 1 iff column c belongs to head h.
    Iota-built (Mosaic rejects minor-dim reshapes like (S,H·S)→(S,H,S))."""
    c = jax.lax.broadcasted_iota(jnp.int32, (H * Skv, H), 0)
    h = jax.lax.broadcasted_iota(jnp.int32, (H * Skv, H), 1)
    return (c // Skv == h).astype(jnp.float32)


def _key_selector(H, Skv):
    """Esel (Skv, H·Skv) f32: Esel[j, c] = 1 iff c's in-head key position == j
    — lifts a per-key (Skv,) row to all heads' columns with one matmul."""
    j = jax.lax.broadcasted_iota(jnp.int32, (Skv, H * Skv), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (Skv, H * Skv), 1)
    return (c % Skv == j).astype(jnp.float32)


def _headwise_softmax(logits, H, Skv):
    """Per-head softmax over the (Sq, H·Skv) wide layout, reshape-free:
    subtract the GLOBAL row max (softmax is shift-invariant per row, so this
    is exact), then normalize per head block via indicator matmuls."""
    b1 = _head_indicator(H, Skv)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    seg = jax.lax.dot_general(e, b1, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (Sq, H)
    denom = jax.lax.dot_general(seg, b1, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return e / denom


def _fwd_kernel(H, Sq, Skv, D, has_mask, has_drop, NB,
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
    kb = refs[i]; i += 1   # (H*Skv, H*D) scratch
    vb = refs[i]; i += 1

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        kb[...] = jnp.zeros_like(kb)
        vb[...] = jnp.zeros_like(vb)

    esel = _key_selector(H, Skv) if has_mask else None
    for r in range(NB):
        # assemble diagonal blocks (static offsets)
        for h in range(H):
            kb[h * Skv:(h + 1) * Skv, h * D:(h + 1) * D] = k_ref[r, :, h * D:(h + 1) * D]
            vb[h * Skv:(h + 1) * Skv, h * D:(h + 1) * D] = v_ref[r, :, h * D:(h + 1) * D]
        q = q_ref[r]  # (Sq, H*D), scale pre-folded
        logits = jax.lax.dot_general(
            q, kb[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Sq, H*Skv)
        if has_mask:
            krow = km_ref[r]  # (1, Skv) additive 0/-inf over key positions
            wide = jax.lax.dot_general(
                krow, esel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, H*Skv)
            logits = logits + wide
        p = _headwise_softmax(logits, H, Skv)
        p_ref[r] = p.astype(p_ref.dtype)
        if has_drop:
            p = p * dm_ref[r].astype(jnp.float32)
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), vb[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Sq, H*D)
        out_ref[r] = out.astype(out_ref.dtype)


def _bwd_kernel(H, Sq, Skv, D, has_drop, NB, *refs):
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
            kb[h * Skv:(h + 1) * Skv, h * D:(h + 1) * D] = k_ref[r, :, h * D:(h + 1) * D]
            vb[h * Skv:(h + 1) * Skv, h * D:(h + 1) * D] = v_ref[r, :, h * D:(h + 1) * D]
        g = g_ref[r]                        # (Sq, H*D)
        p = p_ref[r].astype(jnp.float32)    # (Sq, H*Skv) pre-dropout probs
        if has_drop:
            dm = dm_ref[r].astype(jnp.float32)
            p_used = p * dm
        else:
            p_used = p
        # dP_used = g @ Vblockᵀ  (contract H*D)
        dp = jax.lax.dot_general(
            g, vb[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Sq, H*Skv)
        if has_drop:
            dp = dp * dm
        # softmax backward per head block, reshape-free: the per-head
        # row-dot Σ_j dP⊙P lifts back to columns via the indicator matmuls
        b1 = _head_indicator(H, Skv)
        seg = jax.lax.dot_general(dp * p, b1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (Sq,H)
        wide = jax.lax.dot_general(seg, b1, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dl = p * (dp - wide)
        # dQ = dlogits @ Kblock (contract H*Skv)
        dq = jax.lax.dot_general(
            dl.astype(kb.dtype), kb[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[r] = dq.astype(dq_ref.dtype)
        # dKfull = dlogitsᵀ @ Q (contract Sq) → (H*Skv, H*D); diag blocks = dK
        q = q_ref[r]
        dkf = jax.lax.dot_general(
            dl.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dVfull = P_usedᵀ @ g → (H*Skv, H*D); diag blocks = dV
        dvf = jax.lax.dot_general(
            p_used.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for h in range(H):
            dk_ref[r, :, h * D:(h + 1) * D] = dkf[
                h * Skv:(h + 1) * Skv, h * D:(h + 1) * D].astype(dk_ref.dtype)
            dv_ref[r, :, h * D:(h + 1) * D] = dvf[
                h * Skv:(h + 1) * Skv, h * D:(h + 1) * D].astype(dv_ref.dtype)


def _fwd_bytes(NB, H, Sq, Skv, D, has_mask, has_drop, itemsize=2):
    HD = H * D
    ins = NB * Sq * HD * itemsize + 2 * NB * Skv * HD * itemsize
    if has_mask:
        ins += NB * Skv * 4
    if has_drop:
        ins += NB * Sq * H * Skv * 2
    outs = NB * Sq * HD * itemsize + NB * Sq * H * Skv * 4
    scratch = 2 * H * Skv * HD * itemsize
    return 2 * (ins + outs) + scratch  # double-buffered blocks + scratch


def _bwd_bytes(NB, H, Sq, Skv, D, has_drop, itemsize=2):
    HD = H * D
    ins = (3 * NB * max(Sq, Skv) * HD * itemsize  # q,k,v upper bound
           + NB * Sq * H * Skv * 4                # probs f32
           + NB * Sq * HD * itemsize)             # g
    if has_drop:
        ins += NB * Sq * H * Skv * 2
    outs = NB * Sq * HD * itemsize + 2 * NB * Skv * HD * itemsize
    scratch = 2 * H * Skv * HD * itemsize
    return 2 * (ins + outs) + scratch


def _pick_nb(B, H, Sq, Skv, D, has_mask, has_drop):
    """Largest NB dividing B whose fwd AND bwd VMEM estimates fit."""
    for nb in (8, 4, 2, 1):
        if B % nb:
            continue
        if (_fwd_bytes(nb, H, Sq, Skv, D, has_mask, has_drop) <= _VMEM_BUDGET
                and _bwd_bytes(nb, H, Sq, Skv, D, has_drop) <= _VMEM_BUDGET):
            return nb
    return 0


def _pad8(n):
    return -(-n // 8) * 8


def _pick_head_chunk(B, Sq, Skv, num_heads, head_dim,
                     has_mask=False, has_drop=False) -> int:
    """Largest head-group size hc dividing num_heads whose block-diagonal
    scratch fits VMEM and whose lane width hc·D stays in Mosaic's
    measured-correct region (≥ 256, see tiny_supported). The wide-head
    towers (X2VLM-large fusion: H=16, D=64, Skv≈200) overflow the scratch
    as one 16-head block — two 8-head kernel calls still beat the XLA
    batched-matmul path's per-(B·H) dispatch floor. Returns 0 if no chunk
    works."""
    for n_chunks in range(1, num_heads + 1):
        if num_heads % n_chunks:
            continue
        hc = num_heads // n_chunks
        if hc * head_dim < 256:
            return 0  # smaller chunks only get narrower — stop
        if _pick_nb(B, hc, Sq, Skv, head_dim, has_mask, has_drop) > 0:
            return hc
    return 0


def tiny_supported(B, Sq, Skv, num_heads, head_dim,
                   has_mask=False, has_drop=False) -> bool:
    """True when the padded shapes fit the kernel's VMEM budget (possibly
    split into per-head-group kernel calls, see _pick_head_chunk) AND the
    lane width is in Mosaic's measured-correct region: an on-chip sweep
    (v5e, 2026-08) showed H·D = 128 (exactly one lane tile) SILENTLY
    miscompiles the backward (grads ~50% off vs fp32 truth) while every
    H·D ≥ 256 case is bf16-exact; real model widths are ≥ 512."""
    if Sq > 64 or num_heads * head_dim < 256:
        return False
    return _pick_head_chunk(B, _pad8(Sq), _pad8(Skv), num_heads, head_dim,
                            True if Skv % 8 else has_mask, has_drop) > 0


def _krow(key_mask):
    return jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)


def _hw_random_bits(rng, shape):
    """uint32 bits from the hardware RNG: rewrap the (threefry) dropout key's
    data as an rbg-impl key, whose ``random_bits`` lowers to one XLA
    RngBitGenerator call instead of a threefry ALU chain. The two extra key
    words are derived by fold_in (not duplicated), so all 128 rbg key bits
    carry independent entropy."""
    kd = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
    kd2 = jax.random.key_data(
        jax.random.fold_in(rng, 0x5eed)).reshape(-1).astype(jnp.uint32)
    rbg_key = jax.random.wrap_key_data(
        jnp.concatenate([kd, kd2])[:4], impl="rbg")
    return jax.random.bits(rbg_key, shape, jnp.uint32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _tiny(qs, k, v, krow, dmask, num_heads):
    out, _ = _tiny_fwd_impl(qs, k, v, krow, dmask, num_heads)
    return out


def _tiny_fwd_impl(qs, k, v, krow, dmask, H):
    B, Sq, HD = qs.shape
    Skv = k.shape[1]
    D = HD // H
    has_mask = krow is not None
    has_drop = dmask is not None
    NB = _pick_nb(B, H, Sq, Skv, D, has_mask, has_drop)

    operands = [qs, k, v]
    in_specs = [
        pl.BlockSpec((NB, Sq, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, Skv, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, Skv, HD), lambda b: (b, 0, 0)),
    ]
    if has_mask:
        # (B, 1, Skv): a 2-D (NB, Skv) block would put NB in the Mosaic
        # sublane slot, which must be %8 or ==B — fails for e.g. B=12. With
        # the unit middle dim the block's last two dims equal the array dims.
        operands.append(krow[:, None, :])
        in_specs.append(pl.BlockSpec((NB, 1, Skv), lambda b: (b, 0, 0)))
    if has_drop:
        operands.append(dmask)
        in_specs.append(pl.BlockSpec((NB, Sq, H * Skv), lambda b: (b, 0, 0)))

    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_fwd_kernel, H, Sq, Skv, D, has_mask, has_drop, NB)
    out, probs = pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((NB, Sq, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((NB, Sq, H * Skv), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sq, HD), qs.dtype),
            # probs residual kept fp32: bf16 here costs ~1e-2 relative error
            # in dK/dV (measured); the extra HBM is ~7 MB at pretrain shapes
            jax.ShapeDtypeStruct((B, Sq, H * Skv), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H * Skv, HD), qs.dtype),
            pltpu.VMEM((H * Skv, HD), qs.dtype),
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
    B, Sq, HD = qs.shape
    Skv = k.shape[1]
    D = HD // H
    has_drop = dmask is not None
    NB = _pick_nb(B, H, Sq, Skv, D, False, has_drop)

    operands = [qs, k, v, probs, g]
    in_specs = [
        pl.BlockSpec((NB, Sq, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, Skv, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, Skv, HD), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, Sq, H * Skv), lambda b: (b, 0, 0)),
        pl.BlockSpec((NB, Sq, HD), lambda b: (b, 0, 0)),
    ]
    if has_drop:
        operands.append(dmask)
        in_specs.append(pl.BlockSpec((NB, Sq, H * Skv), lambda b: (b, 0, 0)))

    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_bwd_kernel, H, Sq, Skv, D, has_drop, NB)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((NB, Sq, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((NB, Skv, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((NB, Skv, HD), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sq, HD), qs.dtype),
            jax.ShapeDtypeStruct((B, Skv, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Skv, HD), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((H * Skv, HD), qs.dtype),
            pltpu.VMEM((H * Skv, HD), qs.dtype),
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
    """Multi-head attention on projection-layout inputs.

    qw: (B, Sq, H·D); kw/vw: (B, Skv, H·D) — the Q/K/V projection outputs,
    NOT head-split (self-attention: Skv == Sq; fusion cross-attention:
    kw/vw come from the image stream). Returns (B, Sq, H·D), ready for the
    output projection. Sequence lengths are padded to %8 internally.
    """
    B, Sq, HD = qw.shape
    Skv = kw.shape[1]
    D = HD // num_heads
    if scale is None:
        scale = D ** -0.5
    qs = qw * jnp.asarray(scale, qw.dtype)

    Sq_p, Skv_p = _pad8(Sq), _pad8(Skv)
    if Skv_p != Skv and key_mask is None:
        key_mask = jnp.ones((B, Skv), jnp.bool_)
    if Sq_p != Sq:
        qs = jnp.pad(qs, ((0, 0), (0, Sq_p - Sq), (0, 0)))
    if Skv_p != Skv:
        kw = jnp.pad(kw, ((0, 0), (0, Skv_p - Skv), (0, 0)))
        vw = jnp.pad(vw, ((0, 0), (0, Skv_p - Skv), (0, 0)))
        key_mask = jnp.pad(key_mask.astype(jnp.bool_),
                           ((0, 0), (0, Skv_p - Skv)))

    krow = _krow(key_mask) if key_mask is not None else None
    has_drop = dropout_rate > 0.0 and not deterministic
    threshold = jnp.uint32(round(dropout_rate * 4294967296.0)) if has_drop \
        else None

    def _dmask(rng, n_heads):
        # Generate the keep mask with the hardware RNG (XLA RngBitGenerator
        # via an rbg-impl key) instead of threefry: threefry computes ~dozens
        # of ALU ops per uint32 on the VPU, which showed up at ~2 ms/step in
        # the base pretrain profile for the (B, Sq, H·Skv) cross-attention
        # masks. Dropout needs no cross-backend determinism, only fwd/bwd
        # consistency — which operand reuse already guarantees.
        bits = _hw_random_bits(rng, (B, Sq_p, n_heads * Skv_p))
        return jnp.where(bits >= threshold,
                         jnp.bfloat16(1.0 / (1.0 - dropout_rate)),
                         jnp.bfloat16(0.0))

    if jax.default_backend() != "tpu" and not _INTERPRET:
        dmask = _dmask(dropout_rng, num_heads) if has_drop else None
        out = _xla_reference(qs, kw, vw, krow, dmask, num_heads)
    else:
        # wide-head towers (e.g. H=16, D=64, Skv≈200) can overflow the
        # kernel's VMEM scratch as one block — split the heads into the
        # largest groups that fit and run one kernel call per group
        # (the groups are fully independent: q/k/v columns partition by head)
        # hc == 0 only when the dispatcher's tiny_supported gate was skipped
        # (interpret-mode tests at sub-256 lane widths) — single call then
        hc = _pick_head_chunk(B, Sq_p, Skv_p, num_heads, D,
                              has_mask=krow is not None,
                              has_drop=has_drop) or num_heads
        outs = []
        for ci in range(num_heads // hc):
            cols = slice(ci * hc * D, (ci + 1) * hc * D)
            dm = None
            if has_drop:
                rng_c = dropout_rng if ci == 0 \
                    else jax.random.fold_in(dropout_rng, ci)
                dm = _dmask(rng_c, hc)
            outs.append(_tiny(qs[..., cols], kw[..., cols], vw[..., cols],
                              krow, dm, hc))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    if Sq_p != Sq:
        out = out[:, :Sq]
    return out


def _xla_reference(qs, k, v, krow, dmask, H):
    """Same math via XLA (CPU/GPU test backends)."""
    B, Sq, HD = qs.shape
    Skv = k.shape[1]
    D = HD // H
    q4 = qs.reshape(B, Sq, H, D).transpose(0, 2, 1, 3)
    k4 = k.reshape(B, Skv, H, D).transpose(0, 2, 1, 3)
    v4 = v.reshape(B, Skv, H, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q4, k4,
                        preferred_element_type=jnp.float32)
    if krow is not None:
        logits = logits + krow[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    if dmask is not None:
        dm = dmask.reshape(B, Sq, H, Skv).transpose(0, 2, 1, 3).astype(jnp.float32)
        p = p * dm
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v4.dtype), v4)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, HD)
