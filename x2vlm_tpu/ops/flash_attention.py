"""Pallas TPU flash attention (block-wise online-softmax, O(Sq·D) memory).

Covers the framework's long-sequence hot paths — image token streams of
(res/16)²+1 tokens: 197 @224px, 577 @384px, 2305 @768px (reference runs these
as materialized quadratic attention, e.g. models/beit2.py:124-166) — with:

- additive bias broadcastable to (B, H, Sq, Skv): BEiT-2 relative-position
  tables (1, H, S, S) stream in block-by-block, never materialized per-batch;
- key padding masks (B, Skv) folded into an additive f32 row;
- causal masking computed from block indices (nothing materialized);
- cross-attention (Skv != Sq).

Grid layout (measured on v5e): programs are **batch-blocked** — each grid step
processes NB batch rows as one batched dot, with the batch-block dimension
*innermost* in the grid. Two wins over the naive (B, H, Sq/bq) grid:

1. the (1, H, Sq, Skv) rel-pos bias block's index is constant across the
   innermost batch sweep, so Pallas keeps it resident in VMEM instead of
   re-fetching it B times (at 224px/B=128 that alone was ~400 MB of HBM
   traffic per layer — measured 2.7 ms/layer, ~13× slower than post-fix);
2. per-step compute is NB× larger, amortizing the pipeline's per-step copy
   latency (the old grid ran 1536 tiny programs at 5.5 TFLOP/s).

NB is the largest power-of-two divisor of B that keeps the double-buffered
working set under the VMEM budget (~16 MB/core on v5e).

Forward: grid (H, Sq/bq, B/NB); each program keeps NB (Skv, D) K/V panels in
VMEM and runs the online-softmax recurrence, emitting NB output blocks and
per-row logsumexp residuals.

Backward (flash-attention backward, no O(Sq·Skv) materialization):
- ``delta = rowsum(dO ⊙ O)`` in XLA (cheap elementwise)
- dQ kernel: grid over (H, Q blocks, batch blocks), loop over KV blocks,
  recomputing ``P = exp(S - lse)`` per block
- dK/dV kernel: grid over (H, KV blocks, batch blocks), loop over Q blocks
- dBias kernel (the BEiT rel-pos tables are trained): grid (H, Qblocks, B/NB)
  with the batch block innermost — consecutive grid steps revisit the same
  output block, which Pallas TPU permits for accumulation — summing dS over
  the batch when the bias is batch-broadcast.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30

# Set X2VLM_FLASH_INTERPRET=1 to run the Pallas kernels in interpreter mode on
# CPU backends (used by the test suite to exercise the kernels themselves).
_INTERPRET = os.environ.get("X2VLM_FLASH_INTERPRET", "0") == "1"

# Double-buffered working-set budget per program (v5e VMEM ≈ 16 MB/core).
_VMEM_BUDGET = 10 * 1024 * 1024

__all__ = ["flash_attention", "flash_supported"]


def flash_supported(q: jnp.ndarray, k: jnp.ndarray, bias=None) -> bool:
    """Dispatch heuristic, measured on v5e (bhsd layout, batch-blocked grid,
    H=12, D=64, biased):

    - isolated op microbench: XLA wins at S=197 (2.34 vs 2.86 ms, B=128) and
      loses from S=577 up (5.67 vs 4.07 ms at 577; 10.1 vs 5.4 ms at 2305).
    - **full-model A/B** (retrieval encode, BEiT-2-base @224, B=128): flash
      1914/1922 pairs/s vs XLA 1760/1764 — flash wins ~9% at S=197 despite
      the microbench, because XLA's 240 MB-per-layer materialized logits
      compete with the rest of the model for HBM, while flash's O(S·D)
      traffic composes. Model-level numbers decide: flash from Skv ≥ 128."""
    if jax.default_backend() != "tpu":
        return False
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    if D > 256 or D % 64 != 0:
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return Skv >= 128 and Sq >= 128


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pick_nb(B: int, row_bytes: int, shared_bytes: int) -> int:
    """Largest divisor of B (power of two, ≤32) whose double-buffered
    working set fits the VMEM budget."""
    for nb in (32, 16, 8, 4, 2, 1):
        if B % nb:
            continue
        if 2 * (nb * row_bytes + shared_bytes) <= _VMEM_BUDGET or nb == 1:
            return nb
    return 1


def _causal_mask_block(qi, j, block_q, block_kv):
    q_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 0)
    kv_ids = j * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 1)
    return q_ids >= kv_ids


def _bdot(a, b, contract_a, contract_b):
    """Batched (leading-dim) dot in fp32: a (NB, m, ka), b (NB, n, kb)."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _read_bias(bias_ref, kv_slice):
    """(NB or 1, bq, bkv) fp32 slice of the bias block ref."""
    return bias_ref[:, 0, :, kv_slice].astype(jnp.float32)


def _add_krow(s, krow_ref, kv_start, nb, bb):
    """Add per-batch-row key-mask logits to s (NB, bq, bkv).

    krow_ref is the full (B, Skv_p) array kept resident in VMEM (a blocked
    (NB, Skv_p) spec would need NB % 8 == 0 for sublane tiling). Rows are
    sliced at bb·NB + n (bb = batch-block program id, hoisted by the caller —
    program_id inside nested loop closures breaks interpret mode). Mosaic
    miscompiles a (NB, 1, bkv) middle-unit-dim broadcast
    (vector_extract_rule check failure) — broadcast each row in 2D (leading
    unit dims are fine) and stack instead."""
    bkv = s.shape[2]
    return s + jnp.stack(
        [jnp.broadcast_to(
            krow_ref[pl.ds(bb * nb + n, 1), pl.ds(kv_start, bkv)],
            s.shape[1:])
         for n in range(nb)])


def _pad_mask_block(s, j, block_kv, skv_real):
    """Mask out padded KV columns (static: only emitted when Skv was padded)."""
    kv_ids = j * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, s.shape[1:], 1)
    return jnp.where((kv_ids < skv_real)[None], s, _NEG_INF)


def _s_block(qt, k_ref, krow_ref, bias_ref, qi, j, block_q, block_kv, causal,
             skv_real, skv_pad, bb=None):
    """Recompute the (NB, block_q, block_kv) pre-softmax logits for KV block j.
    qt is the (pre-scaled) query block in f32, (NB, block_q, D)."""
    kv_slice = pl.ds(j * block_kv, block_kv)
    kb = k_ref[:, 0, kv_slice, :]                         # (NB, bkv, D)
    s = _bdot(qt, kb, 2, 2)                               # (NB, bq, bkv) f32
    if krow_ref is not None:
        s = _add_krow(s, krow_ref, j * block_kv, qt.shape[0], bb)
    elif skv_pad > skv_real:
        s = _pad_mask_block(s, j, block_kv, skv_real)
    if bias_ref is not None:
        s = s + _read_bias(bias_ref, kv_slice)
    if causal:
        s = jnp.where(_causal_mask_block(qi, j, block_q, block_kv)[None], s,
                      _NEG_INF)
    return s, kv_slice


# ---------------- forward ----------------


def _fwd_kernel(has_krow: bool, has_bias: bool, causal: bool, block_q: int,
                block_kv: int, skv_real: int, skv: int, *refs):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    krow_ref = refs.pop(0) if has_krow else None
    bias_ref = refs.pop(0) if has_bias else None
    o_ref, lse_ref = refs

    qi = pl.program_id(1)
    bb = pl.program_id(2)
    # MXU inputs stay in the source dtype (bf16 normally): fp32×fp32 MXU
    # passes are ~7× slower; accumulation is fp32 via preferred_element_type.
    qt = q_ref[:, 0, :, :]                      # (NB, block_q, D) — pre-scaled
    nb, _, d = qt.shape
    num_kv = skv // block_kv
    if causal:
        q_end = (qi + 1) * block_q
        num_kv_run = jax.lax.div(q_end + block_kv - 1, block_kv)
    else:
        num_kv_run = num_kv

    if num_kv == 1 and not causal:
        # Single-KV-block fast path (224/384px vision streams): the whole row
        # is in one block, so skip the online-softmax carry — one max, one
        # exp, one sum; no alpha-rescaling passes. The softmax VPU passes,
        # not the matmuls, bound this kernel at short S, so every saved pass
        # over the (NB, bq, bkv) logits counts.
        s, kv_slice = _s_block(qt, k_ref, krow_ref, bias_ref, qi, 0,
                               block_q, block_kv, causal, skv_real, skv, bb)
        vb = v_ref[:, 0, kv_slice, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = _bdot(p.astype(vb.dtype), vb, 2, 1)          # (NB, bq, D) f32
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[:, 0, :, :] = (pv / l_safe).astype(o_ref.dtype)
        lse_ref[:, 0, :, :] = m + jnp.log(l_safe)
        return

    def body(j, carry):
        acc, m, l = carry
        s, kv_slice = _s_block(qt, k_ref, krow_ref, bias_ref, qi, j,
                               block_q, block_kv, causal, skv_real, skv, bb)
        vb = v_ref[:, 0, kv_slice, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # p → source dtype for the MXU (the XLA path casts probs identically)
        pv = _bdot(p.astype(vb.dtype), vb, 2, 1)          # (NB, bq, D) f32
        return acc * alpha + pv, m_new, l_new

    init = (
        jnp.zeros((nb, block_q, d), jnp.float32),
        jnp.full((nb, block_q, 1), _NEG_INF, jnp.float32),
        jnp.zeros((nb, block_q, 1), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, num_kv_run, body, init)
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[:, 0, :, :] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[:, 0, :, :] = m + jnp.log(l_safe)


def _pick_blocks(Sq, Skv, block_q, block_kv, causal):
    """Measured on v5e (S=577 biased): whole-sequence blocks beat small tiles
    until VMEM pressure — 640/640 ran 2.70 ms vs 4.04 ms at 256/512 and
    3.41 ms for the XLA path. Heuristic: single-block up to 768 queries /
    1024 keys, 512 tiles beyond.

    Single-block non-causal sequences get 8-aligned blocks (e.g. 197 → 200,
    not 256): sublane tiling only needs %8, and with exactly one KV block
    every lane-dim slice start is a static 0, so the %128 lane-alignment
    requirement never applies. This avoids the 1.69× padded-logits VPU/MXU
    waste that 128-rounding costs at 224px. Causal and multi-block paths keep
    128-aligned blocks (dynamic lane starts into the bias/krow need %128)."""
    s8q = -(-Sq // 8) * 8
    s8kv = -(-Skv // 8) * 8
    if block_q is None and block_kv is None and not causal \
            and s8q <= 768 and s8kv <= 1024:
        return s8q, s8kv
    if block_q is None:
        block_q = -(-Sq // 128) * 128 if Sq <= 768 else 512
    if block_kv is None:
        block_kv = -(-Skv // 128) * 128 if Skv <= 1024 else 512
    block_q = min(block_q, -(-Sq // 128) * 128)
    block_kv = min(block_kv, -(-Skv // 128) * 128)
    return block_q, block_kv


def _prep(q, k, v, bias, key_mask, scale, block_q, block_kv, causal):
    """Shared forward/backward operand preparation (scale + pad).

    The bias is streamed in the caller's dtype (the kernels upcast to fp32
    before adding) — callers with trained rel-pos tables pass bf16 to halve
    the bias HBM traffic; fp32 callers keep exact parity."""
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    qt = q * jnp.asarray(scale, q.dtype)
    kt = k
    vt = v
    block_q, block_kv = _pick_blocks(Sq, Skv, block_q, block_kv, causal)
    qt = _pad_to(qt, 2, block_q)
    kt = _pad_to(kt, 2, block_kv)
    vt = _pad_to(vt, 2, block_kv)
    if key_mask is not None:
        # 2D (B, Skv_p): blocks are (NB, bkv) sublane×lane tiles — a
        # (NB, 1, Skv) block with a middle unit dim fails Mosaic's tiling.
        # Padded columns fold into the mask row (-inf).
        krow = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)
        krow = _pad_to(krow, 1, block_kv, value=_NEG_INF)
    else:
        # No key mask (vision self-attention — the hot path): skip the krow
        # operand entirely; padded KV columns are masked in-kernel from
        # static column indices.
        krow = None
    bias_p = None
    if bias is not None:
        bias_p = _pad_to(_pad_to(bias, 3, block_kv), 2, block_q)
    return qt, kt, vt, krow, bias_p, block_q, block_kv


def _bias_spec(bias, nb, block_q, Skv_p):
    """Bias block spec for a (h, i, bb) grid. Batch-broadcast bias (Bb == 1)
    keeps a constant index across the innermost bb sweep → stays in VMEM."""
    Bb, Hb = bias.shape[0], bias.shape[1]
    nb_b = nb if Bb > 1 else 1
    return pl.BlockSpec(
        (nb_b, 1, block_q, Skv_p),
        lambda h, i, bb, _Bb=Bb, _Hb=Hb: (bb if _Bb > 1 else 0,
                                          h if _Hb > 1 else 0, i, 0))


def _flash_forward(q, k, v, bias, key_mask, causal, scale,
                   block_q=None, block_kv=None):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    out_dtype = q.dtype
    qt, kt, vt, krow, bias_p, block_q, block_kv = _prep(
        q, k, v, bias, key_mask, scale, block_q, block_kv, causal)
    Sq_p, Skv_p = qt.shape[2], kt.shape[2]

    # per-batch-row working set: q block + k/v panels + out block (bf16),
    # plus the in-kernel fp32 temporaries (s/p logits blocks + accumulator).
    row_bytes = (2 * block_q * D + 2 * Skv_p * D) * 2 + \
        2 * block_q * block_kv * 4 + block_q * D * 4
    shared = 0
    if bias_p is not None:
        bias_bytes = block_q * Skv_p * bias_p.dtype.itemsize
        if bias.shape[0] > 1:
            # batch-varying bias: each of the nb batch rows streams its own
            # (block_q, Skv_p) block — count it per row, not as one shared copy
            row_bytes += bias_bytes
        else:
            shared = bias_bytes
    nb = _pick_nb(B, row_bytes, shared)

    operands = [qt, kt, vt]
    in_specs = [
        pl.BlockSpec((nb, 1, block_q, D), lambda h, i, bb: (bb, h, i, 0)),
        pl.BlockSpec((nb, 1, Skv_p, D), lambda h, i, bb: (bb, h, 0, 0)),
        pl.BlockSpec((nb, 1, Skv_p, D), lambda h, i, bb: (bb, h, 0, 0)),
    ]
    if krow is not None:
        operands.append(krow)
        # full-array block, constant index → resident in VMEM across steps
        in_specs.append(pl.BlockSpec((B, Skv_p), lambda h, i, bb: (0, 0)))
    if bias_p is not None:
        operands.append(bias_p)
        in_specs.append(_bias_spec(bias, nb, block_q, Skv_p))

    kernel = functools.partial(_fwd_kernel, krow is not None,
                               bias_p is not None, causal,
                               block_q, block_kv, Skv, Skv_p)
    out, lse = pl.pallas_call(
        kernel,
        grid=(H, Sq_p // block_q, B // nb),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((nb, 1, block_q, D), lambda h, i, bb: (bb, h, i, 0)),
            pl.BlockSpec((nb, 1, block_q, 1), lambda h, i, bb: (bb, h, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Sq_p, D), out_dtype),
            jax.ShapeDtypeStruct((B, H, Sq_p, 1), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(*operands)
    return out[:, :, :Sq, :], lse


# ---------------- backward ----------------


def _dq_kernel(has_krow: bool, has_bias: bool, causal: bool, block_q: int,
               block_kv: int, skv_real: int, skv: int, scale: float, *refs):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    krow_ref = refs.pop(0) if has_krow else None
    do_ref, lse_ref, delta_ref = refs[:3]
    refs = refs[3:]
    bias_ref = refs.pop(0) if has_bias else None
    dq_ref = refs[0]

    qi = pl.program_id(1)
    bb = pl.program_id(2)
    qt = q_ref[:, 0, :, :]                       # (NB, bq, D)
    do = do_ref[:, 0, :, :]
    lse = lse_ref[:, 0, :, :]      # (NB, bq, 1)
    delta = delta_ref[:, 0, :, :]  # (NB, bq, 1)
    nb, _, d = qt.shape
    num_kv = skv // block_kv
    if causal:
        q_end = (qi + 1) * block_q
        num_kv_run = jax.lax.div(q_end + block_kv - 1, block_kv)
    else:
        num_kv_run = num_kv

    def body(j, dq):
        s, kv_slice = _s_block(qt, k_ref, krow_ref, bias_ref, qi, j,
                               block_q, block_kv, causal, skv_real, skv, bb)
        p = jnp.exp(s - lse)
        kb = k_ref[:, 0, kv_slice, :]
        vb = v_ref[:, 0, kv_slice, :]
        dp = _bdot(do, vb, 2, 2)          # (NB, bq, bkv) f32
        ds = (p * (dp - delta)).astype(kb.dtype)
        return dq + _bdot(ds, kb, 2, 1)   # (NB, bq, D) f32

    init = jnp.zeros((nb, block_q, d), jnp.float32)
    if num_kv == 1 and not causal:
        # static j=0: lane-dim slice starts stay provably 0 (8-aligned blocks)
        dq = body(0, init)
    else:
        dq = jax.lax.fori_loop(0, num_kv_run, body, init)
    # q was pre-scaled: dq wrt the original q carries the scale factor
    dq_ref[:, 0, :, :] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(has_krow: bool, has_bias: bool, causal: bool, block_q: int,
                block_kv: int, sq: int, skv_real: int, skv_pad: int, *refs):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    krow_ref = refs.pop(0) if has_krow else None
    do_ref, lse_ref, delta_ref = refs[:3]
    refs = refs[3:]
    bias_ref = refs.pop(0) if has_bias else None
    dk_ref, dv_ref = refs

    kvi = pl.program_id(1)
    bb = pl.program_id(2)
    kb = k_ref[:, 0, :, :]                       # (NB, bkv, D)
    vb = v_ref[:, 0, :, :]
    nb, _, d = kb.shape
    num_q = sq // block_q
    if causal:
        # Q blocks strictly before this KV block see nothing of it.
        first_q = jax.lax.div(kvi * block_kv, block_q)
    else:
        first_q = 0

    def body(i, carry):
        dk, dv = carry
        q_slice = pl.ds(i * block_q, block_q)
        qt = q_ref[:, 0, q_slice, :]                      # within full-Q panel
        do = do_ref[:, 0, q_slice, :]
        lse = lse_ref[:, 0, q_slice, :]
        delta = delta_ref[:, 0, q_slice, :]
        s = _bdot(qt, kb, 2, 2)                           # (NB, bq, bkv)
        if krow_ref is not None:
            # static 0 when single KV block: keeps the krow lane-slice start
            # provably aligned for 8-aligned (non-128) block widths
            kv_start = 0 if skv_pad == block_kv else kvi * block_kv
            s = _add_krow(s, krow_ref, kv_start, nb, bb)
        elif skv_pad > skv_real:
            s = _pad_mask_block(s, kvi, block_kv, skv_real)
        if bias_ref is not None:
            s = s + bias_ref[:, 0, q_slice, :].astype(jnp.float32)
        if causal:
            q_ids = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            kv_ids = kvi * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where((q_ids >= kv_ids)[None], s, _NEG_INF)
        p = jnp.exp(s - lse)                              # (NB, bq, bkv)
        pc = p.astype(do.dtype)
        dv_new = dv + _bdot(jnp.swapaxes(pc, 1, 2), do, 2, 1)
        dp = _bdot(do, vb, 2, 2)
        ds = (p * (dp - delta)).astype(qt.dtype)
        dk_new = dk + _bdot(jnp.swapaxes(ds, 1, 2), qt, 2, 1)
        return dk_new, dv_new

    init = (jnp.zeros((nb, block_kv, d), jnp.float32),
            jnp.zeros((nb, block_kv, d), jnp.float32))
    if num_q == 1 and not causal:
        # static i=0: lane-dim slice starts stay provably 0 (8-aligned blocks)
        dk, dv = body(0, init)
    else:
        dk, dv = jax.lax.fori_loop(first_q, num_q, body, init)
    # dk is wrt pre-scaled q path: S = (q*scale)@k^T ⇒ dK = dS^T (q*scale);
    # qt here IS pre-scaled, so no extra factor.
    dk_ref[:, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0, :, :] = dv.astype(dv_ref.dtype)


def _dbias_kernel(has_krow: bool, causal: bool, batch_broadcast: bool,
                  block_q: int, block_kv: int, skv_real: int, skv: int,
                  *refs):
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    krow_ref = refs.pop(0) if has_krow else None
    do_ref, lse_ref, delta_ref, bias_ref, dbias_ref = refs
    qi = pl.program_id(1)
    bb = pl.program_id(2)
    qt = q_ref[:, 0, :, :]                        # (NB, bq, D)
    do = do_ref[:, 0, :, :]
    lse = lse_ref[:, 0, :, :]
    delta = delta_ref[:, 0, :, :]

    # Loop over KV blocks so the (NB, bq, bkv) temporaries stay block-sized
    # (a full (NB, bq, Skv) panel overflows VMEM at long sequences). Causal
    # runs every block anyway: masked logits give p = 0 → ds = 0, and every
    # output slice must be written at bb == 0.
    def body(j, _):
        s, kv_slice = _s_block(qt, k_ref, krow_ref, bias_ref, qi, j,
                               block_q, block_kv, causal, skv_real, skv, bb)
        vb = v_ref[:, 0, kv_slice, :]
        p = jnp.exp(s - lse)
        dp = _bdot(do, vb, 2, 2)                  # f32 accumulate
        ds = p * (dp - delta)                     # (NB, bq, bkv) f32
        if batch_broadcast:
            acc = jnp.sum(ds, axis=0, keepdims=True)   # (1, bq, bkv)
            # batch block is the innermost grid dim → the same output block
            # is revisited on consecutive steps and stays in VMEM:
            # initialize at bb == 0, read-modify-write after.
            prev = jnp.where(bb == 0, jnp.zeros_like(acc),
                             dbias_ref[:, 0, :, kv_slice])
            dbias_ref[:, 0, :, kv_slice] = prev + acc
        else:
            dbias_ref[:, 0, :, kv_slice] = ds
        return 0

    if skv // block_kv == 1:
        body(0, 0)
    else:
        jax.lax.fori_loop(0, skv // block_kv, body, 0)


def _flash_backward(res, g, causal, scale, block_q=None, block_kv=None):
    q, k, v, bias, key_mask, lse, o = res
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    qt, kt, vt, krow, bias_p, block_q, block_kv = _prep(
        q, k, v, bias, key_mask, scale, block_q, block_kv, causal)
    Sq_p, Skv_p = qt.shape[2], kt.shape[2]

    do = _pad_to(g, 2, block_q)
    # delta = rowsum(dO ⊙ O), from the saved forward output
    ot = _pad_to(o, 2, block_q)
    delta = jnp.sum(do.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1,
                    keepdims=True)  # (B, H, Sq_p, 1)

    has_bias = bias_p is not None
    has_krow = krow is not None
    operands_all = [qt, kt, vt] + ([krow] if has_krow else []) + \
        [do, lse, delta] + ([bias_p] if has_bias else [])

    # ---- dQ: grid (H, Q blocks, batch blocks) ----
    # Like the dBias kernel below, even nb=1 can exceed the ~16 MB scoped-vmem
    # stack at long biased sequences (caught on chip at Sq=Skv=2560: the
    # 512/512 tiles' f32 temporaries + the (bq, Skv_p) bias block estimate at
    # 16.3 MB) — halve this kernel's q-block until the double-buffered set
    # fits. Tiled (multi-block) paths use 128-aligned blocks, so halving
    # preserves the %128 dynamic-lane-start requirement; whole-sequence
    # 8-aligned blocks (e.g. 584 @384px) fail the %128 halving guard and keep
    # their measured-fastest single block (they fit the real stack).
    bq_dq = block_q

    def _dq_bytes(bq):
        row = (3 * bq * D + 3 * Skv_p * D) * 2 + \
            Skv_p * 4 + 2 * bq * 4 + \
            4 * bq * block_kv * 4 + bq * D * 4   # s/p/dp/ds + acc
        sh = bq * Skv_p * 2 if has_bias else 0
        return row, sh

    while (bq_dq > 128 and 2 * sum(_dq_bytes(bq_dq)) > _VMEM_BUDGET
           and (bq_dq // 2) % 128 == 0 and Sq_p % (bq_dq // 2) == 0):
        bq_dq //= 2
    row_bytes, shared = _dq_bytes(bq_dq)
    nb = _pick_nb(B, row_bytes, shared)

    def qspec(n, bq=bq_dq):
        return pl.BlockSpec((n, 1, bq, D), lambda h, i, bb: (bb, h, i, 0))

    def lse_spec(n, bq=bq_dq):
        return pl.BlockSpec((n, 1, bq, 1), lambda h, i, bb: (bb, h, i, 0))

    kfull = pl.BlockSpec((nb, 1, Skv_p, D), lambda h, i, bb: (bb, h, 0, 0))
    krow_spec = pl.BlockSpec((B, Skv_p), lambda h, i, bb: (0, 0))
    specs = [qspec(nb), kfull, kfull] + ([krow_spec] if has_krow else []) + \
        [qspec(nb), lse_spec(nb), lse_spec(nb)]
    if has_bias:
        specs.append(_bias_spec(bias, nb, bq_dq, Skv_p))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, has_krow, has_bias, causal, bq_dq,
                          block_kv, Skv, Skv_p, scale),
        grid=(H, Sq_p // bq_dq, B // nb),
        in_specs=specs,
        out_specs=qspec(nb),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
        interpret=_INTERPRET,
    )(*operands_all)

    # ---- dK/dV: full-Q panels per program, (H, KV blocks, batch blocks) ----
    # Same scoped-vmem guard as dQ: this was the kernel the chip actually
    # flagged at Sq=Skv=2560 biased (16.06 MiB vs the 16 MiB stack, estimate
    # 16.03 MB) — halve the KV block (the (Sq_p, bkv) bias panel and the
    # s/p/dp/ds temporaries both scale with it) until the set fits.
    bkv_kv = block_kv

    def _dkv_bytes(bkv):
        row = (2 * Sq_p * D + 4 * bkv * D) * 2 + \
            bkv * 4 + 2 * Sq_p * 4 + \
            4 * block_q * bkv * 4 + 2 * bkv * D * 4  # temps + accs
        sh = Sq_p * bkv * 2 if has_bias else 0
        return row, sh

    while (bkv_kv > 128 and 2 * sum(_dkv_bytes(bkv_kv)) > _VMEM_BUDGET
           and (bkv_kv // 2) % 128 == 0 and Skv_p % (bkv_kv // 2) == 0):
        bkv_kv //= 2
    row_bytes, shared = _dkv_bytes(bkv_kv)
    nb_kv = _pick_nb(B, row_bytes, shared)
    qpanel = pl.BlockSpec((nb_kv, 1, Sq_p, D), lambda h, i, bb: (bb, h, 0, 0))
    kblk = pl.BlockSpec((nb_kv, 1, bkv_kv, D), lambda h, i, bb: (bb, h, i, 0))
    krow_blk = pl.BlockSpec((B, Skv_p), lambda h, i, bb: (0, 0))
    lse_panel = pl.BlockSpec((nb_kv, 1, Sq_p, 1), lambda h, i, bb: (bb, h, 0, 0))
    kv_specs = [qpanel, kblk, kblk] + ([krow_blk] if has_krow else []) + \
        [qpanel, lse_panel, lse_panel]
    if has_bias:
        Bb, Hb = bias.shape[0], bias.shape[1]
        kv_specs.append(pl.BlockSpec(
            (nb_kv if Bb > 1 else 1, 1, Sq_p, bkv_kv),
            lambda h, i, bb, _Bb=Bb, _Hb=Hb: (bb if _Bb > 1 else 0,
                                              h if _Hb > 1 else 0, 0, i)))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, has_krow, has_bias, causal, block_q,
                          bkv_kv, Sq_p, Skv, Skv_p),
        grid=(H, Skv_p // bkv_kv, B // nb_kv),
        in_specs=kv_specs,
        out_specs=(kblk, kblk),
        out_shape=(jax.ShapeDtypeStruct((B, H, Skv_p, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Skv_p, D), v.dtype)),
        interpret=_INTERPRET,
    )(*operands_all)

    db = None
    if has_bias:
        Bb, Hb = bias.shape[0], bias.shape[1]
        batch_broadcast = Bb == 1
        # grid (H, Qblocks, B/NB) — batch block innermost: when the bias
        # broadcasts over batch, consecutive steps revisit the same output
        # block, the legal accumulation pattern on TPU. Head-broadcast bias
        # (rare) is reduced outside the kernel.
        # the (block_q, Skv_p) bias-in + f32 dbias-out blocks dominate at long
        # sequences; even nb=1 can overflow the scoped-vmem limit (caught on
        # chip at Skv=2560: 16.5M vs the 16M stack limit) — shrink this
        # kernel's q-block until the double-buffered set fits
        bq_db = block_q

        def _db_bytes(bq):
            row = (2 * bq * D + 2 * Skv_p * D) * 2 + \
                Skv_p * 4 + 2 * bq * 4 + 4 * bq * block_kv * 4
            sh = bq * Skv_p * (bias_p.dtype.itemsize + 4)
            return row, sh

        while (bq_db > 128 and 2 * sum(_db_bytes(bq_db)) > _VMEM_BUDGET
               and (bq_db // 2) % 8 == 0 and Sq_p % (bq_db // 2) == 0):
            bq_db //= 2
        row_bytes, shared = _db_bytes(bq_db)
        nb_b = _pick_nb(B, row_bytes, shared)

        def idx_q(h, i, bb):
            return (bb, h, i, 0)

        def idx_kfull(h, i, bb):
            return (bb, h, 0, 0)

        def idx_krow(h, i, bb):
            return (0, 0)

        def idx_bias_in(h, i, bb, _Bb=Bb, _Hb=Hb):
            return (bb if _Bb > 1 else 0, h if _Hb > 1 else 0, i, 0)

        def idx_dbias(h, i, bb, _Bb=Bb):
            return (bb if _Bb > 1 else 0, h, i, 0)

        db_specs = [
            pl.BlockSpec((nb_b, 1, bq_db, D), idx_q),
            pl.BlockSpec((nb_b, 1, Skv_p, D), idx_kfull),
            pl.BlockSpec((nb_b, 1, Skv_p, D), idx_kfull),
        ] + ([pl.BlockSpec((B, Skv_p), idx_krow)] if has_krow else []) + [
            pl.BlockSpec((nb_b, 1, bq_db, D), idx_q),
            pl.BlockSpec((nb_b, 1, bq_db, 1), idx_q),
            pl.BlockSpec((nb_b, 1, bq_db, 1), idx_q),
            pl.BlockSpec((nb_b if Bb > 1 else 1, 1, bq_db, Skv_p),
                         idx_bias_in),
        ]
        db = pl.pallas_call(
            functools.partial(_dbias_kernel, has_krow, causal,
                              batch_broadcast, bq_db, block_kv, Skv, Skv_p),
            grid=(H, Sq_p // bq_db, B // nb_b),
            in_specs=db_specs,
            out_specs=pl.BlockSpec(
                (nb_b if Bb > 1 else 1, 1, bq_db, Skv_p), idx_dbias),
            out_shape=jax.ShapeDtypeStruct((Bb, H, Sq_p, Skv_p), jnp.float32),
            interpret=_INTERPRET,
        )(*operands_all)
        if Hb == 1:
            db = jnp.sum(db, axis=1, keepdims=True)
        db = db[:, :, :Sq, :Skv].astype(bias.dtype)

    return dq[:, :, :Sq, :], dk[:, :, :Skv, :], dv[:, :, :Skv, :], db


def _xla_attention(q, k, v, bias, key_mask, causal, scale):
    from x2vlm_tpu.ops.attention import make_attention_mask

    mask = make_attention_mask(key_mask, q.shape[2], causal=causal) \
        if (key_mask is not None or causal) else None
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash(q, k, v, bias, key_mask, causal, scale):
    out, _ = _flash_forward(q, k, v, bias, key_mask, causal, scale)
    return out


def _flash_fwd(q, k, v, bias, key_mask, causal, scale):
    out, lse = _flash_forward(q, k, v, bias, key_mask, causal, scale)
    return out, (q, k, v, bias, key_mask, lse, out)


def _flash_bwd(causal, scale, residuals, g):
    dq, dk, dv, db = _flash_backward(residuals, g, causal, scale)
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
    """Flash attention over (B, H, S, D) tensors. See module docstring."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if jax.default_backend() != "tpu" and not _INTERPRET:
        # CPU/GPU test backends: same math via XLA (keeps tests backend-agnostic).
        return _xla_attention(q, k, v, bias, key_mask, causal, scale)
    return _flash(q, k, v, bias, key_mask, causal, scale)
