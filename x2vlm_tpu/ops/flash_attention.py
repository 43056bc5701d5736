"""Pallas TPU flash attention (block-wise online-softmax, O(Sq·D) memory).

Covers the framework's long-sequence hot paths — image token streams of
(res/16)²+1 tokens: 197 @224px, 577 @384px, 2305 @768px (reference runs these
as materialized quadratic attention, e.g. models/beit2.py:124-166) — with:

- additive bias broadcastable to (B, H, Sq, Skv): BEiT-2 relative-position
  tables (1, H, S, S) stream in block-by-block, never materialized per-batch;
- key padding masks (B, Skv) folded into an additive f32 row;
- causal masking computed from block indices (nothing materialized);
- cross-attention (Skv != Sq).

Forward grid: (B, H, Sq/block_q); each program keeps its (Skv, D) K/V panels
in VMEM and runs the online-softmax recurrence in the loop carry, emitting the
output block and the per-row logsumexp residual.

Backward (flash-attention backward, no O(Sq·Skv) materialization):
- ``delta = rowsum(dO ⊙ O)`` in XLA (cheap elementwise)
- dQ kernel: grid over Q blocks, loop over KV blocks, recomputing
  ``P = exp(S - lse)`` per block
- dK/dV kernel: grid over KV blocks, loop over Q blocks
- dBias kernel (the BEiT rel-pos tables are trained): grid (H, Qblocks, B)
  with batch innermost — consecutive grid steps revisit the same output block,
  which Pallas TPU permits for accumulation — summing dS over the batch when
  the bias is batch-broadcast.
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


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _causal_mask_block(qi, j, block_q, block_kv):
    q_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 0)
    kv_ids = j * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 1)
    return q_ids >= kv_ids


def _s_block(qt, k_ref, krow_ref, bias_ref, qi, j, block_q, block_kv, causal):
    """Recompute the (block_q, block_kv) pre-softmax logits for KV block j.
    qt is the (pre-scaled) query block in f32."""
    kv_slice = pl.ds(j * block_kv, block_kv)
    kb = k_ref[0, 0, kv_slice, :].astype(jnp.float32)
    s = jax.lax.dot_general(qt, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + krow_ref[0, 0, kv_slice][None, :]
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :, kv_slice].astype(jnp.float32)
    if causal:
        s = jnp.where(_causal_mask_block(qi, j, block_q, block_kv), s, _NEG_INF)
    return s, kv_slice


# ---------------- forward ----------------


def _fwd_kernel(has_bias: bool, causal: bool, block_q: int, block_kv: int,
                skv: int, *refs):
    if has_bias:
        q_ref, k_ref, v_ref, krow_ref, bias_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, krow_ref, o_ref, lse_ref = refs
        bias_ref = None

    qi = pl.program_id(2)
    qt = q_ref[0, 0, :, :].astype(jnp.float32)  # (block_q, D) — pre-scaled
    d = qt.shape[-1]
    num_kv = skv // block_kv
    if causal:
        q_end = (qi + 1) * block_q
        num_kv_run = jax.lax.div(q_end + block_kv - 1, block_kv)
    else:
        num_kv_run = num_kv

    def body(j, carry):
        acc, m, l = carry
        s, kv_slice = _s_block(qt, k_ref, krow_ref, bias_ref, qi, j,
                               block_q, block_kv, causal)
        vb = v_ref[0, 0, kv_slice, :].astype(jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p, vb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return acc * alpha + pv, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), _NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, num_kv_run, body, init)
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0, :, :] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0, :, :] = m + jnp.log(l_safe)


def _pick_blocks(Sq, Skv, block_q, block_kv):
    """Measured on v5e (S=577 biased): whole-sequence blocks beat small tiles
    until VMEM pressure — 640/640 ran 2.70 ms vs 4.04 ms at 256/512 and
    3.41 ms for the XLA path. Heuristic: single-block up to 768 queries /
    1024 keys, 512 tiles beyond."""
    if block_q is None:
        block_q = -(-Sq // 128) * 128 if Sq <= 768 else 512
    if block_kv is None:
        block_kv = -(-Skv // 128) * 128 if Skv <= 1024 else 512
    return block_q, block_kv


def _prep(q, k, v, bias, key_mask, scale, block_q, block_kv):
    """Shared forward/backward operand preparation (transpose + pad)."""
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    qt = jnp.swapaxes(q, 1, 2) * jnp.asarray(scale, q.dtype)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    block_q, block_kv = _pick_blocks(Sq, Skv, block_q, block_kv)
    block_q = min(block_q, max(Sq, 8))
    block_kv = min(block_kv, max(Skv, 128))
    qt = _pad_to(qt, 2, block_q)
    kt = _pad_to(kt, 2, block_kv)
    vt = _pad_to(vt, 2, block_kv)
    if key_mask is not None:
        krow = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)
    else:
        krow = jnp.zeros((B, Skv), jnp.float32)
    krow = _pad_to(krow, 1, block_kv, value=_NEG_INF)[:, None, :]
    bias_p = None
    if bias is not None:
        bias_p = _pad_to(_pad_to(bias.astype(jnp.float32), 3, block_kv),
                         2, block_q)
    return qt, kt, vt, krow, bias_p, block_q, block_kv


def _bias_spec(bias, block_q, Skv_p):
    Bb, Hb = bias.shape[0], bias.shape[1]
    return pl.BlockSpec(
        (1, 1, block_q, Skv_p),
        lambda b, h, i, _Bb=Bb, _Hb=Hb: (b if _Bb > 1 else 0,
                                         h if _Hb > 1 else 0, i, 0))


def _flash_forward(q, k, v, bias, key_mask, causal, scale,
                   block_q=None, block_kv=None):
    B, Sq, H, D = q.shape
    out_dtype = q.dtype
    qt, kt, vt, krow, bias_p, block_q, block_kv = _prep(
        q, k, v, bias, key_mask, scale, block_q, block_kv)
    Sq_p, Skv_p = qt.shape[2], kt.shape[2]

    operands = [qt, kt, vt, krow]
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, Skv_p, D), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Skv_p, D), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Skv_p), lambda b, h, i: (b, 0, 0)),
    ]
    if bias_p is not None:
        operands.append(bias_p)
        in_specs.append(_bias_spec(bias, block_q, Skv_p))

    kernel = functools.partial(_fwd_kernel, bias_p is not None, causal,
                               block_q, block_kv, Skv_p)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, H, Sq_p // block_q),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Sq_p, D), out_dtype),
            jax.ShapeDtypeStruct((B, H, Sq_p, 1), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(*operands)
    return jnp.swapaxes(out[:, :, :Sq, :], 1, 2), lse


# ---------------- backward ----------------


def _dq_kernel(has_bias: bool, causal: bool, block_q: int, block_kv: int,
               skv: int, scale: float, *refs):
    if has_bias:
        (q_ref, k_ref, v_ref, krow_ref, do_ref, lse_ref, delta_ref,
         bias_ref, dq_ref) = refs
    else:
        (q_ref, k_ref, v_ref, krow_ref, do_ref, lse_ref, delta_ref,
         dq_ref) = refs
        bias_ref = None

    qi = pl.program_id(2)
    qt = q_ref[0, 0, :, :].astype(jnp.float32)
    do = do_ref[0, 0, :, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :, :]      # (block_q, 1)
    delta = delta_ref[0, 0, :, :]  # (block_q, 1)
    d = qt.shape[-1]
    num_kv = skv // block_kv
    if causal:
        q_end = (qi + 1) * block_q
        num_kv_run = jax.lax.div(q_end + block_kv - 1, block_kv)
    else:
        num_kv_run = num_kv

    def body(j, dq):
        s, kv_slice = _s_block(qt, k_ref, krow_ref, bias_ref, qi, j,
                               block_q, block_kv, causal)
        p = jnp.exp(s - lse)
        kb = k_ref[0, 0, kv_slice, :].astype(jnp.float32)
        vb = v_ref[0, 0, kv_slice, :].astype(jnp.float32)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kv_run, body,
                           jnp.zeros((block_q, d), jnp.float32))
    # q was pre-scaled: dq wrt the original q carries the scale factor
    dq_ref[0, 0, :, :] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(has_bias: bool, causal: bool, block_q: int, block_kv: int,
                sq: int, *refs):
    if has_bias:
        (q_ref, k_ref, v_ref, krow_ref, do_ref, lse_ref, delta_ref,
         bias_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, krow_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref) = refs
        bias_ref = None

    kvi = pl.program_id(2)
    kb = k_ref[0, 0, :, :].astype(jnp.float32)   # (block_kv, D)
    vb = v_ref[0, 0, :, :].astype(jnp.float32)
    d = kb.shape[-1]
    num_q = sq // block_q
    if causal:
        # Q blocks strictly before this KV block see nothing of it.
        first_q = jax.lax.div(kvi * block_kv, block_q)
    else:
        first_q = 0

    def body(i, carry):
        dk, dv = carry
        q_slice = pl.ds(i * block_q, block_q)
        qt = q_ref[0, 0, q_slice, :].astype(jnp.float32)  # within full-Q panel
        do = do_ref[0, 0, q_slice, :].astype(jnp.float32)
        lse = lse_ref[0, 0, q_slice, :]
        delta = delta_ref[0, 0, q_slice, :]
        s = jax.lax.dot_general(qt, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + krow_ref[0, 0, :][None, :]
        if bias_ref is not None:
            s = s + bias_ref[0, 0, q_slice, :].astype(jnp.float32)
        if causal:
            q_ids = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            kv_ids = kvi * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            s = jnp.where(q_ids >= kv_ids, s, _NEG_INF)
        p = jnp.exp(s - lse)                        # (block_q, block_kv)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_new, dv_new

    init = (jnp.zeros((block_kv, d), jnp.float32),
            jnp.zeros((block_kv, d), jnp.float32))
    dk, dv = jax.lax.fori_loop(first_q, num_q, body, init)
    # dk is wrt pre-scaled q path: S = (q*scale)@k^T ⇒ dK = dS^T (q*scale);
    # qt here IS pre-scaled, so no extra factor.
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _dbias_kernel(causal: bool, batch_broadcast: bool, block_q: int,
                  skv: int, *refs):
    (q_ref, k_ref, v_ref, krow_ref, do_ref, lse_ref, delta_ref, bias_ref,
     dbias_ref) = refs
    qi = pl.program_id(1)
    b = pl.program_id(2)
    qt = q_ref[0, 0, :, :].astype(jnp.float32)
    do = do_ref[0, 0, :, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :, :]
    delta = delta_ref[0, 0, :, :]
    kb = k_ref[0, 0, :, :].astype(jnp.float32)    # full (Skv, D)
    vb = v_ref[0, 0, :, :].astype(jnp.float32)

    s = jax.lax.dot_general(qt, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + krow_ref[0, 0, :][None, :]
    s = s + bias_ref[0, 0, :, :].astype(jnp.float32)
    if causal:
        s = jnp.where(_causal_mask_block(qi, 0, block_q, skv), s, _NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    if batch_broadcast:
        # batch is the innermost grid dim → same output block is revisited on
        # consecutive steps: initialize at b == 0, accumulate after.
        @pl.when(b == 0)
        def _():
            dbias_ref[0, 0, :, :] = ds

        @pl.when(b > 0)
        def _():
            dbias_ref[0, 0, :, :] += ds
    else:
        dbias_ref[0, 0, :, :] = ds


def _flash_backward(res, g, causal, scale, block_q=None, block_kv=None):
    q, k, v, bias, key_mask, lse, o = res
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    qt, kt, vt, krow, bias_p, block_q, block_kv = _prep(
        q, k, v, bias, key_mask, scale, block_q, block_kv)
    Sq_p, Skv_p = qt.shape[2], kt.shape[2]

    do = jnp.swapaxes(g, 1, 2)
    do = _pad_to(do, 2, block_q)
    # delta = rowsum(dO ⊙ O), from the saved forward output
    ot = _pad_to(jnp.swapaxes(o, 1, 2), 2, block_q)
    delta = jnp.sum(do.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1,
                    keepdims=True)  # (B, H, Sq_p, 1)

    common = [qt, kt, vt, krow, do, lse, delta]
    qspec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0))
    kfull = pl.BlockSpec((1, 1, Skv_p, D), lambda b, h, i: (b, h, 0, 0))
    krow_spec = pl.BlockSpec((1, 1, Skv_p), lambda b, h, i: (b, 0, 0))
    lse_spec = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0))
    common_specs = [qspec, kfull, kfull, krow_spec, qspec, lse_spec, lse_spec]

    has_bias = bias_p is not None
    operands = list(common) + ([bias_p] if has_bias else [])
    specs = list(common_specs) + ([_bias_spec(bias, block_q, Skv_p)]
                                  if has_bias else [])
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, has_bias, causal, block_q, block_kv,
                          Skv_p, scale),
        grid=(B, H, Sq_p // block_q),
        in_specs=specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
        interpret=_INTERPRET,
    )(*operands)

    # dK/dV: full-Q panels per program, KV-blocked grid
    qpanel = pl.BlockSpec((1, 1, Sq_p, D), lambda b, h, i: (b, h, 0, 0))
    kblk = pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i: (b, h, i, 0))
    krow_blk = pl.BlockSpec((1, 1, block_kv), lambda b, h, i: (b, 0, i))
    lse_panel = pl.BlockSpec((1, 1, Sq_p, 1), lambda b, h, i: (b, h, 0, 0))
    kv_specs = [qpanel, kblk, kblk, krow_blk, qpanel, lse_panel, lse_panel]
    if has_bias:
        Bb, Hb = bias.shape[0], bias.shape[1]
        kv_specs.append(pl.BlockSpec(
            (1, 1, Sq_p, block_kv),
            lambda b, h, i, _Bb=Bb, _Hb=Hb: (b if _Bb > 1 else 0,
                                             h if _Hb > 1 else 0, 0, i)))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, has_bias, causal, block_q, block_kv,
                          Sq_p),
        grid=(B, H, Skv_p // block_kv),
        in_specs=kv_specs,
        out_specs=(kblk, kblk),
        out_shape=(jax.ShapeDtypeStruct((B, H, Skv_p, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Skv_p, D), v.dtype)),
        interpret=_INTERPRET,
    )(*operands)

    db = None
    if has_bias:
        Bb, Hb = bias.shape[0], bias.shape[1]
        batch_broadcast = Bb == 1
        # grid: (H, Qblocks, B) — batch innermost: when the bias broadcasts
        # over batch, consecutive steps revisit the same output block, the
        # legal accumulation pattern on TPU. Head-broadcast bias (rare) is
        # reduced outside the kernel.
        def idx_q(h, i, b):
            return (b, h, i, 0)

        def idx_kfull(h, i, b):
            return (b, h, 0, 0)

        def idx_krow(h, i, b):
            return (b, 0, 0)

        def idx_lse(h, i, b):
            return (b, h, i, 0)

        def idx_bias_in(h, i, b, _Bb=Bb, _Hb=Hb):
            return (b if _Bb > 1 else 0, h if _Hb > 1 else 0, i, 0)

        def idx_dbias(h, i, b, _Bb=Bb):
            return (b if _Bb > 1 else 0, h, i, 0)

        db_specs = [
            pl.BlockSpec((1, 1, block_q, D), idx_q),
            pl.BlockSpec((1, 1, Skv_p, D), idx_kfull),
            pl.BlockSpec((1, 1, Skv_p, D), idx_kfull),
            pl.BlockSpec((1, 1, Skv_p), idx_krow),
            pl.BlockSpec((1, 1, block_q, D), idx_q),
            pl.BlockSpec((1, 1, block_q, 1), idx_lse),
            pl.BlockSpec((1, 1, block_q, 1), idx_lse),
            pl.BlockSpec((1, 1, block_q, Skv_p), idx_bias_in),
        ]
        db = pl.pallas_call(
            functools.partial(_dbias_kernel, causal, batch_broadcast,
                              block_q, Skv_p),
            grid=(H, Sq_p // block_q, B),
            in_specs=db_specs,
            out_specs=pl.BlockSpec((1, 1, block_q, Skv_p), idx_dbias),
            out_shape=jax.ShapeDtypeStruct((Bb, H, Sq_p, Skv_p), jnp.float32),
            interpret=_INTERPRET,
        )(*operands)
        if Hb == 1:
            db = jnp.sum(db, axis=1, keepdims=True)
        db = db[:, :, :Sq, :Skv].astype(bias.dtype)

    dq = jnp.swapaxes(dq[:, :, :Sq, :], 1, 2)
    dk = jnp.swapaxes(dk[:, :, :Skv, :], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :Skv, :], 1, 2)
    return dq, dk, dv, db


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
    """Flash attention over (B, S, H, D) tensors. See module docstring."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if jax.default_backend() != "tpu" and not _INTERPRET:
        # CPU/GPU test backends: same math via XLA (keeps tests backend-agnostic).
        return _xla_attention(q, k, v, bias, key_mask, causal, scale)
    return _flash(q, k, v, bias, key_mask, causal, scale)
