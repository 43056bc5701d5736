"""Fused dynamic-int8 matmul Pallas kernel: per-token activation
quantization + int8×int8→int32 MXU matmul + dequant/bias/GELU epilogue in
one kernel.

Why: v5e's MXU runs int8 at ~1.6× the bf16 rate (measured 184 vs 114 TOP/s,
STATUS.md), but the XLA-level dynamic-quant pipeline (ops/quant.QDense)
loses the win to its epilogues — the per-token abs-max, round, and dequant
multiplies each materialize full activation tensors in HBM (measured: 1799
int8 vs 2046 bf16 pairs/s at base encode shapes). Here those stages live in
VMEM inside the matmul kernel: the quantize runs on the VPU while the MXU
works, and dequant+bias+GELU fold into the accumulator epilogue.

Scheme (identical math to ops/quant.QDense):
- activations: symmetric per-token abs-max scales, computed in-kernel
- weights:     symmetric per-output-channel int8 + fp32 scales, quantized
               once per call by the caller (``quantize_weight``)
- accumulate int32, dequantize with the outer product of scales.

Interpret-mode tested vs the XLA implementation; Mosaic lowering is
compile-checked on the real chip (tests/test_int8_matmul.py + verify skill).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = os.environ.get("X2VLM_FLASH_INTERPRET", "0") == "1"

__all__ = ["int8_matmul", "quantize_weight"]


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 (K, N) → (int8 (K, N), fp32 scales (1, N)), symmetric per-channel
    abs-max (same as ops/quant.QDense)."""
    wmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    sw = jnp.maximum(wmax, 1e-6) / 127.0
    return jnp.round(w / sw).astype(jnp.int8), sw.astype(jnp.float32)


def _gelu_fast(x):
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 *
                                     (x + 0.044715 * x * x * x)))


def _apply_act(act, x):
    if act == "gelu_fast":
        return _gelu_fast(x)
    if act == "gelu":
        # erf GELU via the tanh-form minimax fit (ops/layers.gelu_exact) —
        # lax.erf has NO Pallas TPU lowering, so the erf form would fail to
        # compile on real hardware; the fit is ≤4.8e-7 off and faster anyway
        from x2vlm_tpu.ops.layers import gelu_exact
        return gelu_exact(x)
    return x


def _kernel(act, has_bias, out_dtype, K, *refs):
    i = 0
    x_ref = refs[i]; i += 1        # (TM, K) input dtype
    wq_ref = refs[i]; i += 1       # (K, TN) int8
    sw_ref = refs[i]; i += 1       # (1, TN) f32
    if has_bias:
        b_ref = refs[i]; i += 1    # (1, TN) f32
    o_ref = refs[i]; i += 1        # (TM, TN) out_dtype
    xq_s = refs[i]; i += 1         # (TM, K) int8 scratch
    sx_s = refs[i]; i += 1         # (TM, 128) f32 scratch (col 0 used)

    # The grid sweeps N tiles innermost (same x block index) — quantize the
    # row block ONCE on the first N tile and reuse the int8 rows + scales
    # from VMEM scratch for the remaining N/TN - 1 tiles.
    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        x = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)   # (TM, 1)
        sx = jnp.maximum(amax, 1e-6) / 127.0
        xq_s[...] = jnp.round(x / sx).astype(jnp.int8)
        sx_s[...] = jnp.broadcast_to(sx, sx_s.shape)

    acc = jax.lax.dot_general(
        xq_s[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                    # (TM, TN)
    out = acc.astype(jnp.float32) * sx_s[:, 0:1] * sw_ref[...]
    if has_bias:
        out = out + b_ref[...]
    out = _apply_act(act, out)
    o_ref[...] = out.astype(o_ref.dtype)


def _pad_rows(x, tm):
    M = x.shape[0]
    pad = (-M) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, M


def int8_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    sw: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    act: Optional[str] = None,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
) -> jnp.ndarray:
    """x (..., K) @ wq (K, N) int8 with fused dynamic per-token quantization
    and dequant/bias/act epilogue. Returns (..., N) in ``out_dtype``.

    Serving-only (round() has no gradient) — callers gate on deterministic.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = wq.shape[1]
    x2 = x.reshape(-1, K)
    x2, M = _pad_rows(x2, block_m)
    Mp = x2.shape[0]
    tn = min(block_n, N)
    if N % tn != 0:
        tn = N  # fall back to single N tile (shapes here are 768/3072-ish)
    tm = min(block_m, Mp)

    sw2 = sw.reshape(1, N).astype(jnp.float32)
    operands = [x2, wq, sw2]
    in_specs = [
        pl.BlockSpec((tm, K), lambda i, j: (i, 0)),
        pl.BlockSpec((K, tn), lambda i, j: (0, j)),
        pl.BlockSpec((1, tn), lambda i, j: (0, j)),
    ]
    if bias is not None:
        operands.append(bias.reshape(1, N).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, tn), lambda i, j: (0, j)))

    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_kernel, act, bias is not None, out_dtype, K)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // tm, N // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, K), jnp.int8),
            pltpu.VMEM((tm, 128), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(*operands)
    return out[:M].reshape(*lead, N)


def int8_matmul_xla(x, wq, sw, bias=None, *, act=None, out_dtype=jnp.bfloat16):
    """Same math via XLA — CPU/GPU fallback and parity reference."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * sw.reshape(1, -1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    out = _apply_act(act, out)
    return out.astype(out_dtype)
