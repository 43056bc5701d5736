"""Dynamic W8A8 int8 quantization for the serving encode path.

**Measured honestly: on v5e this does NOT beat bf16 at X2VLM shapes.**
Same-run A/B on the chip (round 3; M=25k rows):
  fc1 (K=768, N=3072):  bf16 87 TF/s | int8 XLA 78 | int8 Pallas-fused 65
  fc2 (K=3072, N=768):  bf16 86      | int8 XLA 86 | 69
  4096³ control:        bf16 87      | int8 XLA 94 | 74
The earlier "int8 = 1.6× bf16" figure came from a deep-K chained microbench
that the tunnel's dispatch cache inflates (same benchmark now reports >
chip peak — unusable); at real model depths the int8 MXU path is at best
~1.08× and the dynamic-quant stages erase that. The path is kept because
(a) the param tree is checkpoint-identical so nothing is lost, and (b) on
hardware where int8 genuinely doubles MXU rate the plumbing is done — but
enabling it on v5e logs a warning instead of silently de-optimizing.

Scheme — standard dynamic per-token × per-out-channel quantization:
- weights: symmetric per-output-channel scales from abs-max (quantized
  on-the-fly from the fp32 master params: weight traffic is negligible next
  to activations at serving batch sizes, and checkpoints stay unchanged);
- activations: symmetric per-token scales from abs-max, computed at runtime
  (no calibration pass needed);
- accumulation in int32; dequantize with the outer product of scales.

``QDense`` is param-tree-compatible with ``nn.Dense`` (kernel/bias names,
shapes, fp32, same init), so any checkpoint loads into either. Callers that
feed several projections from one input (QKV) quantize once via
``quantize_act`` and pass the pair through.

Enable with ``quant_int8: true`` on the vision/text config (serving only —
the quantizer's round() has no useful gradient).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["quantize_act", "QDense"]

_warned = False


def _warn_once():
    global _warned
    if not _warned:
        _warned = True
        import warnings
        warnings.warn(
            "quant_int8: measured SLOWER than bf16 on TPU v5e at X2VLM "
            "shapes (int8 MXU ≤1.08× bf16 before quant overheads — see "
            "ops/quant.py header). Keep it off unless your hardware's int8 "
            "matmul rate is genuinely ~2× bf16.", stacklevel=2)


def quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric int8 quantization: returns (x_int8, scale_f32)
    with scale shaped (..., 1)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.round(xf / scale).astype(jnp.int8)
    return xq, scale


class QDense(nn.Module):
    """Drop-in int8 replacement for ``nn.Dense`` (identical param tree).

    On TPU the whole pipeline (per-token quantize → int8 MXU matmul →
    dequant/bias/act) runs as ONE fused Pallas kernel
    (ops/int8_matmul.py) — the XLA-level epilogues were measured to cost
    more than the int8 matmul win. ``act`` ("gelu"/"gelu_fast") fuses the
    following activation into the epilogue (used by Mlp's fc1)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xq: Optional[jnp.ndarray] = None,
                 sx: Optional[jnp.ndarray] = None,
                 act: Optional[str] = None):
        from x2vlm_tpu.ops.int8_matmul import (
            _INTERPRET, int8_matmul, int8_matmul_xla, quantize_weight,
        )

        _warn_once()
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) if self.use_bias \
            else None
        wq, sw = quantize_weight(kernel)
        if jax.default_backend() == "tpu" or _INTERPRET:
            return int8_matmul(x, wq, sw, bias, act=act,
                               out_dtype=self.dtype)
        # CPU/GPU fallback (tests): identical math via XLA; the pre-shared
        # (xq, sx) pair from quantize_act is honored when given
        if xq is not None:
            out = jax.lax.dot_general(
                xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = out.astype(jnp.float32) * sx * sw
            if bias is not None:
                out = out + bias
            from x2vlm_tpu.ops.int8_matmul import _apply_act

            return _apply_act(act, out).astype(self.dtype)
        return int8_matmul_xla(x, wq, sw, bias, act=act,
                               out_dtype=self.dtype)
