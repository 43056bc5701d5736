"""Dynamic W8A8 int8 quantization for the serving encode path.

v5e's MXU runs int8×int8→int32 at ~2× the bf16 rate (measured on the shared
chip: 184 vs 114 TOP/s on an 8k³ chain). The matmul-roofline-bound encode
towers (projections + FFN) get most of that; attention itself stays bf16
(the Pallas flash kernel).

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


def quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric int8 quantization: returns (x_int8, scale_f32)
    with scale shaped (..., 1)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.round(xf / scale).astype(jnp.int8)
    return xq, scale


class QDense(nn.Module):
    """Drop-in int8 replacement for ``nn.Dense`` (identical param tree)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xq: Optional[jnp.ndarray] = None,
                 sx: Optional[jnp.ndarray] = None):
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        if xq is None:
            xq, sx = quantize_act(x)
        wmax = jnp.max(jnp.abs(kernel), axis=0, keepdims=True)   # (1, out)
        sw = jnp.maximum(wmax, 1e-6) / 127.0
        wq = jnp.round(kernel / sw).astype(jnp.int8)
        out = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * sx * sw
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias
        return out.astype(self.dtype)
