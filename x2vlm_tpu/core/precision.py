"""Mixed-precision policy — the TPU replacement for Apex AMP O0/O1/O2
(reference: accelerators/apex_ddp_accelerator.py:79-89).

On TPU the idiomatic policy is: **fp32 parameters / bf16 compute**, no loss
scaling (bf16 has fp32's exponent range, so the reference's dynamic loss scale
and its fp16 NaN workarounds — Q-prescaling at xbert.py:364-369 and
`stop_calc_itm` scheduling — become structural no-ops).

A ``DynamicLossScale`` shim is still provided for exact-parity fp16
experiments, mirroring Apex's dynamic scaler (init 2**15 in Apex; the reference
caps at max 1024, min 1.0 via config FP16_LOSS_SCALE).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import chex
import jax
import jax.numpy as jnp

__all__ = ["Policy", "DEFAULT_POLICY", "FP32_POLICY", "cast_floating", "DynamicLossScale"]


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: params stored in `param_dtype`, matmuls/activations in
    `compute_dtype`, normalization statistics and softmax in `norm_dtype`."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    norm_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return cast_floating(tree, self.compute_dtype)

    def cast_to_param(self, tree):
        return cast_floating(tree, self.param_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def cast_floating(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


@chex.dataclass
class DynamicLossScale:
    """Apex-style dynamic loss scaling (only needed for fp16 parity runs).

    Doubles the scale every `growth_interval` good steps, halves on non-finite
    grads (skipping the update). Matches the reference's configured bounds
    (max 1024.0, min 1.0; configs/pretrain/x2vlm_base_4m.yaml:65).
    """

    scale: jnp.ndarray
    good_steps: jnp.ndarray
    growth_interval: int = 2000
    max_scale: float = 1024.0
    min_scale: float = 1.0

    @classmethod
    def create(cls, init_scale: float = 1024.0, growth_interval: int = 2000):
        return cls(
            scale=jnp.asarray(init_scale, jnp.float32),
            good_steps=jnp.asarray(0, jnp.int32),
            growth_interval=growth_interval,
        )

    def scale_loss(self, loss):
        return loss * self.scale.astype(loss.dtype)

    def unscale_grads(self, grads):
        inv = 1.0 / self.scale
        return jax.tree_util.tree_map(lambda g: g * inv.astype(g.dtype), grads)

    def update(self, grads_finite: jnp.ndarray) -> "DynamicLossScale":
        grow = (self.good_steps + 1) >= self.growth_interval
        new_scale = jnp.where(
            grads_finite,
            jnp.where(grow, jnp.minimum(self.scale * 2.0, self.max_scale), self.scale),
            jnp.maximum(self.scale * 0.5, self.min_scale),
        )
        new_good = jnp.where(grads_finite & ~grow, self.good_steps + 1, 0)
        return dataclasses.replace(self, scale=new_scale, good_steps=new_good)


def all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    finite = [jnp.all(jnp.isfinite(x)) for x in leaves if jnp.issubdtype(x.dtype, jnp.floating)]
    return jnp.all(jnp.stack(finite)) if finite else jnp.asarray(True)
