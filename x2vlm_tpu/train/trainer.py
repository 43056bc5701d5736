"""Jitted train steps over the device mesh.

Replaces the reference's Apex/DDP hot loop (Pretrain.py:255-423,
accelerators/apex_ddp_accelerator.py): one pjit-compiled function per stream
shape; gradients reduce over the `data` axis implicitly (XLA psum from the
sharded-batch mean), parameters stay replicated (or fsdp-sharded), no
broadcasts or barriers.

Mixed-stream pretraining (reference run_mixed_iter, Pretrain.py:189-252, which
issues several backwards then one optimizer step) maps to: per-stream
``grad_fn`` calls → tree-sum of gradients → one ``apply_grads``. Each stream
has static shapes, so each gets exactly one compilation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_grad_fn", "make_apply_grads", "tree_add"]


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @property
    def param_dict(self):
        return {"params": self.params}


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    p = params["params"] if "params" in params else params
    return TrainState(step=jnp.zeros((), jnp.int32), params=p,
                      opt_state=tx.init(p))


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _total_loss(losses: Dict[str, jnp.ndarray],
                weights: Optional[Dict[str, float]]) -> jnp.ndarray:
    total = jnp.asarray(0.0, jnp.float32)
    for k, v in losses.items():
        w = 1.0 if weights is None else weights.get(k, 1.0)
        total = total + w * v.astype(jnp.float32)
    return total


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    loss_weights: Optional[Dict[str, float]] = None,
    apply_kwargs: Optional[Dict[str, Any]] = None,
    donate: bool = True,
) -> Callable:
    """Single-stream fused step: grads + update in one jit.

    ``model.apply`` is called as ``model.apply(vars, batch-or-args..., rng=,
    rngs={'dropout'})`` and must return a dict of scalar losses."""
    apply_kwargs = dict(apply_kwargs or {})

    def step(state: TrainState, batch, rng):
        rng_itm, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            losses = model.apply(
                {"params": params},
                batch,
                rng=rng_itm,
                rngs={"dropout": rng_drop},
                **apply_kwargs,
            )
            return _total_loss(losses, loss_weights), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = dict(losses)
        metrics["loss_total"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_grad_fn(model, *, loss_weights=None, apply_kwargs=None) -> Callable:
    """Per-stream gradient computation (for multi-stream accumulation)."""
    apply_kwargs = dict(apply_kwargs or {})

    @jax.jit
    def grad_fn(params, batch, rng):
        rng_itm, rng_drop = jax.random.split(rng)

        def loss_fn(p):
            losses = model.apply({"params": p}, batch, rng=rng_itm,
                                 rngs={"dropout": rng_drop}, **apply_kwargs)
            return _total_loss(losses, loss_weights), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        losses["loss_total"] = total
        return grads, losses

    return grad_fn


def make_apply_grads(tx: optax.GradientTransformation) -> Callable:
    @jax.jit
    def apply_grads(state: TrainState, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state)

    return apply_grads
