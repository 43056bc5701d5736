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


def _grad_norm(opt_state, grads):
    """Pre-clip global gradient norm. The flat fused optimizer already
    computed it over its flat vector (train/optim._flat_adamw) — reuse that
    instead of a second full-tree reduction (~900 MB of HBM reads at base
    scale); fall back to optax.global_norm for the tree chain."""
    if isinstance(opt_state, dict) and "gnorm" in opt_state:
        return opt_state["gnorm"]
    return optax.global_norm(grads)


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
    accum_steps: int = 1,
) -> Callable:
    """Single-stream fused step: grads + update in one jit.

    ``model.apply`` is called as ``model.apply(vars, batch-or-args..., rng=,
    rngs={'dropout'})`` and must return a dict of scalar losses.

    ``accum_steps > 1``: gradient accumulation as a ``lax.scan`` over
    microbatches (reference fine-tune scripts' loss/accum + step-every-N,
    Retrieval.py:40,49-59) — the leading batch dim splits into
    (accum, B/accum); grads are averaged. NOTE: losses with cross-sample
    coupling (in-batch ITC/ITM) see microbatch-local negatives, exactly like
    the reference's accumulation."""
    apply_kwargs = dict(apply_kwargs or {})

    def step(state: TrainState, batch, rng):
        rng_itm, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params, mb, key_i, key_d):
            losses = model.apply(
                {"params": params},
                mb,
                rng=key_i,
                rngs={"dropout": key_d},
                **apply_kwargs,
            )
            return _total_loss(losses, loss_weights), losses

        if accum_steps <= 1:
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng_itm, rng_drop)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                    + x.shape[1:]) if hasattr(x, "shape") and
                x.ndim >= 1 else x, batch)

            def body(carry, xs):
                grads_acc, total_acc = carry
                mb, i = xs
                (t, losses_i), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, jax.random.fold_in(rng_itm, i),
                    jax.random.fold_in(rng_drop, i))
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                return (grads_acc, total_acc + t), losses_i

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, jnp.float32), state.params)
            (grads, total), losses_stacked = jax.lax.scan(
                body, (zero_grads, jnp.asarray(0.0, jnp.float32)),
                (micro, jnp.arange(accum_steps)))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            total = total * inv
            losses = jax.tree_util.tree_map(jnp.mean, losses_stacked)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = dict(losses)
        metrics["loss_total"] = total
        metrics["grad_norm"] = _grad_norm(opt_state, grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_grad_fn(model, *, loss_weights=None, loss_scale: float = 1.0,
                 apply_kwargs=None) -> Callable:
    """Per-stream gradient computation (for multi-stream accumulation).

    ``loss_scale`` multiplies the whole stream's loss — the reference's
    per-stream ``iter_perc`` loss weight (Pretrain.py:196-242). Reported
    losses stay unscaled, matching the reference's metric logging."""
    apply_kwargs = dict(apply_kwargs or {})

    @jax.jit
    def grad_fn(params, batch, rng):
        rng_itm, rng_drop = jax.random.split(rng)

        def loss_fn(p):
            losses = model.apply({"params": p}, batch, rng=rng_itm,
                                 rngs={"dropout": rng_drop}, **apply_kwargs)
            return loss_scale * _total_loss(losses, loss_weights), losses

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
