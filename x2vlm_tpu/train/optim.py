"""Optimizer + LR schedule factories.

Parity with reference optim.py:26-104 (AdamW β=(0.9, 0.98), eps 1e-8, up to 10
param groups) and scheduler.py:4-31 (step-based linear warmup → linear decay),
rebuilt on optax:

- weight decay is masked off bias / LayerNorm / norm-like params (the
  reference's ``no_decay`` set)
- per-group learning-rate multipliers come from one label tree: freshly
  initialized params get ``lr_mult`` (reference ``model.init_params``), and
  optional ``vision_lr / text_lr / cross_lr`` override the base lr for the
  respective towers (reference optim.py:39-104)
- the contrastive temperature is projected into [0.001, 0.5] after each update
  (reference clamps the parameter per step, Pretrain.py:328)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Set

import jax
import jax.numpy as jnp
import optax

__all__ = ["create_optimizer", "lr_schedule", "param_labels"]


def lr_schedule(base_lr: float, total_steps: int, warmup_steps: float = 0,
                min_rate: float = 0.0) -> Callable:
    """Linear warmup then linear decay to ``min_rate * base_lr``
    (reference scheduler.py:4-31; fractional warmup = fraction of total)."""
    if 0 < warmup_steps < 1:
        warmup_steps = int(total_steps * warmup_steps)
    warmup_steps = int(warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        frac = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        decay = jnp.maximum(min_rate, 1.0 - (1.0 - min_rate) * frac)
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _is_no_decay(path: str, leaf) -> bool:
    # bias, LayerNorm scale/bias, LayerScale gammas, tables, scalars
    last = path.rsplit("/", 1)[-1]
    if last in ("bias", "scale", "gamma_1", "gamma_2", "temp", "cls_token"):
        return True
    if "rel_pos_table" in last or "pos_embed" in last:
        return True
    return jnp.ndim(leaf) <= 1


def param_labels(params, fusion_layer: int,
                 fresh_paths: Optional[Iterable[str]] = None) -> Any:
    """Label tree: 'vision' | 'text' | 'cross' | 'other' | 'fresh'.

    ``fresh_paths`` are '/'-joined paths (as returned by
    checkpoint.merge_imported's missing list) for from-scratch params that get
    the lr_mult group (reference init_params, xvlm.py:566-577)."""
    fresh = set(fresh_paths or ())

    def label(path, leaf):
        p = _path_str(path)
        rel = p.split("params/", 1)[-1]
        for scope_strip in ("base/",):
            if rel.startswith(scope_strip):
                rel = rel[len(scope_strip):]
        if rel in fresh or p in fresh:
            return "fresh"
        if "vision_encoder" in p:
            return "vision"
        if "text_encoder/layer_" in p:
            layer = int(p.split("text_encoder/layer_")[1].split("/")[0])
            return "text" if layer < fusion_layer else "cross"
        if "text_encoder" in p:
            return "text"
        return "other"

    return jax.tree_util.tree_map_with_path(label, params)


def create_optimizer(
    params,
    schedule: Callable,
    *,
    weight_decay: float = 0.01,
    clip_grad_norm: Optional[float] = 1.0,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    lr_mult: float = 1.0,
    vision_lr_scale: float = 1.0,
    text_lr_scale: float = 1.0,
    cross_lr_scale: float = 1.0,
    labels: Any = None,
) -> optax.GradientTransformation:
    """AdamW with the reference's group structure. ``labels`` from
    ``param_labels``; None = single group."""

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _is_no_decay(_path_str(path), leaf), params)

    group_scale = {
        "vision": vision_lr_scale,
        "text": text_lr_scale,
        "cross": cross_lr_scale,
        "other": 1.0,
        "fresh": lr_mult,
    }

    def scale_by_group() -> optax.GradientTransformation:
        def init_fn(params_):
            return optax.EmptyState()

        def update_fn(updates, state, params_=None):
            if labels is None:
                return updates, state
            updates = jax.tree_util.tree_map(
                lambda u, lab: u * group_scale[lab], updates, labels)
            return updates, state

        return optax.GradientTransformation(init_fn, update_fn)

    chain = []
    if clip_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain += [
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        scale_by_group(),
        optax.scale_by_learning_rate(schedule),
    ]
    tx = optax.chain(*chain)
    return _with_temp_projection(tx)


def _with_temp_projection(tx: optax.GradientTransformation):
    """Wrap so that after applying updates, `temp` lands in [0.001, 0.5].
    Implemented as an update clamp: u_clamped = clip(p + u) - p."""

    def init_fn(params):
        return tx.init(params)

    def update_fn(updates, state, params=None):
        updates, state = tx.update(updates, state, params)
        if params is not None:
            def clamp(path, u, p):
                if _path_str(path).endswith("temp") and jnp.ndim(p) == 0:
                    return jnp.clip(p + u, 0.001, 0.5) - p
                return u

            updates = jax.tree_util.tree_map_with_path(clamp, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
