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
                 fresh_paths: Optional[Iterable[str]] = None,
                 fresh_prefixes: Iterable[str] = ()) -> Any:
    """Label tree: 'vision' | 'text' | 'cross' | 'other' | 'fresh'.

    ``fresh_paths`` are '/'-joined paths (as returned by
    checkpoint.merge_imported's missing list) for from-scratch params that get
    the lr_mult group (reference init_params, xvlm.py:566-577).
    ``fresh_prefixes`` put whole subtrees in the lr_mult group — e.g.
    ("text_decoder",) for large_lr_for_dec (reference
    model_generation.py:445-447 puts every decoder param in init_params)."""
    fresh = set(fresh_paths or ())
    prefixes = tuple(fresh_prefixes or ())

    def label(path, leaf):
        p = _path_str(path)
        rel = p.split("params/", 1)[-1]
        for scope_strip in ("base/",):
            if rel.startswith(scope_strip):
                rel = rel[len(scope_strip):]
        if rel in fresh or p in fresh:
            return "fresh"
        if any(rel.startswith(pfx) for pfx in prefixes):
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
    flatten: bool = False,
    fused: bool = False,
) -> optax.GradientTransformation:
    """AdamW with the reference's group structure. ``labels`` from
    ``param_labels``; None = single group.

    ``flatten=True`` runs the mathematically-identical update over ONE flat
    fp32 vector (leaves grouped into contiguous same-coefficient segments):
    a few fused kernels instead of ~10 tiny kernels × hundreds of leaves.
    CAUTION — the op-level kernel saving (~9 → ~4 ms at base scale) does NOT
    survive at model level: the whole-tree _flatten/_unflatten copies cost
    ~4 full param-size HBM passes per step, and a same-run interleaved v5e
    A/B measured the base pretrain step at 138-141 ms flat vs 107-108 ms
    tree (211 vs 137.8 ms at 593M). Off by default everywhere; opt in via
    config ``flat_optimizer: true`` only for param trees with thousands of
    tiny leaves. Also requires replicated optimizer state (fsdp == 1) — the
    flat state conflicts with per-leaf fsdp partition rules, and its
    checkpoint layout differs from the tree optimizer's."""

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _is_no_decay(_path_str(path), leaf), params)

    if flatten:
        return _flat_adamw(
            params, schedule, weight_decay=weight_decay,
            clip_grad_norm=clip_grad_norm, b1=b1, b2=b2, eps=eps,
            decay_mask=decay_mask, labels=labels,
            group_scale={"vision": vision_lr_scale, "text": text_lr_scale,
                         "cross": cross_lr_scale, "other": 1.0,
                         "fresh": lr_mult})
    if fused:
        # per-leaf fused update: exact chain math in one expression per leaf.
        # MEASURED AT PARITY with the chain on v5e (interleaved A/B: base
        # 107.5-112.6 vs 107.0-108.3 ms, large 130.3-131.6 vs 129.9-130.3) —
        # XLA already fuses the optax chain's stages and CSEs the clip's
        # global-norm with the step metric's, so the chain stays the default
        # (optax-standard state layout); this path pins the chain's exact
        # semantics via test_train.py and doubles as direct evidence that
        # the optimizer bucket sits at its HBM floor (STATUS round 5).
        return _fused_adamw(
            params, schedule, weight_decay=weight_decay,
            clip_grad_norm=clip_grad_norm, b1=b1, b2=b2, eps=eps,
            decay_mask=decay_mask, labels=labels,
            group_scale={"vision": vision_lr_scale, "text": text_lr_scale,
                         "cross": cross_lr_scale, "other": 1.0,
                         "fresh": lr_mult})

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


def _fused_adamw(params, schedule: Callable, *, weight_decay: float,
                 clip_grad_norm: Optional[float], b1: float, b2: float,
                 eps: float, decay_mask, labels, group_scale
                 ) -> optax.GradientTransformation:
    """Per-leaf FUSED AdamW: the exact math of the chain
    clip → scale_by_adam → add_decayed_weights(mask) → group-scale → -lr
    (+ temp projection), but as ONE elementwise expression per leaf, so XLA
    emits ~one kernel per leaf touching g/mu/nu/p once. MEASURED AT PARITY
    with the chain on v5e (interleaved A/B: base 107.5-112.6 vs 107.0-108.3
    ms; large 130.3-131.6 vs 129.9-130.3) — XLA already fuses the chain's
    stages and CSEs its global-norm with the step metric's, which is direct
    evidence the optimizer bucket sits at its HBM floor. Kept non-default as
    an exactness pin of the chain's semantics (test_train.py). The pre-clip
    grad norm is stashed in the state ('gnorm') like the flat variant.

    Opt-state layout: {"count", "gnorm", "mu": tree, "nu": tree} — differs
    from the optax chain's tuple-of-stage-states (a fresh-training layout
    change; exactness vs the chain is pinned by test_train.py)."""
    def init_fn(params_):
        zeros = lambda: jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), params_)
        return {"mu": zeros(), "nu": zeros(),
                "count": jnp.zeros((), jnp.int32),
                "gnorm": jnp.zeros((), jnp.float32)}

    def update_fn(updates, state, params_=None):
        g_norm = optax.global_norm(updates)
        trigger = g_norm < clip_grad_norm if clip_grad_norm is not None \
            else None
        count = state["count"] + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        lr = schedule(state["count"])  # optax scale_by_schedule: pre-inc

        def leaf(path, g, mu, nu, p, decay, lab):
            if trigger is not None:
                # exact optax.clip_by_global_norm arithmetic order
                g = jax.lax.select(
                    jnp.broadcast_to(trigger, g.shape), g,
                    (g / g_norm.astype(g.dtype)) * clip_grad_norm)
            mu2 = (1.0 - b1) * g + b1 * mu
            nu2 = (1.0 - b2) * (g * g) + b2 * nu
            u = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
            if decay and weight_decay:
                u = u + weight_decay * p
            u = u * (-lr * group_scale[lab])
            if _path_str(path).endswith("temp") and jnp.ndim(p) == 0:
                u = jnp.clip(p + u, 0.001, 0.5) - p
            return u, mu2, nu2

        lab_tree = labels if labels is not None else jax.tree_util.tree_map(
            lambda _: "other", updates)
        out = jax.tree_util.tree_map_with_path(
            leaf, updates, state["mu"], state["nu"], params_, decay_mask,
            lab_tree)
        new_u = jax.tree_util.tree_map(lambda t: t[0], out,
                                       is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        return new_u, {"mu": mu, "nu": nu, "count": count, "gnorm": g_norm}

    return optax.GradientTransformation(init_fn, update_fn)


def _flat_adamw(params, schedule: Callable, *, weight_decay: float,
                clip_grad_norm: Optional[float], b1: float, b2: float,
                eps: float, decay_mask, labels, group_scale
                ) -> optax.GradientTransformation:
    """Flat-vector AdamW exactly matching the chain
    clip → scale_by_adam → add_decayed_weights(mask) → group-scale → -lr,
    plus the temp projection.

    Leaves are permuted so that all leaves sharing a (decay, lr-scale)
    coefficient pair form one contiguous segment of the flat vector; the
    per-group affine ``(u + wd·p) · (-lr·scale)`` then runs as ≤ ~10 fused
    segment ops instead of one kernel per leaf."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [l for _, l in leaves_with_path]
    paths = [_path_str(p) for p, _ in leaves_with_path]
    n = len(leaves)
    mask_leaves = jax.tree_util.tree_leaves(decay_mask)
    label_leaves = (jax.tree_util.tree_leaves(labels) if labels is not None
                    else ["other"] * n)
    assert len(mask_leaves) == n and len(label_leaves) == n

    coeff = [(bool(mask_leaves[i]), float(group_scale[label_leaves[i]]))
             for i in range(n)]
    perm = sorted(range(n), key=lambda i: coeff[i])
    sizes = [int(leaves[i].size) for i in range(n)]
    shapes = [leaves[i].shape for i in range(n)]
    dtypes = [leaves[i].dtype for i in range(n)]
    total = sum(sizes)

    # contiguous (start, end, decay?, scale) segments in permuted order
    segments = []
    ofs = 0
    for i in perm:
        if segments and segments[-1][2:] == coeff[i]:
            segments[-1] = (segments[-1][0], ofs + sizes[i]) + coeff[i]
        else:
            segments.append((ofs, ofs + sizes[i]) + coeff[i])
        ofs += sizes[i]

    # position of the contrastive temp scalar in the flat vector
    temp_pos = None
    ofs = 0
    for i in perm:
        if paths[i].endswith("temp") and len(shapes[i]) == 0:
            temp_pos = ofs
        ofs += sizes[i]

    def _flatten(tree):
        ls = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate(
            [ls[i].reshape(-1).astype(jnp.float32) for i in perm])

    def _unflatten(vec):
        out = [None] * n
        ofs = 0
        for i in perm:
            out[i] = vec[ofs: ofs + sizes[i]].reshape(shapes[i]).astype(
                dtypes[i])
            ofs += sizes[i]
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params_):
        # distinct buffers — mu/nu aliasing one array breaks jit donation
        # ("Attempt to donate the same buffer twice")
        return {"mu": jnp.zeros((total,), jnp.float32),
                "nu": jnp.zeros((total,), jnp.float32),
                "count": jnp.zeros((), jnp.int32),
                "gnorm": jnp.zeros((), jnp.float32)}

    def update_fn(updates, state, params_=None):
        g = _flatten(updates)
        # pre-clip global norm; stashed in the state so the train step's
        # grad_norm metric reads it instead of a second full-tree pass
        g_norm = jnp.sqrt(jnp.sum(g * g))
        if clip_grad_norm is not None:
            # optax.clip_by_global_norm semantics
            g = g * jnp.where(g_norm < clip_grad_norm, 1.0,
                              clip_grad_norm / g_norm)
        count = state["count"] + 1
        mu = b1 * state["mu"] + (1.0 - b1) * g
        nu = b2 * state["nu"] + (1.0 - b2) * g * g
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        u = mu_hat / (jnp.sqrt(nu_hat) + eps)
        lr = schedule(state["count"])
        p = _flatten(params_) if params_ is not None else None
        pieces = []
        for start, end, decay, scale in segments:
            seg = u[start:end]
            if decay and weight_decay and p is not None:
                seg = seg + weight_decay * p[start:end]
            pieces.append(seg * (-lr * scale))
        flat_u = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        if temp_pos is not None and p is not None:
            pt = p[temp_pos]
            tu = jnp.clip(pt + flat_u[temp_pos], 0.001, 0.5) - pt
            flat_u = flat_u.at[temp_pos].set(tu)
        return _unflatten(flat_u), {"mu": mu, "nu": nu, "count": count,
                                    "gnorm": g_norm}

    return optax.GradientTransformation(init_fn, update_fn)


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
