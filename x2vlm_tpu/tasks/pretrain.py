"""Mixed-stream pretraining loop (reference Pretrain.py:189-423).

Streams: image-text (always), region-text / video-text / text-only /
parallel-text, each drawn per-iteration with probability ``iter_perc``
(reference :330-354). Per-stream gradients come from separately-compiled jit
functions (static shapes per stream — no recompilation churn, SURVEY §7.3 #3),
summed on-device, applied in one optimizer step — the exact semantics of the
reference's multiple-backwards-one-step accumulation (:189-252).
"""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from x2vlm_tpu.train.metrics import MetricLogger
from x2vlm_tpu.train.trainer import (
    TrainState, make_apply_grads, make_grad_fn, tree_add,
)

__all__ = ["PretrainStreams", "pretrain_loop"]


class PretrainStreams:
    """Holds per-stream infinite batch iterators + draw probabilities."""

    def __init__(self, image: Iterator, region: Optional[Iterator] = None,
                 video: Optional[Iterator] = None, text: Optional[Iterator] = None,
                 aux: Optional[Iterator] = None,
                 region_perc: float = 1.0, video_perc: float = 1.0,
                 text_perc: float = 1.0, aux_perc: float = 0.0,
                 rng: Optional[random.Random] = None):
        self.image = image
        self.region = region
        self.video = video
        self.text = text
        self.aux = aux  # clean-data image-text stream (reference aux_iter_perc)
        self.region_perc = region_perc
        self.video_perc = video_perc
        self.text_perc = text_perc
        self.aux_perc = aux_perc
        self.rng = rng or random.Random(0)

    def draw(self):
        """Which optional streams participate this iteration."""
        return {
            "region": self.region is not None and self.rng.random() < self.region_perc,
            "video": self.video is not None and self.rng.random() < self.video_perc,
            "text": self.text is not None and self.rng.random() < self.text_perc,
            "aux": self.aux is not None and self.rng.random() < self.aux_perc,
        }


def pretrain_loop(
    model,
    state: TrainState,
    tx,
    streams: PretrainStreams,
    *,
    num_steps: int,
    rng_key,
    shard_fn: Callable = lambda b: b,
    stop_calc_itm_after: Optional[int] = None,
    log_every: int = 50,
    logger: Optional[MetricLogger] = None,
    checkpoint_fn: Optional[Callable] = None,
    checkpoint_every: int = 0,
) -> TrainState:
    """Run `num_steps` mixed iterations. ``stop_calc_itm_after`` reproduces the
    reference's NaN-guard schedule (configs/pretrain/x2vlm_base_1b.yaml:70) —
    structurally unnecessary in bf16 but kept for config parity."""
    logger = logger or MetricLogger()

    grad_image = make_grad_fn(model)
    grad_image_noitm = make_grad_fn(model, apply_kwargs={"ret_match_loss": False})
    grad_region = make_grad_fn(model, apply_kwargs={"ret_bbox_loss": True})
    grad_region_noitm = make_grad_fn(
        model, apply_kwargs={"ret_bbox_loss": True, "ret_match_loss": False})
    grad_text = make_grad_fn(model)
    apply_grads = make_apply_grads(tx)

    def log_iter():
        return logger.log_every(range(num_steps), log_every,
                                header="Pretrain:", total=num_steps)

    for it in log_iter():
        key = jax.random.fold_in(rng_key, it)
        calc_itm = stop_calc_itm_after is None or it < stop_calc_itm_after
        g_img = grad_image if calc_itm else grad_image_noitm
        g_reg = grad_region if calc_itm else grad_region_noitm

        batch = shard_fn(next(streams.image))
        grads, losses = g_img(state.params, batch, jax.random.fold_in(key, 0))
        metrics = {f"image_{k}": v for k, v in losses.items()}

        draw = streams.draw()
        if draw["region"]:
            rb = shard_fn(next(streams.region))
            g2, l2 = g_reg(state.params, rb, jax.random.fold_in(key, 1))
            grads = tree_add(grads, g2)
            metrics.update({f"region_{k}": v for k, v in l2.items()})
        if draw["video"]:
            vb = shard_fn(next(streams.video))
            g3, l3 = g_img(state.params, vb, jax.random.fold_in(key, 2))
            grads = tree_add(grads, g3)
            metrics.update({f"video_{k}": v for k, v in l3.items()})
        if draw["aux"]:
            ab = shard_fn(next(streams.aux))
            g5, l5 = g_img(state.params, ab, jax.random.fold_in(key, 4))
            grads = tree_add(grads, g5)
            metrics.update({f"aux_{k}": v for k, v in l5.items()})
        if draw["text"]:
            tb = dict(shard_fn(next(streams.text)))
            tb["image"] = None
            g4, l4 = grad_text(state.params, tb, jax.random.fold_in(key, 3))
            grads = tree_add(grads, g4)
            metrics.update({f"text_{k}": v for k, v in l4.items()})

        state = apply_grads(state, grads)
        logger.update(**{k: float(v) for k, v in metrics.items()})

        if checkpoint_fn and checkpoint_every and (it + 1) % checkpoint_every == 0:
            checkpoint_fn(state, it + 1)

    return state
