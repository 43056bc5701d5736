"""Mixed-stream pretraining loop (reference Pretrain.py:189-423).

Semantics match the reference's ``run_mixed_iter`` (Pretrain.py:189-252):

- every stream with a loader is drawn EVERY iteration; its loss is weighted by
  the config's ``iter_perc`` (a loss weight, not a draw probability)
- ``aux_iter_perc`` (Pretrain.py:330-341) IS a probability: with prob p the
  image batch is replaced by a clean-data (aux) batch; when an aux stream
  exists, noisy image batches never compute the matching loss
- ``video_aux_iter_perc`` replaces the video batch the same way
- the parallel-text (mtext) stream drives the CCLM TTC/TTM/TLM objectives
  (Pretrain.py:238-247 run_mtext_iter)

Per-stream gradients come from separately-compiled jit functions (static
shapes per stream — no recompilation churn, SURVEY §7.3 #3), summed on-device,
applied in one optimizer step — the exact semantics of the reference's
multiple-backwards-one-step accumulation.
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
    """Per-stream infinite batch iterators + loss weights / aux probabilities.

    ``*_weight`` = the reference's per-stream ``iter_perc`` loss weight;
    ``aux_perc`` / ``video_aux_perc`` = clean-data replacement probabilities
    (reference aux_iter_perc / video_aux_iter_perc)."""

    def __init__(self, image: Iterator, region: Optional[Iterator] = None,
                 video: Optional[Iterator] = None, text: Optional[Iterator] = None,
                 mtext: Optional[Iterator] = None,
                 aux: Optional[Iterator] = None,
                 video_aux: Optional[Iterator] = None,
                 image_weight: float = 1.0,
                 region_weight: float = 1.0, video_weight: float = 1.0,
                 text_weight: float = 1.0, mtext_weight: float = 1.0,
                 aux_perc: float = 0.0, video_aux_perc: float = 0.0,
                 regions_use_bbox_only: bool = False,
                 rng: Optional[random.Random] = None,
                 # deprecated aliases (draw-probability misreading, kept so old
                 # call sites keep working as loss weights)
                 region_perc: Optional[float] = None,
                 video_perc: Optional[float] = None,
                 text_perc: Optional[float] = None):
        self.image = image
        self.region = region
        self.video = video
        self.text = text
        self.mtext = mtext
        self.aux = aux
        self.video_aux = video_aux
        self.image_weight = image_weight
        self.region_weight = region_perc if region_perc is not None else region_weight
        self.video_weight = video_perc if video_perc is not None else video_weight
        self.text_weight = text_perc if text_perc is not None else text_weight
        self.mtext_weight = mtext_weight
        self.aux_perc = aux_perc
        self.video_aux_perc = video_aux_perc
        self.regions_use_bbox_only = regions_use_bbox_only
        self.rng = rng or random.Random(0)


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
    calc_image_bbox_loss: bool = False,
    start_step: int = 0,
    log_every: int = 50,
    logger: Optional[MetricLogger] = None,
    checkpoint_fn: Optional[Callable] = None,
    checkpoint_every: int = 0,
    epoch_steps: int = 0,
    epoch_save_frequent: int = 1,
) -> TrainState:
    """Run mixed iterations from ``start_step`` (resume) to ``num_steps``.

    ``stop_calc_itm_after`` reproduces the reference's NaN-guard schedule
    (configs/pretrain/x2vlm_base_1b.yaml:70) — structurally unnecessary in
    bf16 but kept for config parity.

    ``calc_image_bbox_loss`` keeps the bbox loss on full-image region rows
    (reference Pretrain.py:87-88 passes is_image=None); default False excludes
    them, as every shipped config does.

    ``epoch_steps`` > 0 additionally checkpoints at every
    ``epoch_save_frequent``-th epoch boundary and at the final step
    (reference Pretrain.py:377 ``ckpt_frequent``), on top of the
    ``checkpoint_every``-step cadence (``ckpt_frequent_step``)."""
    logger = logger or MetricLogger()
    s = streams

    _image_grads: Dict = {}

    def image_grad_fn(weight, itm):
        """Image/video/aux streams share one compiled grad fn per
        (loss weight, with-ITM) combination."""
        if (weight, itm) not in _image_grads:
            _image_grads[(weight, itm)] = make_grad_fn(
                model, loss_scale=weight,
                apply_kwargs={"ret_match_loss": itm})
        return _image_grads[(weight, itm)]

    # bbox-only regions: zero out itc/itm/mlm (reference Pretrain.py:216-220)
    region_weights = ({"loss_itc": 0.0, "loss_itm": 0.0, "loss_mlm": 0.0}
                      if s.regions_use_bbox_only else None)
    grad_region = {
        itm: make_grad_fn(model, loss_scale=s.region_weight,
                          loss_weights=region_weights,
                          apply_kwargs={"ret_bbox_loss": True,
                                        "ret_match_loss": itm})
        for itm in (True, False)}
    grad_text = make_grad_fn(model, loss_scale=s.text_weight)
    grad_mtext = make_grad_fn(model, loss_scale=s.mtext_weight)
    apply_grads = make_apply_grads(tx)

    def log_iter():
        return logger.log_every(range(start_step, num_steps), log_every,
                                header="Pretrain:", total=num_steps)

    last_saved = -1
    for it in log_iter():
        key = jax.random.fold_in(rng_key, it)
        calc_itm = stop_calc_itm_after is None or it < stop_calc_itm_after

        # image stream, with aux clean-data replacement (Pretrain.py:330-341)
        if s.aux is not None:
            if s.rng.random() < s.aux_perc:
                batch, itm = next(s.aux), calc_itm
            else:
                batch, itm = next(s.image), False  # noisy: no matching loss
        else:
            batch, itm = next(s.image), calc_itm
        batch = shard_fn(batch)
        grads, losses = image_grad_fn(s.image_weight, itm)(
            state.params, batch, jax.random.fold_in(key, 0))
        metrics = {f"image_{k}": v for k, v in losses.items()}

        if s.region is not None:
            rb = dict(next(s.region))
            if calc_image_bbox_loss and "is_image" in rb:
                # keep every row in the bbox loss (reference is_image=None);
                # zeroing the mask preserves the static batch shape
                rb["is_image"] = rb["is_image"] * 0
            rb = shard_fn(rb)
            g2, l2 = grad_region[calc_itm](state.params, rb,
                                           jax.random.fold_in(key, 1))
            grads = tree_add(grads, g2)
            metrics.update({f"region_{k}": v for k, v in l2.items()})
        if s.video is not None:
            if s.video_aux is not None and s.rng.random() < s.video_aux_perc:
                vb = shard_fn(next(s.video_aux))
            else:
                vb = shard_fn(next(s.video))
            g3, l3 = image_grad_fn(s.video_weight, itm)(
                state.params, vb, jax.random.fold_in(key, 2))
            grads = tree_add(grads, g3)
            metrics.update({f"video_{k}": v for k, v in l3.items()})
        if s.text is not None:
            tb = dict(shard_fn(next(s.text)))
            tb["image"] = None
            g4, l4 = grad_text(state.params, tb, jax.random.fold_in(key, 3))
            grads = tree_add(grads, g4)
            metrics.update({f"text_{k}": v for k, v in l4.items()})
        if s.mtext is not None:
            mb = dict(shard_fn(next(s.mtext)))
            mb["image"] = None  # routes XVLMPlusForPretrain → forward_para_text
            g5, l5 = grad_mtext(state.params, mb, jax.random.fold_in(key, 4))
            grads = tree_add(grads, g5)
            metrics.update({f"mtext_{k}": v for k, v in l5.items()})

        state = apply_grads(state, grads)
        logger.update(**{k: float(v) for k, v in metrics.items()})

        if checkpoint_fn:
            step_hit = checkpoint_every and (it + 1) % checkpoint_every == 0
            # epoch-boundary saves (reference Pretrain.py:377: every
            # ckpt_frequent-th epoch, and always at the final epoch)
            epoch_hit = (epoch_steps and (it + 1) % epoch_steps == 0 and
                         (((it + 1) // epoch_steps) % max(1, epoch_save_frequent)
                          == 0 or it + 1 == num_steps))
            if (step_hit or epoch_hit) and last_saved != it + 1:
                checkpoint_fn(state, it + 1)
                last_saved = it + 1

    # always persist the final state (reference Pretrain.py:366-413 saves at
    # epoch end; runs shorter than ckpt_frequent_step must not exit empty)
    if checkpoint_fn and last_saved != num_steps:
        checkpoint_fn(state, num_steps)

    return state
