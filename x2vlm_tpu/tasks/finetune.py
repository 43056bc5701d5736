"""Generic fine-tune epoch loop shared by all task scripts (replaces the
near-identical train() functions in the reference's 15 root scripts, e.g.
Retrieval.py:218-282, NLVR.py, Grounding_bbox.py)."""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import jax

from x2vlm_tpu.core.mesh import shard_batch
from x2vlm_tpu.train.metrics import MetricLogger
from x2vlm_tpu.train.trainer import TrainState

__all__ = ["train_epochs", "append_log"]


def append_log(output_dir: str, record: Dict):
    """JSON-lines log.txt (reference Pretrain.py:368-375)."""
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "log.txt"), "a") as f:
        f.write(json.dumps(record) + "\n")


def train_epochs(
    model,
    state: TrainState,
    step_fn: Callable,
    loader,
    *,
    num_epochs: int,
    rng_key,
    start_epoch: int = 0,
    use_mesh: bool = False,
    eval_fn: Optional[Callable] = None,
    eval_start_epoch: int = 0,
    metric_key: Optional[str] = None,
    output_dir: Optional[str] = None,
    save_fn: Optional[Callable] = None,
    log_every: int = 50,
) -> TrainState:
    """Run epochs from ``start_epoch`` (resume); after each, optionally
    evaluate, log, and keep the best checkpoint by `metric_key` (reference
    "best" tracking, Retrieval.py:363-396)."""
    best = float("-inf")
    for epoch in range(start_epoch, num_epochs):
        logger = MetricLogger()
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        for batch in logger.log_every(iter(loader), log_every,
                                      header=f"Epoch {epoch}:",
                                      total=len(loader) if hasattr(loader, "__len__") else None):
            if use_mesh:
                batch = shard_batch(batch)
            else:
                batch = jax.tree_util.tree_map(jax.numpy.asarray, batch)
            state, metrics = step_fn(state, batch, rng_key)
            logger.update(**{k: float(v) for k, v in metrics.items()})

        record = {"epoch": epoch, **logger.to_dict()}
        is_best = False
        # `start_eval` skips the (expensive) eval for early epochs
        # (reference VQA.py:233,249)
        if eval_fn is not None and epoch >= eval_start_epoch:
            eval_metrics = eval_fn(state)
            record.update({f"eval_{k}": v for k, v in eval_metrics.items()})
            if metric_key and eval_metrics.get(metric_key, float("-inf")) > best:
                best = eval_metrics[metric_key]
                is_best = True
        if save_fn:
            # save every epoch (reference saves per-epoch regardless of eval,
            # Retrieval.py:363-396); `best` flags the best-so-far epoch so the
            # checkpointer can additionally keep it aside
            save_fn(state, epoch, best=is_best)
        if output_dir:
            append_log(output_dir, record)
    return state
