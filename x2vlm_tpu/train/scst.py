"""Self-critical sequence training criterion (reference utils/__init__.py:17-98
ScstRewardCriterion — present in the reference but not wired into any script;
provided here for the same capability).

Policy-gradient captioning: reward = CIDEr-D of sampled captions minus a
baseline (greedy caption or the mean of the other samples per image)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from x2vlm_tpu.evalkit.caption import cider_d

__all__ = ["scst_rewards", "scst_loss_weights"]


def scst_rewards(sampled: Sequence[str], references: Sequence[List[str]],
                 baseline: Sequence[str] | None = None,
                 num_samples_per_image: int = 1) -> np.ndarray:
    """Per-sample advantage. sampled: N*k captions (k per image); references:
    N reference lists; baseline: N greedy captions, or None → leave-one-out
    mean of the k samples (reference :52-76)."""
    k = num_samples_per_image
    n = len(references)
    assert len(sampled) == n * k
    scores = np.asarray([
        cider_d([sampled[i * k + j]], [references[i]])
        for i in range(n) for j in range(k)
    ], np.float32).reshape(n, k)
    if baseline is not None:
        base = np.asarray([cider_d([b], [r])
                           for b, r in zip(baseline, references)],
                          np.float32)[:, None]
    else:
        if k == 1:
            base = np.zeros((n, 1), np.float32)
        else:
            total = scores.sum(axis=1, keepdims=True)
            base = (total - scores) / (k - 1)
    return (scores - base).reshape(-1)


def scst_loss_weights(rewards: np.ndarray) -> np.ndarray:
    """Weights for the per-sample negative log-likelihood: loss =
    mean(advantage * NLL(sampled caption))."""
    return rewards.astype(np.float32)
