"""VQA task: generate-as-rank inference + result collection
(reference VQA.py:66-116, 176; also covers XGQA on the Plus base)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["evaluate_vqa"]


def evaluate_vqa(model, variables, dataset, answer_list: List[str],
                 answer_ids: np.ndarray, answer_atts: np.ndarray, *,
                 k_test: int = 128, batch_size: int = 32,
                 host_id: int = 0, num_hosts: int = 1) -> List[Dict]:
    """Rank the answer list per question. Returns [{question_id, answer}]
    (the reference's per-rank JSON shards + merge become a host-local list —
    multi-host callers shard `dataset` rows by host and merge the lists)."""
    k = min(k_test, len(answer_list))
    ans_ids = jnp.asarray(answer_ids)
    ans_atts = jnp.asarray(answer_atts)

    @jax.jit
    def predict(v, image, q_ids, q_atts):
        batch = {"image": image, "question_ids": q_ids, "question_atts": q_atts,
                 "answer_ids": ans_ids, "answer_atts": ans_atts}
        return model.apply(v, batch, k, method=model.predict)

    results: List[Dict] = []
    n = len(dataset)
    lo_h = host_id * (n // num_hosts + 1)
    hi_h = min(n, lo_h + n // num_hosts + 1)
    indices = list(range(lo_h, hi_h))
    for lo in range(0, len(indices), batch_size):
        chunk = indices[lo: lo + batch_size]
        samples = [dataset[i] for i in chunk]
        pad = batch_size - len(samples)
        rows = samples + [samples[-1]] * pad
        image = jnp.asarray(np.stack([s["image"] for s in rows]))
        q_ids = jnp.asarray(np.stack([s["question_ids"] for s in rows]))
        q_atts = jnp.asarray(np.stack([s["question_atts"] for s in rows]))
        topk_ids, _ = predict(variables, image, q_ids, q_atts)
        topk_ids = np.asarray(topk_ids)
        for j, s in enumerate(samples):
            results.append({
                "question_id": int(s["question_id"]),
                "answer": answer_list[int(topk_ids[j, 0])],
            })
    return results
