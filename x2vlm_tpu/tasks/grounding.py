"""Grounding task: bbox prediction over an eval set + IoU accuracy
(reference Grounding_bbox.py:72-92 + dataset/utils.py:363-400)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["predict_grounding"]


def predict_grounding(model, variables, dataset, *, batch_size: int = 32,
                      host_id: int = 0, num_hosts: int = 1) -> List[Dict]:
    """Returns [{ref_id, pred: cxcywh normalized}] for evalkit.grounding."""

    @jax.jit
    def predict(v, image, ids, atts):
        return model.apply(v, image, ids, atts, method=model.predict)

    n = len(dataset)
    step = n // num_hosts + 1
    indices = list(range(host_id * step, min(n, (host_id + 1) * step)))
    results: List[Dict] = []
    for lo in range(0, len(indices), batch_size):
        chunk = indices[lo: lo + batch_size]
        samples = [dataset[i] for i in chunk]
        rows = samples + [samples[-1]] * (batch_size - len(samples))
        image = jnp.asarray(np.stack([s["image"] for s in rows]))
        ids = jnp.asarray(np.stack([s["text_ids"] for s in rows]))
        atts = jnp.asarray(np.stack([s["text_atts"] for s in rows]))
        coords = np.asarray(predict(variables, image, ids, atts))
        for j, s in enumerate(samples):
            results.append({"ref_id": int(s["ref_id"]),
                            "pred": coords[j].tolist()})
    return results
