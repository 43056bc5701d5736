"""Shared classification evaluation: accuracy over a map-style dataset
(reference NLVR.py:73-96, VQA_msrvtt.py / XVNLI.py / MARVL.py eval loops)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["evaluate_classification"]


def evaluate_classification(model, variables, dataset, *, batch_size: int = 32,
                            input_keys=("image", "text_ids", "text_atts"),
                            label_key: str = "labels",
                            host_id: int = 0, num_hosts: int = 1
                            ) -> Dict[str, float]:
    """Accuracy of argmax(predict) vs labels. `input_keys` selects what the
    model's predict method consumes (NLVR passes image0/image1)."""

    @jax.jit
    def predict(v, batch):
        return model.apply(v, batch, method=model.predict)

    n = len(dataset)
    step = n // num_hosts + 1
    indices = list(range(host_id * step, min(n, (host_id + 1) * step)))
    correct, total = 0, 0
    for lo in range(0, len(indices), batch_size):
        chunk = indices[lo: lo + batch_size]
        samples = [dataset[i] for i in chunk]
        rows = samples + [samples[-1]] * (batch_size - len(samples))
        batch = {k: jnp.asarray(np.stack([s[k] for s in rows]))
                 for k in rows[0] if k != label_key}
        logits = np.asarray(predict(variables, batch))
        preds = logits.argmax(-1)
        for j, s in enumerate(samples):
            total += 1
            correct += int(preds[j] == int(s[label_key]))
    return {"accuracy": 100.0 * correct / max(total, 1), "n": total}
