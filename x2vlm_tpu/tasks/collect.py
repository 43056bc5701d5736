"""Multi-host eval-result collection (reference dataset/utils.py:181-267:
rank-sharded JSON files + barrier + rank-0 merge with key dedup).

Two implementations:
- ``collect_results_fs``: shared-filesystem merge, byte-compatible with the
  reference's protocol (per-host JSON shard files, host 0 merges + dedups)
- ``collect_results``: in-memory merge over ``multihost_utils.process_allgather``
  when all hosts run in one JAX process group (no filesystem needed)
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

__all__ = ["collect_results_fs", "collect_results", "dedup_by_key"]


def dedup_by_key(results: List[Dict], key: Optional[str]) -> List[Dict]:
    if not key:
        return results
    seen = set()
    out = []
    for r in results:
        k = r[key]
        if k not in seen:
            seen.add(k)
            out.append(r)
    return out


def collect_results_fs(results: List[Dict], result_dir: str, filename: str,
                       host_id: int, num_hosts: int,
                       dedup_key: Optional[str] = None,
                       timeout_s: float = 600.0) -> Optional[List[Dict]]:
    """Write this host's shard; host 0 waits for all shards and merges.
    Returns the merged list on host 0, None elsewhere."""
    os.makedirs(result_dir, exist_ok=True)
    shard = os.path.join(result_dir, f"{filename}_rank{host_id}.json")
    tmp = shard + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f)
    os.replace(tmp, shard)  # atomic publish

    if host_id != 0:
        return None
    merged: List[Dict] = []
    deadline = time.time() + timeout_s
    for h in range(num_hosts):
        path = os.path.join(result_dir, f"{filename}_rank{h}.json")
        while not os.path.exists(path):
            if time.time() > deadline:
                raise TimeoutError(f"missing shard {path}")
            time.sleep(0.5)
        with open(path) as f:
            merged.extend(json.load(f))
    merged = dedup_by_key(merged, dedup_key)
    final = os.path.join(result_dir, f"{filename}.json")
    with open(final, "w") as f:
        json.dump(merged, f)
    return merged


def collect_results(results: List[Dict], dedup_key: Optional[str] = None
                    ) -> List[Dict]:
    """All-gather host-local result lists across JAX processes (single-host:
    identity). Every host returns the full merged list."""
    import jax

    if jax.process_count() == 1:
        return dedup_by_key(results, dedup_key)
    from jax.experimental import multihost_utils
    import numpy as np

    payload = json.dumps(results).encode()
    n = np.int32(len(payload))
    max_n = int(multihost_utils.process_allgather(n).max())
    buf = np.zeros(max_n, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    sizes = multihost_utils.process_allgather(n)
    blobs = multihost_utils.process_allgather(buf)
    merged: List[Dict] = []
    for size, blob in zip(np.asarray(sizes).ravel(), np.asarray(blobs)):
        merged.extend(json.loads(bytes(blob[: int(size)]).decode()))
    return dedup_by_key(merged, dedup_key)
