"""File-sharded streaming line reader for pretraining.

Reference: dataset/dist_dataset.py:19-104 (DistLineReadingDataset): contiguous
file-shard split by (rank, worker), file-order shuffle, infinite repeat,
line-by-line yield. Improvements over the reference (SURVEY §7.3 #6):

- deterministic epoch-seeded shuffling (same shards regardless of restart)
- a checkpointable cursor: ``state()`` → {epoch, file_idx, line_idx} and
  ``DistLineReader(..., start_state=...)`` resumes mid-epoch, which the
  reference cannot do (its data position is lost on restart)
"""

from __future__ import annotations

import glob
import json
import os
import random
from typing import Dict, Iterator, List, Optional, Sequence

from x2vlm_tpu.core.io import hopen

__all__ = ["list_data_files", "split_shard", "DistLineReader"]


def list_data_files(paths: Sequence[str]) -> List[str]:
    """Expand directories / globs into files; drop _SUCCESS markers.
    ``hdfs://`` / ``gs://`` paths list through the core/io CLI pipes
    (reference dist_dataset.py:30-44 + utils/hdfs_io.hlist_files:55-82)."""
    from x2vlm_tpu.core.io import hlist_files

    out: List[str] = []
    for p in paths:
        if p.startswith(("hdfs://", "gs://")):
            listed = sorted(
                f for f in hlist_files([p])
                if not os.path.basename(f).startswith(("_", ".")))
            if not listed:
                raise FileNotFoundError(p)
            out.extend(listed)
        elif os.path.isdir(p):
            out.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if not f.startswith("_") and not f.startswith(".")))
        elif any(c in p for c in "*?["):
            out.extend(sorted(glob.glob(p)))
        elif os.path.exists(p):
            out.append(p)
        else:
            raise FileNotFoundError(p)
    return out


def split_shard(items: Sequence, shard_id: int, num_shards: int) -> List:
    """Contiguous split (reference dist_dataset.py:98-104). Tolerates
    len(items) % num_shards != 0 (trailing shards get one fewer)."""
    n = len(items)
    if num_shards <= 1:
        return list(items)
    per = n / num_shards
    lo = round(per * shard_id)
    hi = round(per * (shard_id + 1))
    return list(items[lo:hi])


class DistLineReader:
    """Iterates (data_bytes) over this host's shard of the file list.

    shard = rank within (world_size * num_workers) grid, matching the
    reference's two-level split (dist_dataset.py:55-95).
    """

    def __init__(
        self,
        paths: Sequence[str],
        rank: int = 0,
        world_size: int = 1,
        worker: int = 0,
        num_workers: int = 1,
        shuffle: bool = True,
        repeat: bool = True,
        seed: int = 0,
        start_state: Optional[Dict] = None,
    ):
        self.files = list_data_files(paths)
        if not self.files:
            raise ValueError(f"no data files in {paths}")
        self.rank = rank
        self.world_size = world_size
        self.worker = worker
        self.num_workers = num_workers
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self._state = dict(start_state or {"epoch": 0, "file_idx": 0, "line_idx": 0})

    def state(self) -> Dict:
        return dict(self._state)

    def _epoch_files(self, epoch: int) -> List[str]:
        files = list(self.files)
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(files)
        shard = split_shard(files, self.rank, self.world_size)
        return split_shard(shard, self.worker, self.num_workers)

    def __iter__(self) -> Iterator[str]:
        epoch = self._state["epoch"]
        file_idx = self._state["file_idx"]
        line_idx = self._state["line_idx"]
        while True:
            files = self._epoch_files(epoch)
            while file_idx < len(files):
                path = files[file_idx]
                with hopen(path, "r") as f:
                    for i, line in enumerate(f):
                        if i < line_idx:
                            continue
                        self._state = {"epoch": epoch, "file_idx": file_idx,
                                       "line_idx": i + 1}
                        line = line.strip()
                        if line:
                            yield line
                file_idx += 1
                line_idx = 0
            if not self.repeat:
                return
            epoch += 1
            file_idx = 0
            line_idx = 0
            self._state = {"epoch": epoch, "file_idx": 0, "line_idx": 0}

    def iter_json(self) -> Iterator[dict]:
        for line in self:
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                # broken-sample skip (reference pretrain_dataset.py:236-240)
                continue
