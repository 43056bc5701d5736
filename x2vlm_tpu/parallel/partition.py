"""Parameter/optimizer-state sharding rules over the (data, fsdp) mesh.

The reference replicates parameters per-GPU (Apex DDP). Here replication is
the default too, but every parameter with a dimension divisible by the fsdp
axis can be ZeRO-sharded (params + Adam moments) by the same rule — one knob
(`fsdp=` mesh size) scales the 593M-param large model onto small-HBM chips.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x2vlm_tpu.core.mesh import FSDP_AXIS

__all__ = ["fsdp_param_shardings", "state_shardings", "replicate_tree"]


def _leaf_spec(leaf, fsdp_size: int, min_size: int) -> P:
    shape = np.shape(leaf)
    if fsdp_size <= 1 or np.prod(shape, dtype=np.int64) < min_size:
        return P()
    # shard the largest divisible dim
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
            spec = [None] * len(shape)
            spec[i] = FSDP_AXIS
            return P(*spec)
    return P()


def fsdp_param_shardings(params, mesh: Mesh, min_size: int = 2 ** 16):
    """NamedSharding tree for params: large tensors sharded over fsdp, small
    ones (biases, norms, tables below min_size) replicated."""
    fsdp_size = mesh.shape[FSDP_AXIS]

    def to_sharding(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, fsdp_size, min_size))

    return jax.tree_util.tree_map(to_sharding, params)


def replicate_tree(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: rep, tree)


def state_shardings(state, mesh: Mesh, min_size: int = 2 ** 16):
    """Sharding tree for a TrainState: params and any optimizer-state leaf
    whose shape matches a param (Adam mu/nu) follow the fsdp rule; scalars and
    schedules replicate."""
    fsdp_size = mesh.shape[FSDP_AXIS]

    def to_sharding(leaf):
        if hasattr(leaf, "shape") and leaf is not None:
            return NamedSharding(mesh, _leaf_spec(leaf, fsdp_size, min_size))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(to_sharding, state)
