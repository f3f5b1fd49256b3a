"""Sharded (multi-chip) batched decode.

The domain's "DP" (SURVEY.md §2.3): independent entropy-stream lanes
are sharded over a 1-D device mesh.  ``ShardedEngine`` is a thin
subclass of the single-chip ``DeviceEngine`` — it sets ``mesh`` and the
engine's own wide v2 dispatch (runtime/engine.py) places lane arrays
with a ``PartitionSpec("lanes")`` sharding, so the sharded path runs
the exact same kernels and code as the single-chip path; XLA GSPMD
partitions the batch, and no collectives are needed until the ordered
host gather.

Multi-host execution lives in parallel/multihost.py: balanced lane bins
per process (``shard_lanes_balanced``) + ordered cross-process exchange.
"""

from __future__ import annotations

import numpy as np

from ..format.frame import MAX_WINDOW_SIZE
from ..runtime.engine import DeviceEngine
from .mesh import make_mesh


def shard_lanes_balanced(costs: np.ndarray, n_shards: int) -> list[np.ndarray]:
    """Greedy balanced binning of lanes by cost (e.g. symbol count).

    Returns per-shard lane-index arrays; the multi-host scheduler
    (SURVEY.md §2.3, parallel/multihost.py) assigns shard i to process
    i so hosts decode near-equal byte volumes.
    """
    order = np.argsort(-np.asarray(costs))
    bins: list[list[int]] = [[] for _ in range(n_shards)]
    loads = np.zeros(n_shards)
    for lane in order:
        i = int(np.argmin(loads))
        bins[i].append(int(lane))
        loads[i] += costs[lane]
    return [np.asarray(sorted(b), dtype=np.int64) for b in bins]


class ShardedEngine(DeviceEngine):
    """DeviceEngine with lane arrays sharded over a device mesh.

    The mesh device count must be a power of two <= 128 so the padded
    lane counts (engine._pad_pow2) stay divisible.
    """

    def __init__(self, mesh=None, *, max_window_size: int = MAX_WINDOW_SIZE, **kw):
        if mesh is None:
            mesh = make_mesh()
        n = mesh.devices.size
        if n & (n - 1) or n > 128:
            raise ValueError(f"mesh size {n} must be a power of two <= 128")
        super().__init__(max_window_size=max_window_size, mesh=mesh, **kw)


def sharded_decompress(data: bytes, mesh=None, *, max_window_size=None) -> bytes:
    """Full multi-device decode: prepass → lane-sharded kernels →
    ordered host assembly.  Byte-identical to the host oracle."""
    engine = ShardedEngine(mesh, max_window_size=max_window_size or MAX_WINDOW_SIZE)
    return engine.decompress(data)
