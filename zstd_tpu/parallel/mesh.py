"""Device mesh construction for sharded decode.

The codec's parallel axis is *lanes* — independent entropy streams
(4 literal streams × N blocks × M frames, SURVEY.md §2.3).  A 1-D mesh
over all addressable devices data-parallelizes lanes; the words buffer
and the tiny entropy tables are replicated (they are KBs).

Multi-host: under ``jax.distributed`` the same mesh spans processes;
each host feeds its shard of the lane table and the ordered gather
reassembles frame outputs (zstd_tpu/parallel/dist.py).
"""

from __future__ import annotations

import numpy as np

LANE_AXIS = "lanes"


def make_mesh(n_devices: int | None = None):
    """1-D mesh over the first ``n_devices`` addressable devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (LANE_AXIS,))


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
