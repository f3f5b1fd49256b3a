"""Sharded (multi-chip / multi-host) batched decode.

The domain's "DP" (SURVEY.md §2.3): independent entropy-stream lanes are
sharded across the mesh with ``shard_map``; the flat words buffer and
the entropy tables are replicated (KB-scale).  Outputs come back
lane-sharded and are gathered in original block order on the host — the
ordered-gather requirement of BASELINE.json config #5.

Multi-host layout: each process runs the same program; the lane table is
scattered by byte-size-balanced bins (``shard_lanes_balanced``) so hosts
decode near-equal work, and per-frame outputs are reassembled in frame
order from the addressable shards.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .mesh import LANE_AXIS, pad_to_multiple


def shard_lanes_balanced(costs: np.ndarray, n_shards: int) -> list[np.ndarray]:
    """Greedy balanced binning of lanes by cost (e.g. symbol count).

    Returns per-shard lane-index arrays; the multi-host scheduler
    (SURVEY.md §2.3 "multi-host scheduler") assigns shard i to process i.
    """
    order = np.argsort(-np.asarray(costs))
    bins: list[list[int]] = [[] for _ in range(n_shards)]
    loads = np.zeros(n_shards)
    for lane in order:
        i = int(np.argmin(loads))
        bins[i].append(int(lane))
        loads[i] += costs[lane]
    return [np.asarray(sorted(b), dtype=np.int64) for b in bins]


def _pad_lanes(arrays: dict[str, np.ndarray], multiple: int, fill: dict) -> dict:
    n = len(next(iter(arrays.values())))
    target = pad_to_multiple(max(n, multiple), multiple)
    out = {}
    for k, a in arrays.items():
        pad = target - n
        out[k] = np.concatenate([a, np.full(pad, fill.get(k, 0), dtype=a.dtype)])
    return out


def sharded_decode_literals(mesh, words, luts, lanes: dict, *, max_steps: int):
    """Lane-sharded literals decode over ``mesh``.

    ``lanes`` holds per-lane arrays (base, p0, regen, slot); they are
    padded to a multiple of the mesh size, sharded over LANE_AXIS, and
    decoded with the single-chip kernel inside ``shard_map`` — XLA
    partitions the batch; no collectives are needed until the gather.

    Returns (symbols uint8[max_steps, padded_lanes], ok[padded_lanes])
    as host numpy, in lane order.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..kernels.entropy import decode_literals_batch

    n_dev = mesh.devices.size
    padded = _pad_lanes(lanes, n_dev, fill={})
    lane_sharding = NamedSharding(mesh, P(LANE_AXIS))
    repl = NamedSharding(mesh, P())

    words_d = jax.device_put(jnp.asarray(words), repl)
    luts_d = jax.device_put(jnp.asarray(luts), repl)
    args = {
        k: jax.device_put(jnp.asarray(v), lane_sharding) for k, v in padded.items()
    }

    @partial(jax.jit, out_shardings=(NamedSharding(mesh, P(None, LANE_AXIS)), lane_sharding))
    def run(words, base, p0, regen, slot, luts):
        return decode_literals_batch(
            words, base, p0, regen, slot, luts, max_steps=max_steps
        )

    syms, ok = run(words_d, args["base"], args["p0"], args["regen"], args["slot"], luts_d)
    return np.asarray(syms), np.asarray(ok)


def sharded_decode_sequences(mesh, words, tables, lanes: dict, *, max_steps: int):
    """Lane-sharded sequence decode over ``mesh`` (see sharded_decode_literals)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..kernels.entropy import decode_sequences_batch

    n_dev = mesh.devices.size
    padded = _pad_lanes(lanes, n_dev, fill={"nseq": 1})
    lane_sharding = NamedSharding(mesh, P(LANE_AXIS))
    repl = NamedSharding(mesh, P())

    words_d = jax.device_put(jnp.asarray(words), repl)
    tables_d = jax.device_put(jnp.asarray(tables), repl)
    args = {
        k: jax.device_put(jnp.asarray(v), lane_sharding) for k, v in padded.items()
    }

    out_spec = NamedSharding(mesh, P(None, LANE_AXIS))

    @partial(
        jax.jit,
        out_shardings=(out_spec, out_spec, out_spec, lane_sharding),
    )
    def run(words, base, p0, nseq, ll_s, of_s, ml_s, ll_al, of_al, ml_al, tables):
        return decode_sequences_batch(
            words, base, p0, nseq, ll_s, of_s, ml_s, ll_al, of_al, ml_al,
            tables, max_steps=max_steps,
        )

    ll, ofv, ml, ok = run(
        words_d,
        args["base"],
        args["p0"],
        args["nseq"],
        args["ll_slot"],
        args["of_slot"],
        args["ml_slot"],
        args["ll_al"],
        args["of_al"],
        args["ml_al"],
        tables_d,
    )
    return np.asarray(ll), np.asarray(ofv), np.asarray(ml), np.asarray(ok)


def sharded_decompress(data: bytes, mesh=None, *, max_window_size=None) -> bytes:
    """Full multi-device decode: prepass → sharded kernels → ordered
    host assembly.  The output is byte-identical to the host oracle."""
    from ..format.block_table import build_batch_plan
    from ..format.frame import MAX_WINDOW_SIZE
    from ..runtime.engine import DeviceEngine
    from .mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    engine = _ShardedEngine(mesh, max_window_size=max_window_size or MAX_WINDOW_SIZE)
    return engine.decompress(data)


class _ShardedEngine:
    """DeviceEngine variant whose kernel dispatch runs mesh-sharded."""

    def __init__(self, mesh, *, max_window_size):
        from ..runtime.engine import DeviceEngine

        self.mesh = mesh
        self._inner = DeviceEngine(max_window_size=max_window_size)
        # Monkey-free composition: reuse assembly, override kernel runs.
        self._inner._run_literals = self._run_literals
        self._inner._run_sequences = self._run_sequences
        self._plan = None

    def decompress(self, data, **kw) -> bytes:
        return self._inner.decompress_with_stats(data, **kw)

    def _run_literals(self, plan):
        from ..runtime.engine import _bucket_lanes

        outs = [None] * plan.n_lit_lanes
        ok = np.ones(plan.n_lit_lanes, dtype=bool)
        for idx, steps in _bucket_lanes(plan.lit_regen):
            lanes = {
                "base": plan.lit_base[idx],
                "p0": plan.lit_p0[idx],
                "regen": plan.lit_regen[idx],
                "slot": plan.lit_slot[idx],
            }
            syms, lane_ok = sharded_decode_literals(
                self.mesh, plan.words, plan.huff_luts, lanes, max_steps=steps
            )
            self._inner.stats.kernel_calls += 1
            for j, lane in enumerate(idx):
                outs[lane] = syms[: plan.lit_regen[lane], j]
                ok[lane] = lane_ok[j]
        return outs, ok

    def _run_sequences(self, plan):
        from ..runtime.engine import _bucket_lanes

        outs = [None] * plan.n_seq_lanes
        ok = np.ones(plan.n_seq_lanes, dtype=bool)
        for idx, steps in _bucket_lanes(plan.seq_nseq):
            lanes = {
                "base": plan.seq_base[idx],
                "p0": plan.seq_p0[idx],
                "nseq": plan.seq_nseq[idx],
                "ll_slot": plan.seq_ll_slot[idx],
                "of_slot": plan.seq_of_slot[idx],
                "ml_slot": plan.seq_ml_slot[idx],
                "ll_al": plan.seq_ll_al[idx],
                "of_al": plan.seq_of_al[idx],
                "ml_al": plan.seq_ml_al[idx],
            }
            ll, ofv, ml, lane_ok = sharded_decode_sequences(
                self.mesh, plan.words, plan.fse_tables, lanes, max_steps=steps
            )
            self._inner.stats.kernel_calls += 1
            for j, lane in enumerate(idx):
                ns = plan.seq_nseq[lane]
                outs[lane] = (ll[:ns, j], ofv[:ns, j], ml[:ns, j])
                ok[lane] = lane_ok[j]
        return outs, ok
