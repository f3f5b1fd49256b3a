"""Work-conserving lane scheduling for the queue kernels.

Streams are grouped by entropy table (literals: the block's Huffman
slot; sequences: the (LL, OF, ML) slot triple — repeat-mode chains
share triples), lanes are allocated to groups proportionally to work,
and each group's streams are greedy-balanced over its lanes.  The
result: one kernel call decodes everything at near-full occupancy,
with step counts ≈ max(longest single stream, total work / lanes) —
the intrinsic serial axis (SURVEY.md §5 long-context analog) is the
only remaining floor.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _next_pow2(n: int, lo: int = 1) -> int:
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


def seq_queue_steps(nseq: np.ndarray) -> np.ndarray:
    """Exact step need of a sequence stream inside a lane queue.

    The kernels never stall (entropy2.SEQ_BUF_WORDS invariant), so a
    stream consumes one init slot plus ``nseq`` sequence slots; queue
    switches land on step boundaries, costing up to one extra step.
    Pinned by the burst-heavy streams in tests/test_engine.py.
    """
    from ..kernels.entropy2 import SEQ_SLOTS_PER_STEP

    return -(-(nseq + 1) // SEQ_SLOTS_PER_STEP) + 1


@dataclass
class QueuePlan:
    """Per-lane stream queues plus the stream → (lane, position) map."""

    q_base: np.ndarray  # (L, Q) int32
    q_p0: np.ndarray
    q_pend: np.ndarray  # end bit position per stream
    q_count: np.ndarray  # regen or nseq
    qlen: np.ndarray  # (L,) int32
    lane_rep: np.ndarray  # (L,) int32 — a representative stream id per lane
    placement: dict[int, tuple[int, int]]  # stream id -> (lane, qpos)
    max_steps: int


def pack_queues(
    group_ids: np.ndarray,
    counts: np.ndarray,
    work: np.ndarray,
    slack: np.ndarray,
    per_step: int,
    target_lanes: int,
) -> QueuePlan | None:
    """Assign streams to lane queues.

    ``group_ids``: table-group of each stream (lanes never mix groups);
    ``counts``: symbols/sequences per stream; ``work``: step cost per
    stream; ``slack``: extra steps needed beyond work (seq stalls).
    Returns None when there are no streams.
    """
    n = len(group_ids)
    streams = np.flatnonzero(counts >= 0)
    if n == 0:
        return None

    groups: dict[int, list[int]] = {}
    for s in streams:
        groups.setdefault(int(group_ids[s]), []).append(int(s))
    g_work = {g: int(sum(work[s] + slack[s] for s in ss)) for g, ss in groups.items()}
    total_work = max(1, sum(g_work.values()))

    L = _next_pow2(max(len(groups), min(target_lanes, n)))
    # Lanes per group: proportional, at least 1.
    alloc = {g: max(1, round(L * w / total_work)) for g, w in g_work.items()}
    while sum(alloc.values()) > L:
        g = max(alloc, key=lambda g: alloc[g])
        if alloc[g] == 1:
            break
        alloc[g] -= 1
    lanes: list[list[int]] = []  # lane -> stream ids
    lane_rep: list[int] = []
    for g, ss in groups.items():
        k = min(alloc[g], len(ss))
        bins: list[list[int]] = [[] for _ in range(k)]
        loads = np.zeros(k)
        for s in sorted(ss, key=lambda s: -(work[s] + slack[s])):
            i = int(np.argmin(loads))
            bins[i].append(s)
            loads[i] += work[s] + slack[s]
        for b in bins:
            lanes.append(b)
            lane_rep.append(b[0])
    first_rep = lane_rep[0] if lane_rep else 0
    L = _next_pow2(len(lanes))
    while len(lanes) < L:
        lanes.append([])
        lane_rep.append(first_rep)

    # Pow2-pad the queue depth so jit shapes stay cache-friendly.
    Q = _next_pow2(max(1, max(len(b) for b in lanes)))
    q_base = np.zeros((L, Q), dtype=np.int32)
    q_p0 = np.zeros((L, Q), dtype=np.int32)
    q_pend = np.zeros((L, Q), dtype=np.int32)
    q_count = np.zeros((L, Q), dtype=np.int32)
    qlen = np.zeros(L, dtype=np.int32)
    placement: dict[int, tuple[int, int]] = {}
    max_steps = 1
    for lane, ss in enumerate(lanes):
        qlen[lane] = len(ss)
        steps = 0
        for k, s in enumerate(ss):
            placement[s] = (lane, k)
            q_count[lane, k] = counts[s]
            steps += int(work[s] + slack[s])
        max_steps = max(max_steps, steps)
    return QueuePlan(
        q_base=q_base,
        q_p0=q_p0,
        q_pend=q_pend,
        q_count=q_count,
        qlen=qlen,
        lane_rep=np.asarray(lane_rep, dtype=np.int32),
        placement=placement,
        max_steps=max_steps,
    )


def pack_literal_queues(plan, target_lanes: int = 512) -> QueuePlan | None:
    """Queue plan for literal streams (grouped by Huffman slot)."""
    from ..kernels.entropy2 import LIT_SYMS_PER_STEP

    n = plan.n_lit_lanes
    if n == 0:
        return None
    work = -(-plan.lit_regen // LIT_SYMS_PER_STEP)
    work = np.maximum(work, 1)
    qp = pack_queues(
        plan.lit_slot,
        plan.lit_regen,
        work,
        np.zeros(n, dtype=np.int64),
        LIT_SYMS_PER_STEP,
        target_lanes,
    )
    if qp is None:
        return None
    for s, (lane, k) in qp.placement.items():
        qp.q_base[lane, k] = plan.lit_base[s]
        qp.q_p0[lane, k] = plan.lit_p0[s]
        qp.q_pend[lane, k] = plan.lit_pend[s]
    return qp


def pack_seq_queues(plan, target_lanes: int = 256) -> QueuePlan | None:
    """Queue plan for sequence streams (grouped by table triple)."""
    from ..kernels.entropy2 import SEQ_SLOTS_PER_STEP

    n = plan.n_seq_lanes
    if n == 0:
        return None
    triple = (
        plan.seq_ll_slot.astype(np.int64) << 40
        | plan.seq_of_slot.astype(np.int64) << 20
        | plan.seq_ml_slot.astype(np.int64)
    )
    # Re-index triples densely.
    _, group_ids = np.unique(triple, return_inverse=True)
    # Per-stream step need: init slot + one slot per sequence + switch.
    work = seq_queue_steps(plan.seq_nseq)
    qp = pack_queues(
        group_ids,
        plan.seq_nseq,
        work,
        np.zeros(n, dtype=np.int64),
        SEQ_SLOTS_PER_STEP,
        target_lanes,
    )
    if qp is None:
        return None
    for s, (lane, k) in qp.placement.items():
        qp.q_base[lane, k] = plan.seq_base[s]
        qp.q_p0[lane, k] = plan.seq_p0[s]
        qp.q_pend[lane, k] = plan.seq_pend[s]
    return qp
