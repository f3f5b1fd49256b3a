#!/usr/bin/env python3
"""Correctness + timing harness: the Pallas sequences kernel vs the
lax.scan dense kernel, on real bench-corpus sequence lanes — updated
to the bit-packed single-array contract (r4: packed triple words ‖ ok).

Timing caveat (measured r4): the axon relay memoizes repeat
executions with content-identical input buffers, so warm per-call
timings in one process can read near zero.  Treat the timings here as
lower bounds; the end-to-end bench (bench.py) is ground truth.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import build_corpus  # noqa: E402
from zstd_tpu.format.block_table import build_batch_plan  # noqa: E402
from zstd_tpu.runtime.engine import DeviceEngine, _next_pow2  # noqa: E402
from zstd_tpu.testing import libzstd  # noqa: E402


def main(mb: float = 8.0) -> None:
    from zstd_tpu.kernels.entropy2 import (
        SEQ_SLOTS_PER_STEP,
        decode_sequences_dense,
    )
    from zstd_tpu.kernels.pallas_seq import LANES, decode_sequences_dense_pl

    raw = build_corpus(mb)
    chunk = 4 << 20
    comp = b"".join(
        libzstd.compress(raw[i : i + chunk], 3, checksum=True)
        for i in range(0, len(raw), chunk)
    )
    plan = build_batch_plan(comp)
    n = plan.n_seq_lanes
    order = np.argsort(-plan.seq_nseq)
    sel = order[: min(n, LANES)]
    if len(sel) < LANES:
        sel = np.concatenate([sel, np.zeros(LANES - len(sel), dtype=sel.dtype)])
    n_real = min(n, LANES)

    eng = DeviceEngine()
    nseq = np.where(np.arange(LANES) < n_real, plan.seq_nseq[sel], 0).astype(
        np.int32
    )
    steps = _next_pow2(int(-(-nseq.max() // SEQ_SLOTS_PER_STEP)), lo=2)
    w_ll, w_ml, w_of, cumw, n_dense_w = eng._seq_pack_meta(plan, sel, nseq)
    W = _next_pow2(int((plan.seq_p0[sel] >> 5).max()) + 1, lo=64)
    R_ll = _next_pow2(1 << int(plan.seq_ll_al[sel].max()), lo=8)
    R_of = _next_pow2(1 << int(plan.seq_of_al[sel].max()), lo=8)
    R_ml = _next_pow2(1 << int(plan.seq_ml_al[sel].max()), lo=8)
    print(
        f"lanes={n_real} steps={steps} W={W} R=({R_ll},{R_of},{R_ml}) "
        f"n_dense_w={n_dense_w} total_seqs={int(nseq.sum())}"
    )

    j = jnp.asarray
    lane_mat = eng._seq_lane_mat(plan, sel, nseq, w_ll, w_ml, w_of)
    args = (
        j(plan.words), j(lane_mat), j(cumw),
        j(plan.fse_flat0), j(plan.fse_flat1), j(plan.fse_off),
    )
    kw = dict(max_steps=steps, n_dense_w=n_dense_w)

    def run_scan():
        return decode_sequences_dense(*args, **kw)

    def run_pl():
        return decode_sequences_dense_pl(
            *args, **kw, W=W, R_ll=R_ll, R_of=R_of, R_ml=R_ml
        )

    t0 = time.perf_counter()
    out_s = np.asarray(jax.block_until_ready(run_scan()))
    t_scan_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_p = np.asarray(jax.block_until_ready(run_pl()))
    t_pl_compile = time.perf_counter() - t0
    print(f"compile: scan {t_scan_compile:.1f}s pallas {t_pl_compile:.1f}s")

    ok_s = out_s[n_dense_w:].astype(bool)
    ok_p = out_p[n_dense_w:].astype(bool)
    print(
        "ok lanes: scan", int(ok_s[:n_real].sum()),
        "pallas", int(ok_p[:n_real].sum()), "/", n_real,
    )
    ns_w = int(cumw[n_real])
    same = np.array_equal(out_s[:ns_w], out_p[:ns_w])
    print(
        "bit-exact packed:", same,
        "ok match", bool((ok_s[:n_real] == ok_p[:n_real]).all()),
    )
    if not same:
        bad = np.flatnonzero(out_s[:ns_w] != out_p[:ns_w])
        print("first packed-word mismatches at", bad[:10])
        lane_of = np.searchsorted(cumw, bad[:10], side="right") - 1
        print("lanes:", lane_of)
        sys.exit(1)

    def timeit(fn, iters=10):
        fn()
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    t_s = timeit(run_scan)
    t_p = timeit(run_pl)
    print(f"scan:   {t_s*1e3:.2f} ms  ({t_s/steps*1e6:.1f} us/step)")
    print(
        f"pallas: {t_p*1e3:.2f} ms  ({t_p/steps*1e6:.1f} us/step)  "
        f"speedup {t_s/t_p:.2f}x"
    )


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 8.0)
