#!/usr/bin/env python3
"""Per-kernel-call cost probe: times each dense kernel call of the
bench corpus individually (dispatch → block_until_ready), splitting the
engine's residual device-compute phase into per-call costs with their
shapes.  Relay memoization can make warm repeats read near zero
(BASELINE.md r4 hazard) — the first pass after a fresh plan is the
meaningful one; the second pass is printed for the warm bound.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from bench import build_corpus  # noqa: E402
from zstd_tpu.format.block_table import build_batch_plan  # noqa: E402
from zstd_tpu.runtime.engine import DeviceEngine  # noqa: E402
from zstd_tpu.testing import libzstd  # noqa: E402


def main(mb: float = 24.0) -> None:
    raw = build_corpus(mb)
    chunk = 4 << 20
    comp = b"".join(
        libzstd.compress(raw[i : i + chunk], 3, checksum=True)
        for i in range(0, len(raw), chunk)
    )

    eng = DeviceEngine()
    out = eng.decompress(comp)  # compile + warm every shape
    assert out == raw

    records = []
    orig_lit = DeviceEngine._dispatch_lit_call
    orig_seq = DeviceEngine._dispatch_seq_pallas

    def lit_timed(self, plan, idx, steps, W, use_pl, pending, lane):
        t0 = time.perf_counter()
        orig_lit(self, plan, idx, steps, W, use_pl, pending, lane)
        jax.block_until_ready(pending[-1][2])
        records.append(
            ("lit", len(idx), steps, W, time.perf_counter() - t0)
        )

    def seq_timed(self, plan, idx, pending):
        t0 = time.perf_counter()
        orig_seq(self, plan, idx, pending)
        jax.block_until_ready(pending[-1][2])
        records.append(("seq", len(idx), -1, -1, time.perf_counter() - t0))

    DeviceEngine._dispatch_lit_call = lit_timed
    DeviceEngine._dispatch_seq_pallas = seq_timed
    try:
        for pass_ in range(2):
            records.clear()
            plan = build_batch_plan(comp)
            t0 = time.perf_counter()
            eng._run_both(plan)
            total = time.perf_counter() - t0
            print(f"-- pass {pass_} (serialized calls) total {total:.3f}s")
            for kind, n, steps, W, dt in records:
                print(
                    f"  {kind}: lanes={n:4d} steps={steps:5d} W={W:6d} "
                    f"{dt*1e3:8.1f} ms"
                )
    finally:
        DeviceEngine._dispatch_lit_call = orig_lit
        DeviceEngine._dispatch_seq_pallas = orig_seq


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 24.0)
