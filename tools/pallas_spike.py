#!/usr/bin/env python3
"""Pallas-vs-lax.scan literals-kernel measurement (VERDICT r2 ask #4).

Builds a real 128-lane literals batch from the bench corpus, checks the
Pallas kernel decodes bit-identically to decode_literals_v2, then times
both in this (clean) process and prints one JSON line with per-step and
per-symbol costs.  Run on the TPU:  python tools/pallas_spike.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_corpus
    from zstd_tpu.format.block_table import build_batch_plan
    from zstd_tpu.kernels.entropy2 import LIT_SYMS_PER_STEP, decode_literals_v2
    from zstd_tpu.kernels.pallas_lit import (
        LANES,
        decode_literals_pallas,
        lane_windows,
    )
    from zstd_tpu.runtime.jaxcache import enable_compilation_cache
    from zstd_tpu.testing import libzstd

    enable_compilation_cache()

    raw = build_corpus(float(sys.argv[1]) if len(sys.argv) > 1 else 6.0)
    comp = libzstd.compress(raw, 3, checksum=True)
    plan = build_batch_plan(comp)
    order = np.argsort(-plan.lit_regen)
    sel = order[:LANES]
    n_real = len(sel)
    if n_real < LANES:
        sel = np.concatenate([sel, np.zeros(LANES - n_real, dtype=sel.dtype)])

    regen = plan.lit_regen[sel].astype(np.int32)
    p0 = plan.lit_p0[sel].astype(np.int32)
    pend = plan.lit_pend[sel].astype(np.int32)
    base = plan.lit_base[sel].astype(np.int32)
    slots = plan.lit_slot[sel]
    max_steps = int(-(-regen.max() // LIT_SYMS_PER_STEP))

    win = lane_windows(plan.words, base, p0)
    pad16 = lambda a, c=0: np.pad(  # noqa: E731  (12 -> 16 sublane rows)
        a, ((0, 0), (0, 4)), constant_values=c
    )
    pl_args = (
        jnp.asarray(win),
        jnp.asarray(p0[None, :]),
        jnp.asarray(pend[None, :]),
        jnp.asarray(regen[None, :]),
        # limits pads with a sentinel ABOVE any 11-bit window so the pad
        # rows never count toward the class index.
        jnp.asarray(pad16(plan.huff_limits[slots], 1 << 30).T.copy()),
        jnp.asarray(pad16(plan.huff_prevs[slots]).T.copy()),
        jnp.asarray(pad16(plan.huff_lengths[slots]).T.copy()),
        jnp.asarray(pad16(plan.huff_rankb[slots]).T.copy()),
        jnp.asarray(plan.huff_ranked[slots].T.copy()),
    )
    v2_args = (
        jnp.asarray(plan.words),
        jnp.asarray(base),
        jnp.asarray(p0),
        jnp.asarray(pend),
        jnp.asarray(regen),
        jnp.asarray(plan.huff_limits[slots]),
        jnp.asarray(plan.huff_prevs[slots]),
        jnp.asarray(plan.huff_lengths[slots]),
        jnp.asarray(plan.huff_rankb[slots]),
        jnp.asarray(plan.huff_ranked[slots]),
    )

    # Compile + correctness.
    t0 = time.perf_counter()
    ys_p, ok_p = decode_literals_pallas(*pl_args, max_steps=max_steps)
    jax.block_until_ready(ys_p)
    pallas_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ys_v, ok_v = decode_literals_v2(*v2_args, max_steps=max_steps)
    jax.block_until_ready(ys_v)
    v2_compile_s = time.perf_counter() - t0

    ys_p_h = np.asarray(ys_p).reshape(max_steps, 8, LANES)
    ys_v_h = np.asarray(ys_v)
    mism = 0
    for j in range(n_real):
        nb = int(regen[j])
        a = np.ascontiguousarray(ys_p_h[:, :, j]).reshape(-1).view(np.uint8)[:nb]
        b = np.ascontiguousarray(ys_v_h[:, :, j]).reshape(-1).view(np.uint8)[:nb]
        mism += int((a != b).sum())
    assert np.asarray(ok_p)[0, :n_real].all(), "pallas ok flags tripped"
    assert np.asarray(ok_v)[:n_real].all(), "v2 ok flags tripped"

    def timeit(fn, *args, iters=10, **kw):
        fn(*args, **kw)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args, **kw)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    t_p = timeit(decode_literals_pallas, *pl_args, max_steps=max_steps)
    t_v = timeit(decode_literals_v2, *v2_args, max_steps=max_steps)

    syms = max_steps * LIT_SYMS_PER_STEP * LANES
    print(
        json.dumps(
            {
                "device": str(jax.devices()[0]),
                "lanes": n_real,
                "W_words": int(win.shape[0]),
                "max_steps": max_steps,
                "symbols_mismatched": mism,
                "pallas": {
                    "wall_s": round(t_p, 5),
                    "us_per_step": round(t_p / max_steps * 1e6, 3),
                    "ns_per_symbol": round(t_p / syms * 1e9, 3),
                    "compile_s": round(pallas_compile_s, 1),
                },
                "lax_scan_v2": {
                    "wall_s": round(t_v, 5),
                    "us_per_step": round(t_v / max_steps * 1e6, 3),
                    "ns_per_symbol": round(t_v / syms * 1e9, 3),
                    "compile_s": round(v2_compile_s, 1),
                },
                "pallas_vs_scan": round(t_p / t_v, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
