#!/usr/bin/env python3
"""Mosaic LZ77 sequence-execution spike (VERDICT r4 ask #3).

The device LZ77 story so far: pointer-doubling whole-buffer gathers
(kernels/lz77_device.py) measure ~8 ns/byte/round on XLA — >= 50x the
C executor (~1.9 ns/byte measured via bench assembly) — and r4 shipped
host-C execution by default on that evidence.  r3 proved that style of
argument wrong for the entropy kernels once a real Mosaic experiment
ran, so this spike runs the real experiment for LZ77: a chunked-copy
kernel with the decoded frame in VMEM, per-copy funnel shifts (two
dynamic lane rolls + a select), and log-doubling for self-overlapping
matches (offset < length), executing real (src, dst, len) copy
programs shaped like zstd sequence streams.

Layout: the frame buffer is (R, 128) int32 with ONE BYTE per element
(flat byte i at row i >> 7, lane i & 127) — 4x the VMEM footprint of a
packed form, but the loop is op-issue-bound, not bandwidth-bound, so
the structural cost measured here is representative.  The copy program
lives in SMEM (int32 triples), so one call caps at a few thousand ops;
an in-kernel REPEAT factor re-executes the (idempotent) program to
amortize the ~26 ms relay execution latency out of the per-byte
measurement.

Reference hot loop: decoding_context.rs:78-99 (byte-at-a-time serial).
Go/no-go numbers land in BASELINE.md.
"""

from __future__ import annotations

import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128


def _kernel(nops_ref, src_ref, dst_ref, len_ref, buf_ref, out_ref, *, repeat):
    out_ref[:] = buf_ref[:]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def read_row(r):
        return out_ref[pl.ds(jnp.maximum(r, 0), 1), :]

    def funnel(a, b, p):
        """Bytes [p, p+128) of the 256-byte window a||b (per lane)."""
        sh = (LANES - p) % LANES
        ra = pltpu.roll(a, shift=sh, axis=1)
        rb = pltpu.roll(b, shift=sh, axis=1)
        return jnp.where(iota_l < LANES - p, ra, rb)

    def copy_chunk(src, dst, ln):
        """Copy ln bytes src -> dst; caller guarantees dst - src >= ln
        (no byte the chunk writes is one it reads)."""
        r0 = dst >> 7
        r1 = (dst + ln - 1) >> 7

        def row_body(r, _):
            s = (r << 7) - (dst - src)
            comb = funnel(read_row(s >> 7), read_row((s >> 7) + 1), s & 127)
            pos = (r << 7) + iota_l
            m = (pos >= dst) & (pos < dst + ln)
            out_ref[pl.ds(r, 1), :] = jnp.where(m, comb, read_row(r))
            return 0

        jax.lax.fori_loop(r0, r1 + 1, row_body, 0)

    def do_op(k, _):
        src = src_ref[k]
        dst = dst_ref[k]
        ln = len_ref[k]
        dist = dst - src
        # First chunk straight from the source (safe up to dist bytes);
        # then double from the materialized period at dst (memmove-
        # with-overlap log replication, decoding_context.rs:95-98
        # semantics).
        c0 = jnp.minimum(dist, ln)
        copy_chunk(src, dst, c0)

        def cond(copied):
            return copied < ln

        def body(copied):
            c = jnp.minimum(copied, ln - copied)
            copy_chunk(dst, dst + copied, c)
            return copied + c

        jax.lax.while_loop(cond, body, c0)
        return 0

    def once(i, _):
        jax.lax.fori_loop(0, nops_ref[0], do_op, 0)
        return 0

    jax.lax.fori_loop(0, repeat, once, 0)


@partial(jax.jit, static_argnames=("R", "repeat"))
def run_ops(nops, src, dst, lens, buf, *, R, repeat):
    return pl.pallas_call(
        partial(_kernel, repeat=repeat),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(nops, src, dst, lens, buf)


def build_program(out_kb: int = 96, seed: int = 0):
    """A realistic copy program: literals region ‖ output region, with
    (src, dst, len) op pairs from zstd-shaped sequences (ll ~ 4-40,
    ml ~ 4-60, offsets mixed incl. 20% self-overlapping)."""
    rng = np.random.default_rng(seed)
    target = out_kb << 10
    lit_bytes = rng.integers(0, 256, target, dtype=np.uint8)
    ops = []
    expect = bytearray()
    lit_pos = 0
    out_base = target  # literals live at [0, target); output follows
    while len(expect) < target - 256:
        ll = int(rng.integers(4, 40))
        ml = int(rng.integers(4, 60))
        ops.append((lit_pos, out_base + len(expect), ll))
        expect += bytes(lit_bytes[lit_pos : lit_pos + ll])
        lit_pos += ll
        if rng.random() < 0.2:
            off = int(rng.integers(1, 16))
        else:
            off = int(rng.integers(1, len(expect)))
        start = len(expect) - off
        ops.append((out_base + start, out_base + len(expect), ml))
        for k in range(ml):
            expect.append(expect[start + k])
    total = out_base + len(expect)
    R = -(-total // LANES) + 2
    buf = np.zeros(R * LANES, np.int32)
    buf[:target] = lit_bytes
    src = np.array([o[0] for o in ops], np.int32)
    dst = np.array([o[1] for o in ops], np.int32)
    lens = np.array([o[2] for o in ops], np.int32)
    return buf.reshape(R, LANES), src, dst, lens, bytes(expect), out_base, R


def main(out_kb: int = 96, repeat: int = 32) -> None:
    buf, src, dst, lens, expect, out_base, R = build_program(out_kb)
    print(
        f"program: {len(src)} ops, {len(expect)} output bytes, "
        f"R={R} rows ({R * LANES * 4 / 1e6:.1f} MB VMEM at 1 B/elt)"
    )
    nops = np.array([len(src)], np.int32)
    args = [jnp.asarray(a) for a in (nops, src, dst, lens, buf)]
    jax.block_until_ready(args)

    out = np.asarray(run_ops(*args, R=R, repeat=1))
    got = out.reshape(-1)[out_base : out_base + len(expect)].astype(np.uint8)
    ok = bytes(got) == expect
    print("bit-exact vs host:", ok)
    if not ok:
        bad = np.flatnonzero(got != np.frombuffer(expect, np.uint8))
        print("first mismatches at", bad[:10].tolist())
        sys.exit(1)

    # Slope between repeat=1 and repeat=N amortizes the ~26 ms relay
    # execution latency; fresh buffer content defeats memoization.
    def timed(rep):
        ts = []
        for i in range(3):
            b = buf.copy()
            b[-1, -1] = i + rep * 1000  # content-fresh, past the output
            a = [args[0], args[1], args[2], args[3], jnp.asarray(b)]
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            r = run_ops(*a, R=R, repeat=rep)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"repeat={rep:3d}: {t * 1e3:8.1f} ms")
        return t

    t1 = timed(1)
    tR = timed(repeat)
    per_pass = (tR - t1) / (repeat - 1)
    nsb = per_pass / len(expect) * 1e9
    print(
        f"marginal per program pass: {per_pass * 1e3:.2f} ms -> "
        f"{nsb:.2f} ns/byte ({len(expect) / per_pass / 1e9:.3f} GB/s)  "
        f"[bars: C executor ~1.9 ns/B, XLA pointer-doubling ~8 ns/B/round]"
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 96,
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
    )
