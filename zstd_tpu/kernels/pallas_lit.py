"""Pallas spike: batched Huffman-literals decode as a Mosaic kernel.

The VERDICT-r2 ask: run one REAL Pallas experiment on the literals hot
loop (reference ``huffman.rs:205-218``; lax.scan form
``entropy2.py:_literals_scan``) with VMEM-resident tables and measure
per-step / per-symbol cost against the lax.scan kernel, instead of
arguing from XLA-lowering measurements alone.

Design notes (see kernels/__init__.py for the standing analysis):

* Mosaic exposes NO per-lane vector gather from VMEM — loads are
  tile-shaped and dynamic slices take scalar indices.  The scan
  kernel's one data-dependent access, the per-lane word refill
  ``words[base + wi]`` (wi differs per lane), therefore becomes a
  ONE-HOT SELECT over the lane's whole word window: a (W, L) compare +
  where + sum per refill.  That is the cost this spike quantifies.
* Everything else (bit-buffer shifts, the 12-boundary class find, the
  256-row ranked select) is the same VPU work as the jnp kernel, here
  in lane-last (sublane, lane) layout.
* Layout: one grid program per 128-lane block; all operands VMEM
  resident; per-lane stream words pre-sliced host-side into a
  (W, 128) window (lane-last) so the kernel needs no HBM addressing.

Measured result and the go/no-go call live in BASELINE.md ("Pallas
spike" section); tools/pallas_spike.py is the runner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
LIT_SYMS_PER_STEP = 32
LANES = 128  # lanes per grid program (VPU lane width)

_Z = np.uint32(0)


def _shl(v, n):
    # n & 31, not jnp.minimum: Mosaic cannot legalize arith.minui, and
    # the where() already zeroes every n >= 32 case.
    n = n.astype(U32)
    return jnp.where(n >= 32, _Z, v << (n & U32(31)))


def _shr(v, n):
    n = n.astype(U32)
    return jnp.where(n >= 32, _Z, v >> (n & U32(31)))


def _place(v, sh):
    pos = jnp.maximum(sh, 0)
    neg = jnp.maximum(-sh, 0)
    return jnp.where(sh >= 0, _shl(v, pos), _shr(v, neg))


def _kernel(
    words_ref,  # uint32[W, 128]  per-lane stream windows, lane-last
    p0_ref,  # int32[1, 128]
    pend_ref,  # int32[1, 128]  end bit position (byte misalignment)
    regen_ref,  # int32[1, 128]
    limits_ref,  # int32[16, 128] (12 classes, padded to 16 sublanes)
    prevs_ref,
    lengths_ref,
    rankb_ref,
    ranked_ref,  # int32[256, 128]
    out_ref,  # uint32[max_steps * 8, 128]
    ok_ref,  # int32[1, 128]
    *,
    max_steps: int,
    W: int,
):
    p0 = p0_ref[:]
    pend = pend_ref[:]
    regen = regen_ref[:]
    limits = limits_ref[:]
    prevs = prevs_ref[:]
    lengths = lengths_ref[:]
    rankb = rankb_ref[:]
    ranked = ranked_ref[:]
    words = words_ref[:]

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    iota12 = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0)
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, LANES), 0)

    def fetch(wi):
        """words[wi[l], l] per lane — one-hot select (no Mosaic gather)."""
        hit = iota_w == jnp.broadcast_to(wi, (1, LANES))
        return jnp.sum(
            jnp.where(hit, words, _Z).astype(jnp.int32), axis=0, keepdims=True
        ).astype(U32)

    def refill(bs, nbits, wi):
        v = jnp.where(wi >= 0, fetch(jnp.maximum(wi, 0)), _Z)
        do = nbits <= 32 * (len(bs) - 1)
        v = jnp.where(do, v, _Z)
        bs = tuple(bs[j] | _place(v, 32 * j - nbits) for j in range(len(bs)))
        nbits = jnp.where(do, nbits + 32, nbits)
        wi = jnp.where(do, wi - 1, wi)
        return bs, nbits, wi

    def consume(bs, nbits, n):
        nw = len(bs)
        n32 = n.astype(U32)
        out = []
        for j in range(nw):
            hi = _shl(bs[j], n32) | jnp.where(
                n32 >= 32, (bs[j + 1] if j + 1 < nw else _Z), _Z
            )
            lo = _shr(bs[j + 1], U32(32) - n32) if j + 1 < nw else _Z
            out.append(hi | lo)
        return tuple(out), nbits - n

    # buf_init + insert_top (partial word), then 2 refills.
    zeros = jnp.zeros((1, LANES), U32)
    wi = (p0 >> 5).astype(jnp.int32)
    top_bits = (p0 & 31).astype(jnp.int32)
    v = fetch(jnp.maximum(wi, 0))
    has = top_bits > 0
    mask = _shl(U32(1), top_bits.astype(U32)) - U32(1)
    v = jnp.where(has, v & mask, _Z)
    b0 = jnp.where(has, _shl(v, (U32(32) - top_bits.astype(U32))), zeros)
    nbits = jnp.where(has, top_bits, jnp.zeros_like(top_bits))
    bs = (b0, zeros, zeros)
    wi = wi - 1
    for _ in range(2):
        bs, nbits, wi = refill(bs, nbits, wi)
    pos = p0

    def body(t, carry):
        bs, nbits, wi, pos = carry
        rows = []
        for g in range(LIT_SYMS_PER_STEP // 2):
            bs, nbits, wi = refill(bs, nbits, wi)
            for k in range(2):
                i_sym = t * LIT_SYMS_PER_STEP + (2 * g + k)
                active = i_sym < regen
                v = (bs[0] >> U32(32 - 11)).astype(jnp.int32)
                j = jnp.sum(
                    (v >= limits).astype(jnp.int32), axis=0, keepdims=True
                )
                m12 = iota12 == j
                length = jnp.sum(jnp.where(m12, lengths, 0), axis=0, keepdims=True)
                prev = jnp.sum(jnp.where(m12, prevs, 0), axis=0, keepdims=True)
                rb = jnp.sum(jnp.where(m12, rankb, 0), axis=0, keepdims=True)
                rank = rb + ((v - prev) >> (11 - length))
                m256 = iota256 == rank
                sym = jnp.sum(
                    jnp.where(m256, ranked, 0), axis=0, keepdims=True
                ).astype(U32)
                n = jnp.where(active, length, 0)
                bs, nbits = consume(bs, nbits, n)
                pos = pos - n
                rows.append(sym & U32(0xFF))
        packed = jnp.concatenate(
            [
                rows[4 * r]
                | (rows[4 * r + 1] << U32(8))
                | (rows[4 * r + 2] << U32(16))
                | (rows[4 * r + 3] << U32(24))
                for r in range(8)
            ],
            axis=0,
        )
        out_ref[pl.ds(t * 8, 8), :] = packed
        return bs, nbits, wi, pos

    bs, nbits, wi, pos = jax.lax.fori_loop(0, max_steps, body, (bs, nbits, wi, pos))
    ok_ref[:] = (pos == pend).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_steps", "interpret"))
def decode_literals_pallas(
    words_lanes,  # uint32[W, 128] lane-last per-lane stream windows
    p0,  # int32[1, 128]
    pend,  # int32[1, 128]
    regen,  # int32[1, 128]
    limits,  # int32[16, 128]
    prevs,
    lengths,
    rankb,
    ranked,  # int32[256, 128]
    *,
    max_steps: int,
    interpret: bool = False,
):
    """Decode 128 Huffman streams; returns (packed uint32[steps*8, 128],
    ok int32[1, 128]).  Packed rows match decode_literals_v2's layout
    (row r of step t = symbols 4r..4r+3, LSB-first)."""
    W = words_lanes.shape[0]
    kernel = partial(_kernel, max_steps=max_steps, W=W)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((max_steps * 8, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        ),
        in_specs=[vspec] * 9,
        out_specs=(vspec, vspec),
        interpret=interpret,
    )(words_lanes, p0, pend, regen, limits, prevs, lengths, rankb, ranked)


MAX_W = 8192  # (W, 128) u32 window = 4 MB VMEM at this cap


@partial(jax.jit, static_argnames=("max_steps", "n_dense", "W", "interpret"))
def decode_literals_dense_pl(
    words,  # uint32[Wtot] flat stream buffer (plan-resident)
    lane_mat,  # int32[L, 5] stacked per-lane columns (base, p0, pend,
    #            regen, slot — entropy2.LIT_LANE_COLS); L a multiple
    #            of 128
    cum,  # int32[L + 1] word-count prefix sums (ceil(regen / 4))
    b_limits,  # int32[T, 12] table banks (see decode_literals_dense)
    b_prevs,
    b_lengths,
    b_rankb,
    b_ranked,  # int32[T, 256]
    *,
    max_steps: int,
    n_dense: int,
    W: int,
    interpret: bool = False,
):
    """Pallas production path, same contract as decode_literals_dense:
    one packed uint32[n_dense + L] array (dense words ‖ ok flags).

    The (W, L) per-lane window build and the bank-row gathers run as
    XLA ops in the same jit (large batched gathers are HBM-bound and
    cheap there); the serial decode loop runs as the Mosaic kernel,
    one grid program per 128-lane block; compaction is XLA again.
    """
    from .entropy2 import LIT_LANE_COLS, _compact

    L = lane_mat.shape[0]
    assert L % LANES == 0, L
    base, p0, pend, regen, slots = (
        lane_mat[:, c] for c in range(LIT_LANE_COLS)
    )
    wr = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)
    win = jnp.take(words, jnp.clip(base[None, :] + wr, 0, words.shape[0] - 1))

    def row16(b, fill=0):
        r = jnp.take(b, slots, axis=0).T  # (12, L)
        return jnp.pad(r, ((0, 4), (0, 0)), constant_values=fill)

    # limits pads with a sentinel above any 11-bit window so pad rows
    # never count toward the class index.
    limits = row16(b_limits, 1 << 30)
    prevs = row16(b_prevs)
    lengths = row16(b_lengths)
    rankb = row16(b_rankb)
    ranked = jnp.take(b_ranked, slots, axis=0).T

    kernel = partial(_kernel, max_steps=max_steps, W=W)
    grid = (L // LANES,)
    lane_col = lambda i: (0, i)  # noqa: E731
    vspec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, LANES), lane_col, memory_space=pltpu.VMEM
    )
    ys, ok = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((max_steps * 8, L), jnp.uint32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
        ),
        in_specs=[
            vspec(W),
            vspec(1),
            vspec(1),
            vspec(1),
            vspec(16),
            vspec(16),
            vspec(16),
            vspec(16),
            vspec(256),
        ],
        out_specs=(vspec(max_steps * 8), vspec(1)),
        interpret=interpret,
    )(
        win, p0[None, :], pend[None, :], regen[None, :],
        limits, prevs, lengths, rankb, ranked,
    )
    dense = _compact(ys.reshape(max_steps, 8, L), cum, n_dense)
    return jnp.concatenate([dense, (ok[0] != 0).astype(U32)])


def lane_windows(words: np.ndarray, base: np.ndarray, p0: np.ndarray) -> np.ndarray:
    """Host prepack: slice each lane's stream words out of the flat
    words buffer into a lane-last (W, 128) window (W = pow2 max)."""
    n = len(base)
    assert n <= LANES
    counts = (p0 >> 5) + 1
    W = max(8, 1 << int(int(counts.max()) - 1).bit_length())
    out = np.zeros((W, LANES), dtype=np.uint32)
    for l in range(n):
        c = int(counts[l])
        out[:c, l] = words[int(base[l]) : int(base[l]) + c]
    return out
