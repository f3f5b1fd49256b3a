"""Batched interleaved-tANS sequence decode as a Mosaic (Pallas) kernel.

The lax.scan form (entropy2._sequences_scan) pays per-step scan
overhead the Mosaic form does not (BASELINE.md "Pallas spike"); this
kernel covers the sequences hot loop (reference ``sequences.rs:217-229``
/ ``sequence.rs:41-88``) with:

* **L1 word cache** — each lane keeps a 128-word sliding cache in the
  loop carry, refreshed every 2 steps with two GROUP selects (the
  (W, 128) window reshaped to (W/64, 64, 128) so one pass extracts a
  whole 64-word aligned group per lane).  Per-slot refills then one-hot
  over 128 cached rows instead of W.  Never-stall bound: a slot
  consumes <= 3 words, so 16 slots drain <= 48 < 64 words — a 2-step
  cadence keeps wi-2 inside the cache between refreshes.
* **Tensor bit buffer** — the 192-bit MSB-first window lives in ONE
  (8, 128) uint32 tensor; consume/merge are a few full-VREG ops via a
  sublane roll instead of per-word scalar-row chains (r5).
* **Static table heights** — the one-hot state selects span
  R = 2^max(al) rows per kind (engine tiers pass it statically), not a
  blanket 512: OF tables cap at AL 8 and low-level streams at 5-7.

Layout: one grid program per (128-lane block, step chunk); TPU grids
run sequentially, so bit-buffer + tANS state persists across step
chunks in VMEM scratch, and the (W, 128) window + table planes are
revisited (not re-fetched) while the lane block is unchanged.  Output
planes match decode_sequences_dense's packed contract; compaction is
either the XLA gather form or, for big calls, per-lane DMA copies
(kernels/compact_dma.py) around the Mosaic body.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
LANES = 128
SLOTS = 8  # sequences per step (matches entropy2.SEQ_SLOTS_PER_STEP)
NW = 6  # bit-buffer words (192 bits; never-stall vs 90-bit bursts)
SEQ_MAX_BITS = 90
L1_WORDS = 128
L1_GROUP = 64
STEPS_PER_CHUNK = 64

_Z = np.uint32(0)


def _shl(v, n):
    n = n.astype(U32)
    return jnp.where(n >= 32, _Z, v << (n & U32(31)))


def _shr(v, n):
    n = n.astype(U32)
    return jnp.where(n >= 32, _Z, v >> (n & U32(31)))


def _place(v, sh):
    pos = jnp.maximum(sh, 0)
    neg = jnp.maximum(-sh, 0)
    return jnp.where(sh >= 0, _shl(v, pos), _shr(v, neg))


# The bit buffer is ONE (8, 128) uint32 tensor (rows 0..NW-1 hold the
# MSB-first 192-bit window, rows NW..7 stay zero): consume/merge are a
# handful of full-VREG ops via a sublane roll, instead of ~60 (1, 128)
# scalar-row ops per take on the old tuple-of-rows form — the per-step
# cost was measured op-issue-bound (~52 us/step floor, BASELINE.md r5).


def _iota8():
    return jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)


def _consume(bs8, nbits, n):
    """Shift the whole window left by n (<= 31) bits; one roll + a few
    tensor ops (row j's inflow = row j+1's top bits; rows >= NW - 1
    take zero inflow, masking the circular wrap)."""
    n32 = n.astype(U32)
    # shift 7 == -1 on the circular 8-row axis (roll requires >= 0).
    nxt = pltpu.roll(bs8, shift=7, axis=0)
    nxt = jnp.where(_iota8() < NW - 1, nxt, _Z)
    return _shl(bs8, n32) | _shr(nxt, U32(32) - n32), nbits - n


def _take(bs8, nbits, n):
    """Read the top n (<= 31) bits as a value and consume."""
    n32 = n.astype(U32)
    top = bs8[0:1] >> U32(1)
    val = _shr(top, U32(31) - n32)
    bs8, nbits = _consume(bs8, nbits, n)
    return val, bs8, nbits


def _merge(bs8, nbits, v):
    """Append one u32 below the current contents (room checked by the
    caller): row j receives v placed at bit offset 32*j - nbits, a
    per-element tensor shift (rows past the window self-mask: the
    placement shift saturates to zero output)."""
    return bs8 | _place(v, 32 * _iota8() - nbits)


def _kernel(
    p0_ref,  # int32[1, 128]
    pend_ref,  # int32[1, 128]
    nseq_ref,  # int32[1, 128]
    ll_al_ref,  # int32[1, 128]
    of_al_ref,
    ml_al_ref,
    win_ref,  # uint32[W / 64, 64, 128] per-lane stream windows, grouped
    ll0_ref,  # int32[R_ll, 128] state -> baseline << 16 | nbits
    ll1_ref,  # int32[R_ll, 128] state -> value_base << 5 | extra
    of0_ref,  # int32[R_of, 128]
    of1_ref,  # int32[R_of, 128] state -> offset code
    ml0_ref,  # int32[R_ml, 128]
    ml1_ref,
    da_ref,  # uint32[SC * 8, 128]  valid << 31 | offset_value
    db_ref,  # uint32[SC * 8, 128]  ll << 16 | ml
    ok_ref,  # int32[1, 128]
    sbuf_ref,  # uint32[8, 128] scratch: bit-buffer words
    sint_ref,  # int32[16, 128] scratch: cursor + tANS state
    *,
    W: int,
    R_ll: int,
    R_of: int,
    R_ml: int,
    SC: int,
):
    j = pl.program_id(1)
    nchunks = pl.num_programs(1)

    # The window arrives pre-grouped (W/64, 64, 128): an in-kernel
    # reshape of the flat (W, 128) form materializes a second W-sized
    # VMEM buffer (measured OOM at W = 16384).
    win3 = win_ref[:]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (W // L1_GROUP, 1, 1), 0)
    iota_l1 = jax.lax.broadcasted_iota(jnp.int32, (L1_WORDS, LANES), 0)

    def group(g):
        """Aligned 64-word group g (per lane) of the window: (64, 128)."""
        hit = iota_g == g.reshape(1, 1, LANES)
        return jnp.sum(
            jnp.where(hit, win3, _Z).astype(jnp.int32), axis=0
        ).astype(U32)

    def l1_refresh(wi):
        """(l1, base_l1) covering words [64*(g-1), 64*(g+1)) for g = wi>>6.

        Arithmetic shift floors negative wi; out-of-range groups select
        nothing -> zero rows, reproducing the phantom-zero reads past
        the window start."""
        g = wi >> 6
        base = (g - 1) * L1_GROUP
        l1 = jnp.concatenate([group(g - 1), group(g)], axis=0)
        return l1, base

    def fetch_l1(l1, base_l1, wi):
        row = wi - base_l1
        hit = iota_l1 == row
        return jnp.sum(
            jnp.where(hit, l1, _Z).astype(jnp.int32), axis=0, keepdims=True
        ).astype(U32)

    def refill(bs, nbits, wi, fetch):
        v = jnp.where(wi >= 0, fetch(jnp.maximum(wi, 0)), _Z)
        do = nbits <= 32 * (NW - 1)
        v = jnp.where(do, v, _Z)
        bs = _merge(bs, nbits, v)
        nbits = jnp.where(do, nbits + 32, nbits)
        wi = jnp.where(do, wi - 1, wi)
        return bs, nbits, wi

    ll_al = ll_al_ref[:]
    of_al = of_al_ref[:]
    ml_al = ml_al_ref[:]
    nseq = nseq_ref[:]
    pend = pend_ref[:]
    ll0, ll1 = ll0_ref[:], ll1_ref[:]
    of0, of1 = of0_ref[:], of1_ref[:]
    ml0, ml1 = ml0_ref[:], ml1_ref[:]
    iota_ll = jax.lax.broadcasted_iota(jnp.int32, (R_ll, LANES), 0)
    iota_of = jax.lax.broadcasted_iota(jnp.int32, (R_of, LANES), 0)
    iota_ml = jax.lax.broadcasted_iota(jnp.int32, (R_ml, LANES), 0)

    def sel2(iota, state, pa, pb):
        """Two planes of one state table, sharing the one-hot mask."""
        m = iota == state
        a = jnp.sum(jnp.where(m, pa, 0), axis=0, keepdims=True)
        b = jnp.sum(jnp.where(m, pb, 0), axis=0, keepdims=True)
        return a, b

    @pl.when(j == 0)
    def _init():
        p0 = p0_ref[:]
        zeros = jnp.zeros((1, LANES), U32)
        wi = (p0 >> 5).astype(jnp.int32)
        top_bits = (p0 & 31).astype(jnp.int32)
        # All init reads hit the L1 cache too: wi .. wi-5 sit inside
        # [base_l1 + 58, base_l1 + 128) right after a refresh.
        il1, ibase = l1_refresh(wi)
        v = fetch_l1(il1, ibase, jnp.maximum(wi, 0))
        has = top_bits > 0
        mask = _shl(U32(1), top_bits.astype(U32)) - U32(1)
        v = jnp.where(has, v & mask, _Z)
        b0 = jnp.where(has, _shl(v, (U32(32) - top_bits.astype(U32))), zeros)
        nbits = jnp.where(has, top_bits, jnp.zeros_like(top_bits))
        bs = jnp.where(_iota8() == 0, b0, _Z)
        wi = wi - 1
        for _ in range(NW - 1):
            bs, nbits, wi = refill(
                bs, nbits, wi, lambda w: fetch_l1(il1, ibase, w)
            )
        pos = p0
        # tANS state init: LL, OF, ML order (sequence.rs:59-65).
        v, bs, nbits = _take(bs, nbits, ll_al)
        s_ll = v.astype(jnp.int32)
        pos = pos - ll_al
        v, bs, nbits = _take(bs, nbits, of_al)
        s_of = v.astype(jnp.int32)
        pos = pos - of_al
        v, bs, nbits = _take(bs, nbits, ml_al)
        s_ml = v.astype(jnp.int32)
        pos = pos - ml_al
        sbuf_ref[:] = bs
        sint_ref[0:1, :] = nbits
        sint_ref[1:2, :] = wi
        sint_ref[2:3, :] = pos
        sint_ref[3:4, :] = s_ll
        sint_ref[4:5, :] = s_of
        sint_ref[5:6, :] = s_ml
        sint_ref[6:7, :] = jnp.zeros((1, LANES), jnp.int32)  # emitted
        sint_ref[7:8, :] = jnp.zeros((1, LANES), jnp.int32)  # bad

    bs = sbuf_ref[:]
    nbits = sint_ref[0:1, :]
    wi = sint_ref[1:2, :]
    pos = sint_ref[2:3, :]
    s_ll = sint_ref[3:4, :]
    s_of = sint_ref[4:5, :]
    s_ml = sint_ref[5:6, :]
    emitted = sint_ref[6:7, :]
    bad = sint_ref[7:8, :]

    l1, base_l1 = l1_refresh(wi)

    def step(t, carry):
        bs, nbits, wi, pos, s_ll, s_of, s_ml, emitted, bad, l1, base_l1 = carry
        rows_a, rows_b = [], []
        for _slot in range(SLOTS):
            for _ in range(3):
                bs, nbits, wi = refill(
                    bs, nbits, wi, lambda w: fetch_l1(l1, base_l1, w)
                )
            active = emitted < nseq
            can = active & (nbits >= SEQ_MAX_BITS)

            e0_ll, e1_ll = sel2(iota_ll, s_ll, ll0, ll1)
            e0_of, of_code = sel2(iota_of, s_of, of0, of1)
            e0_ml, e1_ml = sel2(iota_ml, s_ml, ml0, ml1)

            # Extra bits: OF, ML, LL (sequence.rs:50-52).
            n = jnp.where(can, of_code, 0)
            v, bs, nbits = _take(bs, nbits, n)
            pos = pos - n
            ofv = (U32(1) << of_code.astype(U32)) + v
            n = jnp.where(can, e1_ml & 31, 0)
            v, bs, nbits = _take(bs, nbits, n)
            pos = pos - n
            ml = (e1_ml >> 5) + v.astype(jnp.int32)
            n = jnp.where(can, e1_ll & 31, 0)
            v, bs, nbits = _take(bs, nbits, n)
            pos = pos - n
            ll = (e1_ll >> 5) + v.astype(jnp.int32)

            # State updates LL, ML, OF, skipped on the last sequence.
            upd = can & (emitted < nseq - 1)
            n = jnp.where(upd, e0_ll & 0xFFFF, 0)
            v, bs, nbits = _take(bs, nbits, n)
            pos = pos - n
            s_ll = jnp.where(upd, (e0_ll >> 16) + v.astype(jnp.int32), s_ll)
            n = jnp.where(upd, e0_ml & 0xFFFF, 0)
            v, bs, nbits = _take(bs, nbits, n)
            pos = pos - n
            s_ml = jnp.where(upd, (e0_ml >> 16) + v.astype(jnp.int32), s_ml)
            n = jnp.where(upd, e0_of & 0xFFFF, 0)
            v, bs, nbits = _take(bs, nbits, n)
            pos = pos - n
            s_of = jnp.where(upd, (e0_of >> 16) + v.astype(jnp.int32), s_of)

            emitted = emitted + can.astype(jnp.int32)
            # Narrow packing; overflow/stall flags route the lane to the
            # engine's wide retry (entropy2._sequences_scan narrow path).
            badc = (
                (can & (of_code >= 31))
                | (active & ~can)
                | (can & ((ll > 0xFFFF) | (ml > 0xFFFF)))
            )
            bad = bad | badc.astype(jnp.int32)
            rows_a.append((can.astype(U32) << U32(31)) | (ofv & U32(0x7FFFFFFF)))
            pb = (ll.astype(U32) << U32(16)) | (ml.astype(U32) & U32(0xFFFF))
            rows_b.append(jnp.where(can, pb, U32(0)))

        da_ref[pl.ds(t * SLOTS, SLOTS), :] = jnp.concatenate(rows_a, axis=0)
        db_ref[pl.ds(t * SLOTS, SLOTS), :] = jnp.concatenate(rows_b, axis=0)
        return bs, nbits, wi, pos, s_ll, s_of, s_ml, emitted, bad, l1, base_l1

    def two_steps(i, carry):
        # L1 refresh every 2 steps: 16 slots drain <= 48 < 64 words, so
        # wi-2 stays inside the 128-word cache between refreshes.
        l1, base_l1 = l1_refresh(carry[2])
        carry = carry[:9] + (l1, base_l1)
        carry = step(2 * i, carry)
        return step(2 * i + 1, carry)

    carry = (bs, nbits, wi, pos, s_ll, s_of, s_ml, emitted, bad, l1, base_l1)
    carry = jax.lax.fori_loop(0, SC // 2, two_steps, carry)
    bs, nbits, wi, pos, s_ll, s_of, s_ml, emitted, bad = carry[:9]

    sbuf_ref[:] = bs
    sint_ref[0:1, :] = nbits
    sint_ref[1:2, :] = wi
    sint_ref[2:3, :] = pos
    sint_ref[3:4, :] = s_ll
    sint_ref[4:5, :] = s_of
    sint_ref[5:6, :] = s_ml
    sint_ref[6:7, :] = emitted
    sint_ref[7:8, :] = bad

    @pl.when(j == nchunks - 1)
    def _fin():
        ok = (emitted == nseq) & (pos == pend) & (bad == 0)
        ok_ref[:] = ok.astype(jnp.int32)


MAX_W = 16384  # (W, 128) u32 window = 8 MB VMEM at this cap


@partial(
    jax.jit,
    static_argnames=(
        "max_steps", "n_dense_w", "W", "R_ll", "R_of", "R_ml", "interpret",
        "dma_compact",
    ),
)
def decode_sequences_dense_pl(
    words,  # uint32[Wtot] raw input words (plan-resident)
    lane_mat,  # int32[L, 13] stacked per-lane columns
    #            (entropy2.SEQ_LANE_COLS); L a multiple of 128
    cumw,  # int32[L + 1] prefix sums of per-lane packed word counts
    bank_flat0,  # int32[N] flat FSE bank planes (see decode_sequences_dense)
    bank_flat1,
    bank_off,  # int32[S]
    *,
    max_steps: int,
    n_dense_w: int,
    W: int,
    R_ll: int,
    R_of: int,
    R_ml: int,
    interpret: bool = False,
    dma_compact: bool = False,
):
    """Pallas production path, same packed single-array contract as
    decode_sequences_dense: uint32[n_dense_w + L] = bit-packed ‖ ok.

    The (W, L) window build and bank-row gathers run as XLA ops in the
    same jit; the serial decode loop is the Mosaic kernel; bit-packing
    compaction (entropy2._pack_triples) is XLA again."""
    from .compact_dma import compact_lanes_dma
    from .entropy2 import (
        SEQ_LANE_COLS,
        _pack_triples,
        _pack_words,
        _seq_word_plane,
    )

    L = lane_mat.shape[0]
    assert L % LANES == 0 and W % L1_GROUP == 0, (L, W)
    (
        base, p0, pend, nseq, w_ll, w_ml, w_of,
        ll_slot, of_slot, ml_slot, ll_al, of_al, ml_al,
    ) = (lane_mat[:, c] for c in range(SEQ_LANE_COLS))
    wr = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)
    win = jnp.take(words, jnp.clip(base[None, :] + wr, 0, words.shape[0] - 1))
    win3 = win.reshape(W // L1_GROUP, L1_GROUP, L)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1)

    def rows(flat, slot, R):
        idx = jnp.take(bank_off, slot)[:, None] + row_iota[:, :R]
        return jnp.take(flat, idx, mode="clip").T  # (R, L) lane-last

    SC = min(STEPS_PER_CHUNK, max_steps)
    assert max_steps % SC == 0 and SC % 2 == 0, (max_steps, SC)
    grid = (L // LANES, max_steps // SC)
    lane_col = lambda i, j: (0, i)  # noqa: E731
    step_col = lambda i, j: (j, i)  # noqa: E731
    vspec = lambda rows_, im: pl.BlockSpec(  # noqa: E731
        (rows_, LANES), im, memory_space=pltpu.VMEM
    )
    da, db, ok = pl.pallas_call(
        partial(_kernel, W=W, R_ll=R_ll, R_of=R_of, R_ml=R_ml, SC=SC),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((max_steps * SLOTS, L), jnp.uint32),
            jax.ShapeDtypeStruct((max_steps * SLOTS, L), jnp.uint32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
        ),
        in_specs=[
            vspec(1, lane_col),  # p0
            vspec(1, lane_col),  # pend
            vspec(1, lane_col),  # nseq
            vspec(1, lane_col),  # ll_al
            vspec(1, lane_col),  # of_al
            vspec(1, lane_col),  # ml_al
            pl.BlockSpec(  # win, grouped (W/64, 64, 128)
                (W // L1_GROUP, L1_GROUP, LANES),
                lambda i, j: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            vspec(R_ll, lane_col),
            vspec(R_ll, lane_col),
            vspec(R_of, lane_col),
            vspec(R_of, lane_col),
            vspec(R_ml, lane_col),
            vspec(R_ml, lane_col),
        ],
        out_specs=(
            vspec(SC * SLOTS, step_col),
            vspec(SC * SLOTS, step_col),
            vspec(1, lane_col),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, LANES), jnp.uint32),
            pltpu.VMEM((16, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        p0[None, :],
        pend[None, :],
        nseq[None, :],
        ll_al[None, :],
        of_al[None, :],
        ml_al[None, :],
        win3,
        rows(bank_flat0, ll_slot, R_ll),
        rows(bank_flat1, ll_slot, R_ll),
        rows(bank_flat0, of_slot, R_of),
        rows(bank_flat1, of_slot, R_of),
        rows(bank_flat0, ml_slot, R_ml),
        rows(bank_flat1, ml_slot, R_ml),
    )
    if dma_compact and not interpret:
        # Field-pack on the VPU, then per-lane DMA compaction of the
        # word plane (kernels/compact_dma.py) — the gather form's
        # serial ~17 ns/element indexed reads were 42 ms of the top
        # bench call (BASELINE.md r5).  Requires 1024-word-aligned
        # cumw (Mosaic HBM slices are (1024,)-tiled); the engine
        # quantizes counts for big calls only, where the ~4% fetch pad
        # costs less than the gather.
        lo, hi, over = _pack_words(da, db, w_ll, w_ml, w_of)
        plane = _seq_word_plane(lo, hi, w_ll, w_ml, w_of)
        maxw = -(-2 * max_steps * SLOTS // 1024) * 1024
        pad = maxw - 2 * max_steps * SLOTS
        if pad:
            plane = jnp.pad(plane, ((0, pad), (0, 0)))
        packed = compact_lanes_dma(
            plane.T, cumw, n_dense=n_dense_w, maxw=maxw
        )
    else:
        pa = da.reshape(max_steps, SLOTS, L)
        pb = db.reshape(max_steps, SLOTS, L)
        packed, over = _pack_triples(
            pa, pb, w_ll, w_ml, w_of, nseq, cumw, n_dense_w
        )
    return jnp.concatenate([packed, ((ok[0] != 0) & ~over).astype(U32)])
