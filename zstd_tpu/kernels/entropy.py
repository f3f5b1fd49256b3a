"""Batched entropy-decode kernels (jnp/XLA formulation).

The reference decodes one Huffman bit (huffman.rs:205-218) and one tANS
step (sequences.rs:217-229) at a time.  Here the batch axis is the
device-wide vector: N independent backward streams decode in lockstep —
one flat-table gather per literal, one state gather per tANS transition —
with per-lane bit cursors and masking for ragged lengths (SURVEY.md §7).

Inputs come from the host prepass (zstd_tpu/format/block_table.py):

* ``words``   — flat uint32 buffer holding every stream's bytes
* per lane    — base word index, sentinel bit position, symbol count,
  table-slot ids
* tables      — Huffman LUTs expanded to a uniform 11-bit index
  (int32 ``symbol << 4 | nbits``); FSE tables padded to 512 states
  (int32 ``baseline << 16 | symbol << 4 | nbits``)

Both kernels return a per-lane ``ok`` flag: a valid stream consumes
exactly its bits (cursor ends at 0) and never emits an out-of-range
code.  Failed lanes are re-decoded by the host oracle (per-block status
codes, SURVEY.md §5 failure detection).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.sequence_codes import (
    LL_BASELINE,
    LL_EXTRA_BITS,
    MAX_LL_CODE,
    MAX_ML_CODE,
    MAX_OFFSET_CODE,
    ML_BASELINE,
    ML_EXTRA_BITS,
)
from .bitstream import peek_padded, take_backward

HUFF_INDEX_BITS = 11  # uniform LUT index width (RFC max code length)
FSE_MAX_STATES = 512  # AL <= 9


@partial(jax.jit, static_argnames=("max_steps",))
def decode_literals_batch(
    words: jnp.ndarray,  # uint32[W]
    base: jnp.ndarray,  # int32[L]
    p0: jnp.ndarray,  # int32[L]
    regen: jnp.ndarray,  # int32[L]
    lut_slot: jnp.ndarray,  # int32[L]
    luts: jnp.ndarray,  # int32[n_tables, 2048]
    *,
    max_steps: int,
):
    """Decode L backward Huffman streams in lockstep.

    Returns ``(symbols uint8[max_steps, L], ok bool[L])``.  Lane ``i``
    produces ``regen[i]`` valid symbols in ``symbols[:regen[i], i]``.
    """
    lut_flat = luts.reshape(-1)

    def body(pos, step):
        active = step < regen
        idx = peek_padded(words, base, pos, HUFF_INDEX_BITS)
        entry = lut_flat[lut_slot * (1 << HUFF_INDEX_BITS) + idx.astype(jnp.int32)]
        nbits = entry & 0xF
        sym = ((entry >> 4) & 0xFF).astype(jnp.uint8)
        pos = jnp.where(active, pos - nbits, pos)
        return pos, sym

    pos_final, syms = jax.lax.scan(body, p0, jnp.arange(max_steps, dtype=jnp.int32))
    ok = pos_final == 0
    return syms, ok


def _unpack_fse(entry):
    baseline = entry >> 16
    code = (entry >> 4) & 0xFFF
    nbits = entry & 0xF
    return baseline, code, nbits


@partial(jax.jit, static_argnames=("max_steps",))
def decode_sequences_batch(
    words: jnp.ndarray,  # uint32[W]
    base: jnp.ndarray,  # int32[L]
    p0: jnp.ndarray,  # int32[L]
    num_seq: jnp.ndarray,  # int32[L] (>= 1)
    ll_slot: jnp.ndarray,  # int32[L]
    of_slot: jnp.ndarray,
    ml_slot: jnp.ndarray,
    ll_al: jnp.ndarray,  # int32[L] accuracy logs
    of_al: jnp.ndarray,
    ml_al: jnp.ndarray,
    tables: jnp.ndarray,  # int32[n_slots, 512]
    *,
    max_steps: int,
):
    """Decode L interleaved (LL, OF, ML) tANS streams in lockstep.

    Stream discipline per RFC 8878 §3.1.1.3.2.1.1 (sequence.rs:41-88):
    init LL, OF, ML; per step extra bits OF, ML, LL; state updates LL,
    ML, OF, skipped on each lane's last sequence.

    Returns ``(ll int32[max_steps, L], offset_value uint32[max_steps, L],
    ml int32[max_steps, L], ok bool[L])``.
    """
    tables_flat = tables.reshape(-1)
    ll_base = ll_slot * FSE_MAX_STATES
    of_base = of_slot * FSE_MAX_STATES
    ml_base_idx = ml_slot * FSE_MAX_STATES

    ll_val_base = jnp.asarray(LL_BASELINE, dtype=jnp.int32)
    ll_val_bits = jnp.asarray(LL_EXTRA_BITS, dtype=jnp.int32)
    ml_val_base = jnp.asarray(ML_BASELINE, dtype=jnp.int32)
    ml_val_bits = jnp.asarray(ML_EXTRA_BITS, dtype=jnp.int32)

    # State initialization: LL then OF then ML.
    s_ll, pos = take_backward(words, base, p0, ll_al)
    s_of, pos = take_backward(words, base, pos, of_al)
    s_ml, pos = take_backward(words, base, pos, ml_al)
    s_ll = s_ll.astype(jnp.int32)
    s_of = s_of.astype(jnp.int32)
    s_ml = s_ml.astype(jnp.int32)

    def body(carry, step):
        pos, s_ll, s_of, s_ml, bad = carry
        active = step < num_seq
        update = step < num_seq - 1

        base_ll, ll_code, nb_ll = _unpack_fse(tables_flat[ll_base + s_ll])
        base_of, of_code, nb_of = _unpack_fse(tables_flat[of_base + s_of])
        base_ml, ml_code, nb_ml = _unpack_fse(tables_flat[ml_base_idx + s_ml])

        bad = bad | (
            active
            & (
                (ll_code > MAX_LL_CODE)
                | (of_code > MAX_OFFSET_CODE)
                | (ml_code > MAX_ML_CODE)
            )
        )
        ll_code = jnp.minimum(ll_code, MAX_LL_CODE)
        of_code = jnp.minimum(of_code, MAX_OFFSET_CODE)
        ml_code = jnp.minimum(ml_code, MAX_ML_CODE)

        # Extra bits: OF, ML, LL.
        v_of, pos = take_backward(words, base, pos, jnp.where(active, of_code, 0))
        offset_value = (jnp.uint32(1) << of_code.astype(jnp.uint32)) + v_of
        n_ml = jnp.where(active, ml_val_bits[ml_code], 0)
        v_ml, pos = take_backward(words, base, pos, n_ml)
        ml = ml_val_base[ml_code] + v_ml.astype(jnp.int32)
        n_ll = jnp.where(active, ll_val_bits[ll_code], 0)
        v_ll, pos = take_backward(words, base, pos, n_ll)
        ll = ll_val_base[ll_code] + v_ll.astype(jnp.int32)

        # State updates: LL, ML, OF — skipped on the last sequence.
        v, pos = take_backward(words, base, pos, jnp.where(update, nb_ll, 0))
        s_ll = jnp.where(update, base_ll + v.astype(jnp.int32), s_ll)
        v, pos = take_backward(words, base, pos, jnp.where(update, nb_ml, 0))
        s_ml = jnp.where(update, base_ml + v.astype(jnp.int32), s_ml)
        v, pos = take_backward(words, base, pos, jnp.where(update, nb_of, 0))
        s_of = jnp.where(update, base_of + v.astype(jnp.int32), s_of)

        return (pos, s_ll, s_of, s_ml, bad), (ll, offset_value, ml)

    bad0 = jnp.zeros(base.shape, dtype=bool)
    (pos, _, _, _, bad), (ll, ofv, ml) = jax.lax.scan(
        body,
        (pos, s_ll, s_of, s_ml, bad0),
        jnp.arange(max_steps, dtype=jnp.int32),
    )
    ok = (pos == 0) & ~bad
    return ll, ofv, ml, ok
