"""Vectorized backward-bitstream reads (device side).

The core TPU-native move (SURVEY.md §7 "hard parts" #1): a backward
stream is the little-endian integer over its bytes; reading ``n`` bits at
cursor ``P`` is ``(I >> (P-n)) & ((1<<n)-1)``.  On device every lane
keeps an integer cursor and the shift is computed from two adjacent u32
words of a flat stream buffer — no byte reversal, no data-dependent
control flow, identical code per lane.

All functions are shape-polymorphic over a leading lane axis and usable
inside jit / scan bodies / Pallas kernels.  Streams are packed into one
flat uint32 word buffer by the host prepass
(zstd_tpu/format/block_table.py); each lane carries ``base`` (its first
word index) and a bit position relative to that base.  The buffer has
one zero pad word after every stream so ``w+1`` loads stay in bounds.
"""

from __future__ import annotations

import jax.numpy as jnp


def load_window32(words: jnp.ndarray, base: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """32 consecutive stream bits starting at bit ``s`` (lane-relative).

    ``words`` is the flat uint32 buffer; ``base`` the per-lane first word
    index; ``s`` must be >= 0.  Returns uint32 with bit k = stream bit
    s+k.
    """
    w = base + (s >> 5)
    off = (s & 31).astype(jnp.uint32)
    lo = words[w]
    hi = words[w + 1]
    # off == 0 must not shift by 32 (undefined in XLA); select instead.
    hi_part = jnp.where(off == 0, jnp.uint32(0), hi << (jnp.uint32(32) - off))
    return (lo >> off) | hi_part


def extract_bits(
    words: jnp.ndarray, base: jnp.ndarray, s: jnp.ndarray, n: jnp.ndarray
) -> jnp.ndarray:
    """``(I >> s) & ((1 << n) - 1)`` per lane, for 0 <= n <= 31."""
    window = load_window32(words, base, s)
    mask = (jnp.uint32(1) << n.astype(jnp.uint32)) - jnp.uint32(1)
    return window & mask


def take_backward(
    words: jnp.ndarray,
    base: jnp.ndarray,
    pos: jnp.ndarray,
    n: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backward-stream ``take(n)``: returns (value, new_pos).

    ``pos`` is the per-lane bit cursor (bits remaining below the
    sentinel).  Callers guarantee ``n <= pos`` for active lanes; inactive
    lanes should pass ``n = 0``.
    """
    new_pos = pos - n
    value = extract_bits(words, base, new_pos, n)
    return value, new_pos


def peek_padded(
    words: jnp.ndarray,
    base: jnp.ndarray,
    pos: jnp.ndarray,
    n: int,
) -> jnp.ndarray:
    """Peek ``n`` bits below the cursor, zero-padded on the right when the
    stream has fewer than ``n`` bits left (flat-table Huffman endgame)."""
    avail = jnp.minimum(pos, n)
    s = pos - avail
    raw = extract_bits(words, base, s, avail)
    return raw << (jnp.int32(n) - avail).astype(jnp.uint32)
