"""Native host-runtime bindings (ctypes over a gcc-built shared object).

Builds ``native/zstd_tpu_native.c`` on first use (plain ``gcc -O2
-shared``; pybind11 is not available in this environment) and exposes:

* ``xxh64(data, seed)``
* ``execute_sequences(out, out_len, literals, ll, ofv, ml, rep)``

All are optional accelerations: every caller has a pure-Python/NumPy
fallback, and the native results are covered by the same differential
tests.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "zstd_tpu_native.c"
_BUILD_DIR = _REPO / "native" / "_build"
_SO = _BUILD_DIR / "libzstd_tpu_native.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CC", "gcc"),
        "-O2",
        "-fPIC",
        "-shared",
        "-o",
        str(_SO),
        str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_SO))
        except Exception:
            return None
        lib.zt_xxh64.restype = ctypes.c_uint64
        lib.zt_xxh64.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64]
        lib.zt_execute_sequences.restype = ctypes.c_int
        lib.zt_execute_sequences.argtypes = [
            ctypes.c_void_p,  # out
            ctypes.c_size_t,  # cap
            ctypes.POINTER(ctypes.c_size_t),  # out_len io
            ctypes.c_void_p,  # literals
            ctypes.c_size_t,  # lit_len
            ctypes.c_void_p,  # ll int32*
            ctypes.c_void_p,  # ofv uint32*
            ctypes.c_void_p,  # ml int32*
            ctypes.c_size_t,  # n
            ctypes.c_void_p,  # rep uint64[3]
        ]
        lib.zt_lz77_lazy.restype = ctypes.c_size_t
        lib.zt_lz77_lazy.argtypes = [
            ctypes.c_void_p,  # src
            ctypes.c_size_t,  # block_start
            ctypes.c_size_t,  # block_end
            ctypes.c_size_t,  # window
            ctypes.c_void_p,  # head int32[1<<16]
            ctypes.c_void_p,  # chain int32[chain_mask+1]
            ctypes.c_size_t,  # chain_mask
            ctypes.c_int,  # attempts
            ctypes.c_int,  # lazy
            ctypes.c_void_p,  # reps io int32[3]
            ctypes.c_void_p,  # ll_out
            ctypes.c_void_p,  # off_out
            ctypes.c_void_p,  # ml_out
            ctypes.c_size_t,  # max_seqs
            ctypes.c_void_p,  # lit_out
            ctypes.POINTER(ctypes.c_size_t),  # lit_len io
        ]
        lib.zt_lz77_optimal.restype = ctypes.c_size_t
        lib.zt_lz77_optimal.argtypes = [
            ctypes.c_void_p,  # src
            ctypes.c_size_t,  # block_start
            ctypes.c_size_t,  # block_end
            ctypes.c_size_t,  # window
            ctypes.c_void_p,  # head
            ctypes.c_void_p,  # chain
            ctypes.c_size_t,  # chain_mask
            ctypes.c_int,  # attempts
            ctypes.c_void_p,  # reps io int32[3]
            ctypes.c_void_p,  # lit_price uint32[256]
            ctypes.c_void_p,  # ll_price uint32[36]
            ctypes.c_void_p,  # ml_price uint32[53]
            ctypes.c_void_p,  # of_price uint32[32]
            ctypes.c_void_p,  # ll_out
            ctypes.c_void_p,  # off_out
            ctypes.c_void_p,  # ml_out
            ctypes.c_size_t,  # max_seqs
            ctypes.c_void_p,  # lit_out
            ctypes.POINTER(ctypes.c_size_t),  # lit_len io
        ]
        lib.zt_resolve_offsets.restype = ctypes.c_int
        lib.zt_resolve_offsets.argtypes = [
            ctypes.c_void_p,  # ll int32*
            ctypes.c_void_p,  # ofv uint32*
            ctypes.c_size_t,  # n
            ctypes.c_void_p,  # rep uint64[3]
            ctypes.c_void_p,  # off_out int64*
        ]
        lib.zt_fse_parse_build.restype = ctypes.c_int
        lib.zt_fse_parse_build.argtypes = [
            ctypes.c_char_p,  # data
            ctypes.c_size_t,  # len
            ctypes.c_int,  # max accuracy log
            ctypes.c_void_p,  # symbol uint16[512]
            ctypes.c_void_p,  # baseline uint16[512]
            ctypes.c_void_p,  # nbits uint8[512]
            ctypes.POINTER(ctypes.c_size_t),  # bits consumed
        ]
        lib.zt_fse_weights.restype = ctypes.c_int
        lib.zt_fse_weights.argtypes = [
            ctypes.c_char_p,  # payload
            ctypes.c_size_t,  # len
            ctypes.c_void_p,  # out weights uint8[256]
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def fse_parse_build(data) -> tuple | None:
    """Parse + build an FSE decode table from the buffer's bit 0.

    Returns ``(accuracy_log, symbol, baseline, nbits, bits_consumed)``
    with arrays sized to the table, or ``None`` when the native library
    is unavailable or the stream is corrupt — the caller then runs the
    Python path, which raises the precise typed error."""
    lib = _load()
    if lib is None:
        return None
    buf = bytes(data)
    symbol = np.empty(512, dtype=np.uint16)
    baseline = np.empty(512, dtype=np.uint16)
    nbits = np.empty(512, dtype=np.uint8)
    bits = ctypes.c_size_t(0)
    al = lib.zt_fse_parse_build(
        buf,
        len(buf),
        9,
        symbol.ctypes.data,
        baseline.ctypes.data,
        nbits.ctypes.data,
        ctypes.byref(bits),
    )
    if al < 0:
        return None
    size = 1 << al
    return al, symbol[:size], baseline[:size], nbits[:size], int(bits.value)


def fse_weights(payload) -> list[int] | None:
    """Decode FSE-compressed Huffman weights; None → run the Python path."""
    lib = _load()
    if lib is None:
        return None
    buf = bytes(payload)
    out = np.empty(256, dtype=np.uint8)
    n = lib.zt_fse_weights(buf, len(buf), out.ctypes.data)
    if n < 0:
        return None
    return out[:n].tolist()


def xxh64(data, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        raise NativeUnavailable("native library not built")
    arr = (
        data
        if isinstance(data, np.ndarray)
        else np.frombuffer(data, dtype=np.uint8)
    )
    if arr.size == 0:
        return lib.zt_xxh64(None, 0, seed)
    return lib.zt_xxh64(arr.ctypes.data, arr.size, seed)


_STATUS = {
    1: "null offset",
    2: "literal run exceeds remaining literals",
    3: "offset exceeds decoded length",
    4: "output overflow",
}


def execute_sequences(
    out: np.ndarray,
    out_len: int,
    literals,
    ll: np.ndarray,
    ofv: np.ndarray,
    ml: np.ndarray,
    rep: np.ndarray,
) -> int:
    """Run sequences into preallocated ``out`` (uint8, big enough).

    Returns the new output length; raises ValueError with the status
    message on corruption.  ``rep`` is a uint64[3] array, mutated.
    """
    lib = _load()
    if lib is None:
        raise NativeUnavailable("native library not built")
    lit = np.frombuffer(literals, dtype=np.uint8) if not isinstance(
        literals, np.ndarray
    ) else literals
    ll = np.ascontiguousarray(ll, dtype=np.int32)
    ofv = np.ascontiguousarray(ofv, dtype=np.uint32)
    ml = np.ascontiguousarray(ml, dtype=np.int32)
    n = len(ll)
    out_len_c = ctypes.c_size_t(out_len)
    status = lib.zt_execute_sequences(
        out.ctypes.data,
        out.size,
        ctypes.byref(out_len_c),
        lit.ctypes.data if lit.size else None,
        lit.size,
        ll.ctypes.data,
        ofv.ctypes.data,
        ml.ctypes.data,
        n,
        rep.ctypes.data,
    )
    if status != 0:
        raise ValueError(f"sequence execution failed: {_STATUS.get(status, status)}")
    return out_len_c.value


HASH_LOG = 16


class MatchState:
    """Hash-chain matcher state, persisted across a frame's blocks so
    cross-block matches resolve (the decoder's window spans the frame)."""

    def __init__(self, chain_log: int = 17):
        self.head = np.full(1 << HASH_LOG, -1, dtype=np.int32)
        self.chain = np.full(1 << chain_log, -1, dtype=np.int32)
        self.chain_mask = (1 << chain_log) - 1


def new_match_state(chain_log: int = 17) -> MatchState:
    return MatchState(chain_log)


def lz77_lazy(
    src: np.ndarray,
    block_start: int,
    block_end: int,
    window: int,
    state: MatchState,
    reps: list[int] | np.ndarray,
    attempts: int,
    lazy: bool,
):
    """Hash-chain LZ77 with repeat-offset-aware scoring and optional
    one-step lazy matching over src[block_start:block_end].

    Returns (ll, off, ml) int32 arrays and the literal bytes.  ``reps``
    is the 3-slot repeat-offset history at block start (read-only for
    the caller; offsets_to_values recomputes the updates).
    """
    lib = _load()
    if lib is None:
        raise NativeUnavailable("native library not built")
    n = block_end - block_start
    max_seqs = n // 4 + 1
    ll = np.empty(max_seqs, dtype=np.int32)
    off = np.empty(max_seqs, dtype=np.int32)
    ml = np.empty(max_seqs, dtype=np.int32)
    lit = np.empty(n, dtype=np.uint8)
    lit_len = ctypes.c_size_t(0)
    reps_arr = np.ascontiguousarray(np.asarray(reps, dtype=np.int32)[:3])
    n_seq = lib.zt_lz77_lazy(
        src.ctypes.data,
        block_start,
        block_end,
        window,
        state.head.ctypes.data,
        state.chain.ctypes.data,
        state.chain_mask,
        attempts,
        int(lazy),
        reps_arr.ctypes.data,
        ll.ctypes.data,
        off.ctypes.data,
        ml.ctypes.data,
        max_seqs,
        lit.ctypes.data,
        ctypes.byref(lit_len),
    )
    return ll[:n_seq], off[:n_seq], ml[:n_seq], lit[: lit_len.value]


def _entropy_prices(counts: np.ndarray, lo=8, hi=8 * 20) -> np.ndarray:
    """Counts → 1/8-bit prices: -8*log2(freq/total); unseen = hi."""
    total = float(counts.sum())
    prices = np.full(len(counts), hi, dtype=np.float64)
    seen = counts > 0
    if total > 0 and seen.any():
        prices[seen] = -8.0 * np.log2(counts[seen] / total)
    return np.ascontiguousarray(
        np.clip(np.round(prices), lo, hi).astype(np.uint32)
    )


def lz77_optimal(
    src: np.ndarray,
    block_start: int,
    block_end: int,
    window: int,
    state: MatchState,
    reps: list[int] | np.ndarray,
    attempts: int,
    passes: int = 2,
):
    """Price-driven optimal parse over src[block_start:block_end]
    (zt_lz77_optimal): per-position DP with repeat-history-aware
    candidate pricing, iterated: pass 1 uses block-histogram literal
    prices and flat code priors; later passes re-derive every price
    table from the PREVIOUS pass's emitted literal/code histograms —
    the adaptive feedback that makes the parse converge on stream
    structure (skewed literals, locked repeat offsets) instead of raw
    match length.  Returns (ll, off, ml, literals) like
    :func:`lz77_lazy`; minmatch 3 for repeats, so up to n/3 + 1
    sequences."""
    lib = _load()
    if lib is None:
        raise NativeUnavailable("native library not built")
    n = block_end - block_start
    block = src[block_start:block_end]
    # Pass-1 priors: block-histogram literal entropy + flat pessimistic
    # code estimates.  NOTE: carrying the previous block's CONVERGED
    # prices forward was tried and measured to hurt badly (multiblock
    # synthetic 1.10x -> 1.66-2.60x): optimistic near-zero code prices
    # make swarms of tiny rep matches look free, the code streams
    # diversify, and the real encoding blows up — a self-consistent but
    # globally bad fixed point.  Flat priors + per-block repricing is
    # the stable scheme.
    lit_price = _entropy_prices(np.bincount(block, minlength=256), hi=8 * 14)
    ll_price = np.full(36, 8 * 4, dtype=np.uint32)
    ml_price = np.full(53, 8 * 4, dtype=np.uint32)
    of_price = np.full(32, 8 * 4, dtype=np.uint32)

    max_seqs = n // 3 + 2
    ll = np.empty(max_seqs, dtype=np.int32)
    off = np.empty(max_seqs, dtype=np.int32)
    ml = np.empty(max_seqs, dtype=np.int32)
    lit = np.empty(n, dtype=np.uint8)
    reps_in = np.asarray(reps, dtype=np.int32)[:3]
    head0, chain0 = state.head.copy(), state.chain.copy()

    from ..ops.sequence_codes import LL_BASELINE, ML_BASELINE

    n_seq = 0
    lit_len = ctypes.c_size_t(0)
    for it in range(max(passes, 1)):
        if it:
            state.head[:] = head0  # re-parse over identical chains
            state.chain[:] = chain0
        reps_arr = np.ascontiguousarray(reps_in.copy())
        lit_len = ctypes.c_size_t(0)
        n_seq = lib.zt_lz77_optimal(
            src.ctypes.data,
            block_start,
            block_end,
            window,
            state.head.ctypes.data,
            state.chain.ctypes.data,
            state.chain_mask,
            attempts,
            reps_arr.ctypes.data,
            lit_price.ctypes.data,
            ll_price.ctypes.data,
            ml_price.ctypes.data,
            of_price.ctypes.data,
            ll.ctypes.data,
            off.ctypes.data,
            ml.ctypes.data,
            max_seqs,
            lit.ctypes.data,
            ctypes.byref(lit_len),
        )
        if it == max(passes, 1) - 1 or n_seq == 0:
            break
        # Reprice from this pass's emitted stats.
        lit_price = _entropy_prices(
            np.bincount(lit[: lit_len.value], minlength=256), hi=8 * 14
        )
        lls = ll[:n_seq].astype(np.int64)
        mls = ml[:n_seq].astype(np.int64)
        ll_codes = np.searchsorted(LL_BASELINE, lls, side="right") - 1
        ml_codes = np.searchsorted(ML_BASELINE, mls, side="right") - 1
        # Offset values need the rep history walk (cheap, in C).
        rep_sim = reps_in.astype(np.uint64).copy()
        try:
            offs = off[:n_seq]
            ofv = _offsets_to_values_np(lls, offs, rep_sim)
            of_codes = np.int64(np.floor(np.log2(ofv.astype(np.float64))))
        except Exception:
            of_codes = np.zeros(n_seq, dtype=np.int64)
        ll_price = _entropy_prices(np.bincount(ll_codes, minlength=36)[:36])
        ml_price = _entropy_prices(np.bincount(ml_codes, minlength=53)[:53])
        of_price = _entropy_prices(np.bincount(of_codes, minlength=32)[:32])
    return ll[:n_seq], off[:n_seq], ml[:n_seq], lit[: lit_len.value]


def _offsets_to_values_np(lls, offs, rep):
    """Forward offset→value walk (mirror of encode.offsets_to_values)."""
    out = np.zeros(len(offs), dtype=np.uint64)
    r = [int(rep[0]), int(rep[1]), int(rep[2])]
    for i in range(len(offs)):
        o, l = int(offs[i]), int(lls[i])
        if l != 0:
            v = 1 if o == r[0] else 2 if o == r[1] else 3 if o == r[2] else o + 3
        else:
            v = (1 if o == r[1] else 2 if o == r[2]
                 else 3 if o == r[0] - 1 and o > 0 else o + 3)
        idx = v - 1 if l != 0 else v
        if v > 3:
            r[0], r[1], r[2] = o, r[0], r[1]
        elif idx == 1:
            r[0], r[1] = r[1], r[0]
        elif idx >= 2:
            r[0], r[1], r[2] = o, r[0], r[1]
        out[i] = v
    return out


def resolve_offsets(ll, ofv, rep: np.ndarray) -> np.ndarray:
    """Resolve (ll, offset_value) pairs to actual offsets; mutates the
    uint64[3] ``rep`` history.  Raises ValueError on a null offset."""
    lib = _load()
    if lib is None:
        raise NativeUnavailable("native library not built")
    ll = np.ascontiguousarray(ll, dtype=np.int32)
    ofv = np.ascontiguousarray(ofv, dtype=np.uint32)
    out = np.empty(len(ll), dtype=np.int64)
    status = lib.zt_resolve_offsets(
        ll.ctypes.data, ofv.ctypes.data, len(ll), rep.ctypes.data,
        out.ctypes.data,
    )
    if status != 0:
        raise ValueError("null offset in sequence stream")
    return out
