"""Differential coverage for the Mosaic (Pallas) production kernels.

``decode_literals_dense_pl`` and ``decode_sequences_dense_pl`` are the
auto-selected TPU path (engine.py ``_pallas_lits``); until round 5 they
were exercised only by bench.py's bit-exactness assert, so a packing or
cache-cadence regression surfaced as silent oracle fallback, never a
red test (VERDICT r4 missing #2).  These tests drive the exact kernel
bodies — in Pallas interpret mode when the suite runs on CPU, compiled
for real on a TPU backend — differentially against the lax.scan kernels
on real streams: level-3 text, level-19 repeat/treeless streams, a
stall-heavy handcrafted frame (near-worst-case bit bursts), and a
packed-field-overflow lane (ll > 0xFFFF → wide-retry flag parity).
"""

import numpy as np
import pytest

from zstd_tpu.format.block_table import build_batch_plan
from zstd_tpu.runtime.engine import DeviceEngine, _handles
from zstd_tpu.runtime.oracle import decompress as oracle_decompress
from zstd_tpu.testing import libzstd


def _engines():
    import jax

    ep = DeviceEngine(use_pallas=True)
    ep.pallas_interpret = jax.default_backend() != "tpu"
    es = DeviceEngine(use_pallas=False)
    return ep, es


def _assert_lane_parity(data: bytes):
    """Both kernel families must produce identical per-lane outputs."""
    plan = build_batch_plan(data)
    ep, es = _engines()
    (lo_p, lk_p), (so_p, sk_p) = ep._run_both(plan)
    (lo_s, lk_s), (so_s, sk_s) = es._run_both(plan)
    assert np.array_equal(lk_p, lk_s)
    assert np.array_equal(sk_p, sk_s)
    for lane, (a, b) in enumerate(zip(lo_p, lo_s)):
        if a is None or b is None:
            assert a is b, lane
            continue
        assert np.array_equal(a, b), f"literal lane {lane}"
    for lane, (ta, tb) in enumerate(zip(so_p, so_s)):
        if ta is None or tb is None:
            assert ta is tb, lane
            continue
        for k in range(3):
            assert np.array_equal(ta[k], tb[k]), f"seq lane {lane} field {k}"
    return plan


def _assert_engine_exact(data: bytes, payload: bytes):
    """Pallas forced on: no silent fallback, bit-exact output."""
    ep, _ = _engines()
    assert ep.decompress(data) == payload
    assert ep.stats.fallback_frames == 0, ep.stats.fallback_reasons


def test_pallas_matches_scan_level3_text():
    payload = (b"the quick brown fox %04d jumps over the lazy dog " * 250) % (
        tuple(range(250))
    )
    data = b"".join(
        libzstd.compress(payload[i::3], 3, checksum=True) for i in range(3)
    )
    plan = _assert_lane_parity(data)
    assert plan.n_lit_lanes > 0 and plan.n_seq_lanes > 0
    _assert_engine_exact(data, b"".join(payload[i::3] for i in range(3)))


def test_pallas_matches_scan_level19_repeat_streams():
    rng = np.random.default_rng(7)
    page = rng.bytes(2048)
    payload = b"".join(
        bytes(bytearray(page)[: 2000 + int(rng.integers(0, 48))])
        for _ in range(12)
    )
    data = libzstd.compress(payload, 19, checksum=True)
    _assert_lane_parity(data)
    _assert_engine_exact(data, payload)


def _stall_heavy_frame_small():
    """Sequence streams with near-worst-case bit bursts (large offsets
    into 1 MiB of raw history + spread FSE codes), sized down from
    test_engine._stall_heavy_frame for interpret-mode speed."""
    from zstd_tpu.encode import (
        MAGIC_ZSTD,
        _frame_header,
        encode_literals_section,
        encode_sequences_section,
        offsets_to_values,
    )

    rng = np.random.default_rng(0xFEED)
    out = bytearray(MAGIC_ZSTD.to_bytes(4, "little"))
    history = 1 << 20
    payload = bytearray(rng.bytes(history))
    body_blocks = []
    for start in range(0, history, 128 << 10):
        chunk = payload[start : start + (128 << 10)]
        header = 0 | (0 << 1) | (len(chunk) << 3)
        body_blocks.append(header.to_bytes(3, "little") + bytes(chunk))

    rep = [1, 4, 8]
    for _b in range(2):
        lls, offs, mls = [], [], []
        budget = 14 << 10
        out_so_far = len(payload)
        while budget > 2900:
            ll = int(rng.integers(300, 2000))
            ml = int(rng.integers(3, 800))
            off = int(rng.integers(1 << 16, min(out_so_far, 1 << 20)))
            lls.append(ll)
            offs.append(off)
            mls.append(ml)
            budget -= ll + ml
            out_so_far += ll + ml
        lls, offs, mls = map(np.asarray, (lls, offs, mls))
        lits = rng.integers(0, 256, int(lls.sum()), dtype=np.uint8)
        lp = 0
        for ll, off, ml in zip(lls, offs, mls):
            payload += bytes(lits[lp : lp + ll])
            lp += ll
            for _ in range(ml):
                payload.append(payload[-off])
        ofv = offsets_to_values(lls.astype(np.int64), offs, rep)
        body = encode_literals_section(lits) + encode_sequences_section(
            lls.astype(np.int64), ofv, mls.astype(np.int64)
        )
        header = 0 | (2 << 1) | (len(body) << 3)
        body_blocks.append(header.to_bytes(3, "little") + body)
    body_blocks.append((1 | (0 << 1) | (0 << 3)).to_bytes(3, "little"))
    out += _frame_header(len(payload), False, False, 21)
    out += b"".join(body_blocks)
    return bytes(out), bytes(payload)


def test_pallas_matches_scan_stall_heavy():
    data, payload = _stall_heavy_frame_small()
    assert oracle_decompress(data) == payload  # construction sanity
    _assert_lane_parity(data)
    _assert_engine_exact(data, payload)


def test_pallas_overflow_lane_flag_parity():
    # ll > 0xFFFF overflows the narrow (16-bit) packed field: both
    # kernel families must flag the lane bad PRE-retry, and the wide
    # retry must still produce exact bytes with Pallas forced on.
    from zstd_tpu.encode import (
        MAGIC_ZSTD,
        _frame_header,
        encode_literals_section,
        encode_sequences_section,
        offsets_to_values,
    )

    rng = np.random.default_rng(3)
    lits = rng.integers(0, 256, 72_000, dtype=np.uint8)
    lls = np.asarray([70_000, 1_500], dtype=np.int64)
    offs = np.asarray([1_000, 40_000])
    mls = np.asarray([500, 700], dtype=np.int64)
    payload = bytearray(bytes(lits[:70_000]))
    for _ in range(500):
        payload.append(payload[-1_000])
    payload += bytes(lits[70_000:71_500])
    for _ in range(700):
        payload.append(payload[-40_000])
    payload += bytes(lits[71_500:])
    ofv = offsets_to_values(lls, offs, [1, 4, 8])
    body = encode_literals_section(lits) + encode_sequences_section(lls, ofv, mls)
    data = bytes(
        MAGIC_ZSTD.to_bytes(4, "little")
        + _frame_header(len(payload), False, False, 20)
        + (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        + bytes(body)
    )
    assert oracle_decompress(data) == bytes(payload)
    plan = build_batch_plan(data)
    assert plan.n_seq_lanes > 0
    ep, es = _engines()
    pre = []
    for eng in (ep, es):
        outs, ok, pending = eng._dispatch_sequences(plan)
        it = eng._fetch_stream(_handles(pending))
        eng._finish_sequences(plan, pending, outs, ok, it)
        pre.append(ok.copy())
    assert np.array_equal(pre[0], pre[1])
    assert not pre[0].all()  # the overflow lane is flagged
    _assert_lane_parity(data)
    _assert_engine_exact(data, bytes(payload))


def test_pallas_dma_compact_big_call(monkeypatch):
    # Calls with >= 512K packed words take the Mosaic DMA-compaction
    # path (1024-word-quantized cumw, kernels/compact_dma.py) instead
    # of the dense gather.  Needs a real TPU (the DMA form is gated off
    # interpret mode); low-entropy ACGT noise yields ~1 M sequences in
    # one 128-lane call.
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("DMA compaction path is TPU-only")
    rng = np.random.default_rng(5)
    payload = rng.choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), 8 << 20
    ).tobytes()
    data = libzstd.compress(payload, 3, checksum=True)
    plan = build_batch_plan(data)
    assert int(plan.seq_nseq.sum()) >= (1 << 19)

    aligns = []
    orig = DeviceEngine._seq_pack_meta

    def spy(self, plan_, sel, nseq, align=1):
        aligns.append(align)
        return orig(self, plan_, sel, nseq, align=align)

    monkeypatch.setattr(DeviceEngine, "_seq_pack_meta", spy)
    eng = DeviceEngine(use_pallas=True)
    out = eng.decompress(data)
    assert out == payload
    assert eng.stats.fallback_frames == 0, eng.stats.fallback_reasons
    assert 1024 in aligns, aligns  # the DMA path actually engaged
