"""FSE table tests — golden vectors from the reference's test suite
(/root/reference/zstd-decompressor/tests/decoders/fse.rs), which are
themselves RFC 8878 worked examples."""

import numpy as np
import pytest

from zstd_tpu.ops import fse
from zstd_tpu.utils.bits import ForwardBitCursor
from zstd_tpu.utils.errors import AccuracyLogTooLarge, CorruptedTable


def test_parse_distribution_golden():
    # tests/decoders/fse.rs:7-16
    cur = ForwardBitCursor(bytes([0x30, 0x6F, 0x9B, 0x03]))
    al, dist = fse.parse_fse_distribution(cur)
    assert al == 5
    assert dist == [18, 6, 2, 2, 2, 1, 1]
    assert len(cur) == 6


def test_table_golden_state():
    # tests/decoders/fse.rs:19-29 — state 0x0c of the parsed table.
    t = fse.build_fse_table(5, [18, 6, 2, 2, 2, 1, 1])
    assert t.symbol[0x0C] == 1
    assert t.baseline[0x0C] == 0x18
    assert t.nbits[0x0C] == 3


def test_table_golden_state_2():
    # tests/decoders/fse.rs:32-58 — larger parsed table.
    data = bytes(
        [0x21, 0x9D, 0x51, 0xCC, 0x18, 0x42, 0x44, 0x81, 0x8C, 0x94, 0xB4, 0x50, 0x1E]
    )
    t = fse.parse_fse_table(ForwardBitCursor(data))
    assert (t.symbol[0x3F], t.baseline[0x3F], t.nbits[0x3F]) == (24, 0x10, 4)
    assert (t.symbol[0x2C], t.baseline[0x2C], t.nbits[0x2C]) == (0, 0x34, 2)


def test_table_invariants():
    t = fse.build_fse_table(5, [18, 6, 2, 2, 2, 1, 1])
    size = t.size
    # Per symbol, its states' next-state ranges partition [0, size).
    for sym in np.unique(t.symbol):
        states = np.flatnonzero(t.symbol == sym)
        ranges = sorted(
            (int(t.baseline[s]), int(t.baseline[s]) + (1 << int(t.nbits[s])))
            for s in states
        )
        expect = 0
        for lo, hi in ranges:
            assert lo == expect
            expect = hi
        assert expect == size


def test_predefined_tables():
    # Predefined distributions build to the documented sizes (RFC tables).
    assert fse.PREDEFINED_LL_TABLE.size == 64
    assert fse.PREDEFINED_OF_TABLE.size == 32
    assert fse.PREDEFINED_ML_TABLE.size == 64
    # Spot-check the RFC's published LL table: state 0 -> symbol 0,
    # 4 bits, baseline 0 (RFC 8878 appendix A).
    t = fse.PREDEFINED_LL_TABLE
    assert t.symbol[0] == 0


def test_accuracy_log_cap():
    with pytest.raises(AccuracyLogTooLarge):
        fse.build_fse_table(10, [1 << 10])
    cur = ForwardBitCursor(bytes([0x0F, 0xFF, 0xFF]))  # AL field 15 -> 20
    with pytest.raises(AccuracyLogTooLarge):
        fse.parse_fse_distribution(cur)


def test_corrupt_distribution():
    with pytest.raises(CorruptedTable):
        fse.build_fse_table(5, [18, 6, 2, 2, 2, 1])  # sums to 31


def test_full_probability_single_symbol():
    # Degenerate: one symbol holds the whole table -> 0 bits per step.
    t = fse.build_fse_table(5, [32])
    assert (t.symbol == 0).all()
    assert (t.nbits == 0).all()
