"""Repeat-offset resolution and LZ77 execution tests.

Golden case from the reference's embedded unit test
(/root/reference/zstd-decompressor/src/decoding_context.rs:109-122) plus
the RFC repeat-offset corner cases."""

import pytest

from zstd_tpu.ops.lz77 import copy_match, execute_sequences
from zstd_tpu.ops.sequence_codes import (
    INITIAL_REPEAT_OFFSETS,
    resolve_offset,
)
from zstd_tpu.utils.errors import ImpossibleValue, NullOffset


def test_execute_sequences_golden():
    # decoding_context.rs:109-122: overlapping match + trailing literals.
    out = bytearray()
    rep = list(INITIAL_REPEAT_OFFSETS)
    execute_sequences(
        out,
        [(3, 5, 3), (2, 11, 1)],
        bytes([0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68]),
        rep,
    )
    assert list(out) == [
        0x61, 0x62, 0x63, 0x62, 0x63, 0x62, 0x64, 0x65, 0x61, 0x66, 0x67, 0x68,
    ]


def test_copy_match_overlap():
    out = bytearray(b"ab")
    copy_match(out, 2, 7)  # period 2 replication
    assert bytes(out) == b"ababababa"


def test_copy_match_non_overlap():
    out = bytearray(b"abcdef")
    copy_match(out, 4, 3)
    assert bytes(out) == b"abcdefcde"


def test_copy_match_bad_offset():
    with pytest.raises(ImpossibleValue):
        copy_match(bytearray(b"ab"), 3, 1)


class TestResolveOffset:
    def test_new_offset(self):
        rep = [1, 4, 8]
        assert resolve_offset(10, 5, rep) == 7
        assert rep == [7, 1, 4]

    def test_repeat1(self):
        rep = [11, 4, 8]
        assert resolve_offset(1, 5, rep) == 11
        assert rep == [11, 4, 8]

    def test_repeat2(self):
        rep = [11, 4, 8]
        assert resolve_offset(2, 5, rep) == 4
        assert rep == [4, 11, 8]

    def test_repeat3(self):
        rep = [11, 4, 8]
        assert resolve_offset(3, 5, rep) == 8
        assert rep == [8, 11, 4]

    def test_ll0_shifts(self):
        # literals_length == 0 shifts the repeat index by one.
        rep = [11, 4, 8]
        assert resolve_offset(1, 0, rep) == 4
        assert rep == [4, 11, 8]

        rep = [11, 4, 8]
        assert resolve_offset(2, 0, rep) == 8
        assert rep == [8, 11, 4]

        rep = [11, 4, 8]
        assert resolve_offset(3, 0, rep) == 10  # rep[0] - 1
        assert rep == [10, 11, 4]

    def test_ll0_rep_minus_one_underflow(self):
        with pytest.raises(NullOffset):
            resolve_offset(3, 0, [1, 4, 8])

    def test_zero_offset(self):
        with pytest.raises(NullOffset):
            resolve_offset(0, 5, [1, 4, 8])
