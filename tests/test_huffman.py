"""Huffman table and literals-stream tests.

Covers the direct-weights and FSE-compressed-weights paths
(/root/reference/zstd-decompressor/tests/decoders/huffman.rs) plus the
flat-table decode against the reference's "BABCBB" worked example
(tests/parsing.rs:205-218) and the power-of-two weight-sum case the
reference mishandles."""

import pytest

from zstd_tpu.ops.huffman import (
    build_huffman_table,
    decode_literals_stream,
    parse_huffman_weights,
)
from zstd_tpu.utils.bits import ForwardByteCursor
from zstd_tpu.utils.errors import CorruptedHuffman


def test_flat_table_simple():
    # Weights (A=2, B=?, C=2): explicit [2, 0, 2] -> wsum 4, max_bits 3?
    # Use the classic A:2bits B:1bit C:2bits tree: weights A=1, C=1,
    # implied B=2 (wsum=2 -> max_bits 2, rest 2 -> last weight 2).
    t = build_huffman_table([1, 0, 1])
    assert t.max_bits == 2
    # Canonical: longest codes first from index 0: A (len 2), C (len 2),
    # then B (len 1).
    assert list(t.symbol) == [0, 2, 3, 3]
    assert list(t.nbits) == [2, 2, 1, 1]


def test_stream_decode_golden():
    # Analog of the reference's end-to-end "BABCBB" tree-walk test
    # (tests/parsing.rs:205-218), on the flat table.  Codes (MSB-first):
    # sym0='00', sym2='01', sym3='1'.  Stream I=0x0164, sentinel at bit 8,
    # payload bits 7..0 = 0,1,1,0,0,1,0,0 -> 01|1|00|1|00.
    t = build_huffman_table([1, 0, 1])
    out = bytearray()
    decode_literals_stream(t, bytes([0b0110_0100, 0b0000_0001]), out)
    assert list(out) == [2, 3, 0, 3, 0]


def test_direct_weights_parse():
    # Header >= 128: direct 4-bit weights, high nibble first.
    cur = ForwardByteCursor(bytes([127 + 3, 0x12, 0x30]))
    assert parse_huffman_weights(cur) == [1, 2, 3]


def test_power_of_two_weight_sum():
    # Explicit weights sum to an exact power of two: implied last symbol
    # carries half the total (the reference errors here, huffman.rs:184-190).
    t = build_huffman_table([1, 1])  # wsum=2 -> max_bits=2, last weight 2
    assert t.max_bits == 2
    assert list(t.nbits) == [2, 2, 1, 1]
    assert list(t.symbol) == [0, 1, 2, 2]


def test_large_missing_weight():
    # Completion delta > 255 — the reference truncates to u8 (huffman.rs:190).
    # weights: one symbol with weight 11 -> wsum 1024 -> max_bits 11,
    # rest 1024 -> last weight 11.
    t = build_huffman_table([11])
    assert t.max_bits == 11
    assert list(t.weights) == [11, 11]


def test_corrupt_weights():
    with pytest.raises(CorruptedHuffman):
        build_huffman_table([])  # no weights
    with pytest.raises(CorruptedHuffman):
        build_huffman_table([0, 0, 0])  # all-zero weights


def test_weights_sum_non_power_remainder():
    with pytest.raises(CorruptedHuffman):
        build_huffman_table([2, 2, 1])  # wsum 5 -> rest 3, not a power of 2


def test_fse_weights_zero_bit_loop_bounded():
    # Crafted weights-FSE table where one symbol has probability 2^AL:
    # every state then reads 0 bits, and an unbounded drain loop would
    # spin forever appending weights (round-1 advisor finding).  Must
    # raise CorruptedHuffman at the RFC 8878 §4.2.1.2 255-weight cap.
    from zstd_tpu.ops.huffman import decode_fse_weights

    with pytest.raises(CorruptedHuffman):
        decode_fse_weights(bytes([0xF0, 0x03, 0xFF, 0x07]))
