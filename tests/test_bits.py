"""Bit/byte cursor tests.

Covers the reference's integration matrix for its three parsers
(/root/reference/zstd-decompressor/tests/parsing.rs) re-derived for the
copy-free cursor design, including the ``take(0)`` backward-stream
regression (tests/parsing.rs:349-358).
"""

import pytest

from zstd_tpu.utils.bits import (
    BackwardBitCursor,
    ForwardBitCursor,
    ForwardByteCursor,
    backward_start_bitpos,
)
from zstd_tpu.utils.errors import (
    EmptyInput,
    MissingSentinel,
    NotEnoughBits,
    NotEnoughBytes,
)


class TestForwardByteCursor:
    def test_u8_and_len(self):
        c = ForwardByteCursor(b"\x01\x02")
        assert len(c) == 2
        assert c.u8() == 1
        assert c.u8() == 2
        assert c.is_empty
        with pytest.raises(NotEnoughBytes):
            c.u8()

    def test_slice(self):
        c = ForwardByteCursor(b"abcdef")
        assert bytes(c.slice(3)) == b"abc"
        assert bytes(c.slice(0)) == b""
        assert bytes(c.slice(3)) == b"def"
        with pytest.raises(NotEnoughBytes):
            c.slice(1)

    def test_le_ints(self):
        c = ForwardByteCursor(b"\x34\x12\x78\x56\x34\x12")
        assert c.le_u16() == 0x1234
        assert c.le_u32() == 0x12345678
        with pytest.raises(NotEnoughBytes):
            c.le_u32()


class TestForwardBitCursor:
    def test_lsb_first(self):
        # 0b10110101 read LSB-first: 1,0,1,0,1,1,0,1
        c = ForwardBitCursor(b"\xb5")
        assert c.take(1) == 1
        assert c.take(2) == 0b10
        assert c.take(5) == 0b10110
        assert c.is_empty

    def test_cross_byte(self):
        c = ForwardBitCursor(b"\x34\x12")
        assert c.take(16) == 0x1234

    def test_peek_does_not_consume(self):
        c = ForwardBitCursor(b"\xff\x00")
        assert c.peek(4) == 0xF
        assert c.take(4) == 0xF

    def test_bytes_read_partial(self):
        c = ForwardBitCursor(b"\xaa\xbb\xcc")
        c.take(3)
        assert c.bytes_read() == 1
        c.take(5)
        assert c.bytes_read() == 1
        c.take(1)
        assert c.bytes_read() == 2

    def test_not_enough_bits(self):
        c = ForwardBitCursor(b"\x01")
        with pytest.raises(NotEnoughBits):
            c.take(9)

    def test_empty_input(self):
        with pytest.raises(EmptyInput):
            ForwardBitCursor(b"")


class TestBackwardBitCursor:
    def test_sentinel_skip(self):
        # Last byte 0b0001_0000 -> sentinel at bit 4 of last byte.
        assert backward_start_bitpos(b"\xff\x10") == 8 + 4

    def test_msb_first_backward(self):
        # Stream: 0b0110_1001 0b1000_0000; sentinel = bit 7 of last byte.
        # Reads then proceed MSB-first through the previous byte.
        # I = 0x8069; bits below the sentinel are read MSB-first downward.
        c = BackwardBitCursor(b"\x69\x80")
        assert len(c) == 15
        assert c.take(4) == 0b0000  # bits 14..11
        assert c.take(4) == 0b0000  # bits 10..7
        assert c.take(4) == 0b1101  # bits 6..3 of 0x69
        assert c.take(3) == 0b001  # bits 2..0
        assert c.is_empty

    def test_take_zero_regression(self):
        # tests/parsing.rs:349-358 — take(0) must not crash and return 0.
        c = BackwardBitCursor(b"\x01")
        assert c.take(0) == 0
        assert len(c) == 0

    def test_value_matches_shift_model(self):
        # take(n) == (I >> (pos - n)) & mask over the LE integer.
        data = bytes([0x12, 0x34, 0x56, 0xF8])
        big = int.from_bytes(data, "little")
        c = BackwardBitCursor(data)
        pos = backward_start_bitpos(data)
        for n in (3, 7, 11, 1, 8):
            pos -= n
            assert c.take(n) == (big >> pos) & ((1 << n) - 1)

    def test_errors(self):
        with pytest.raises(EmptyInput):
            BackwardBitCursor(b"")
        with pytest.raises(MissingSentinel):
            BackwardBitCursor(b"\xff\x00")
        c = BackwardBitCursor(b"\x01")
        with pytest.raises(NotEnoughBits):
            c.take(1)

    def test_peek_padded(self):
        c = BackwardBitCursor(b"\x07")  # sentinel bit 2, payload bits "11"
        assert c.peek_padded(8) == 0b11000000
