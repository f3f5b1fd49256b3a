"""Frame/block/section parsing tests.

Re-derives the reference's handcrafted-bytes matrix
(/root/reference/zstd-decompressor/tests/frame.rs, tests/block.rs):
skippable frames, header field combinations, truncation errors, window
math, frame iteration over concatenated frames."""

import pytest

from zstd_tpu.format.block import BlockType, parse_block
from zstd_tpu.format.frame import (
    SkippableFrame,
    ZstdFrame,
    iter_frames,
    parse_frame,
    parse_frame_header,
)
from zstd_tpu.format.literals import LiteralsType, parse_literals_section
from zstd_tpu.format.sequences import parse_num_sequences
from zstd_tpu.utils.bits import ForwardByteCursor
from zstd_tpu.utils.errors import (
    NotEnoughBytes,
    ReservedBitSet,
    ReservedBlockType,
    UnrecognizedMagic,
    WindowTooLarge,
)


def fbc(*data) -> ForwardByteCursor:
    return ForwardByteCursor(bytes(data))


class TestFrameHeader:
    def test_minimal(self):
        # descriptor 0: no dict, no checksum, window descriptor follows.
        h = parse_frame_header(fbc(0x00, 0x00))
        assert h.window_size == 1 << 10
        assert not h.checksum_flag
        assert h.dict_id is None
        assert h.content_size is None

    def test_window_descriptor_math(self):
        # frame.rs:275-310 unit tests.
        assert parse_frame_header(fbc(0x00, 0x00)).window_size == 1 << 10
        assert parse_frame_header(fbc(0x00, 0x01)).window_size == (1 << 10) + 128
        assert (
            parse_frame_header(fbc(0x00, 0xFF)).window_size
            == (1 << 41) + 7 * (1 << 38)
        )

    def test_single_segment_fcs1(self):
        # single_segment with fcs_flag 0 -> 1-byte FCS; window = content.
        h = parse_frame_header(fbc(0b0010_0000, 42))
        assert h.single_segment and h.content_size == 42 and h.window_size == 42

    def test_fcs2_bias(self):
        # 2-byte FCS carries +256 bias.
        h = parse_frame_header(fbc(0b0110_0000, 0x00, 0x01))
        assert h.content_size == 256 + 256

    def test_fcs4_and_8(self):
        h = parse_frame_header(fbc(0b1010_0000, 1, 0, 0, 0))
        assert h.content_size == 1
        h = parse_frame_header(fbc(0b1110_0000, *([2] + [0] * 7)))
        assert h.content_size == 2

    def test_dict_id_sizes(self):
        for flag, size in ((1, 1), (2, 2), (3, 4)):
            payload = bytes([flag]) + b"\x00" + bytes(size)  # window desc + id
            h = parse_frame_header(ForwardByteCursor(payload))
            assert h.dict_id == 0

    def test_reserved_bit(self):
        with pytest.raises(ReservedBitSet):
            parse_frame_header(fbc(0b0000_1000, 0x00))

    def test_checksum_flag(self):
        assert parse_frame_header(fbc(0b0000_0100, 0x00)).checksum_flag


class TestFrameDispatch:
    def test_skippable(self):
        data = b"\x50\x2a\x4d\x18" + (3).to_bytes(4, "little") + b"abc"
        f = parse_frame(ForwardByteCursor(data))
        assert isinstance(f, SkippableFrame)
        assert bytes(f.payload) == b"abc"
        assert f.magic == 0x184D2A50

    def test_skippable_magic_range(self):
        for nibble in (0x1, 0x7, 0xF):
            magic = 0x184D2A50 | nibble
            data = magic.to_bytes(4, "little") + (0).to_bytes(4, "little")
            f = parse_frame(ForwardByteCursor(data))
            assert isinstance(f, SkippableFrame) and f.magic == magic

    def test_unknown_magic(self):
        with pytest.raises(UnrecognizedMagic):
            parse_frame(ForwardByteCursor(b"\x10\x11\x12\x13"))

    def test_truncated_magic(self):
        with pytest.raises(NotEnoughBytes):
            parse_frame(ForwardByteCursor(b"\x28\xb5"))

    def test_window_too_large(self):
        # descriptor byte 0, window descriptor exponent 30.
        data = b"\x28\xb5\x2f\xfd" + bytes([0x00, 0xF8])
        with pytest.raises(WindowTooLarge):
            parse_frame(ForwardByteCursor(data))

    def test_minimal_zstd_frame(self):
        # Raw block "abc", last=1: header = 1 | (0<<1) | (3<<3) = 0x19.
        data = b"\x28\xb5\x2f\xfd" + bytes([0x00, 0x00]) + bytes([0x19, 0, 0]) + b"abc"
        f = parse_frame(ForwardByteCursor(data))
        assert isinstance(f, ZstdFrame)
        assert len(f.blocks) == 1
        assert f.blocks[0].btype == BlockType.RAW
        assert bytes(f.blocks[0].data) == b"abc"

    def test_iterates_concatenated(self):
        one = b"\x28\xb5\x2f\xfd" + bytes([0x00, 0x00]) + bytes([0x19, 0, 0]) + b"abc"
        skip = b"\x50\x2a\x4d\x18" + (1).to_bytes(4, "little") + b"x"
        frames = list(iter_frames(one + skip + one))
        assert [type(f).__name__ for f in frames] == [
            "ZstdFrame",
            "SkippableFrame",
            "ZstdFrame",
        ]


class TestBlocks:
    def test_raw(self):
        desc, last = parse_block(fbc(0x19, 0, 0, *b"abc"))
        assert last and desc.btype == BlockType.RAW and bytes(desc.data) == b"abc"

    def test_rle(self):
        # type=1, size=5 (the *regenerated* count), one payload byte.
        header = 0 | (1 << 1) | (5 << 3)
        desc, last = parse_block(fbc(*header.to_bytes(3, "little"), 0x42))
        assert not last
        assert desc.btype == BlockType.RLE
        assert desc.rle_byte == 0x42 and desc.rle_repeat == 5

    def test_reserved(self):
        header = 1 | (3 << 1) | (1 << 3)
        with pytest.raises(ReservedBlockType):
            parse_block(fbc(*header.to_bytes(3, "little"), 0x00))

    def test_truncated(self):
        with pytest.raises(NotEnoughBytes):
            parse_block(fbc(0x19, 0))


class TestLiteralsHeader:
    def test_raw_5bit(self):
        d = parse_literals_section(fbc((3 << 3) | 0, *b"abc"))
        assert d.ltype == LiteralsType.RAW and bytes(d.data) == b"abc"

    def test_raw_12bit(self):
        n = 300
        b0 = ((n & 0xF) << 4) | (1 << 2) | 0
        d = parse_literals_section(ForwardByteCursor(bytes([b0, n >> 4]) + bytes(n)))
        assert d.regenerated_size == n

    def test_raw_20bit(self):
        n = 70000
        b0 = ((n & 0xF) << 4) | (3 << 2) | 0
        data = bytes([b0, (n >> 4) & 0xFF, n >> 12]) + bytes(n)
        d = parse_literals_section(ForwardByteCursor(data))
        assert d.regenerated_size == n

    def test_rle(self):
        b0 = (7 << 3) | (0 << 2) | 1
        d = parse_literals_section(fbc(b0, 0x61))
        assert d.ltype == LiteralsType.RLE
        assert d.regenerated_size == 7 and d.rle_byte == 0x61


class TestNumSequences:
    def test_forms(self):
        assert parse_num_sequences(fbc(0)) == 0
        assert parse_num_sequences(fbc(77)) == 77
        assert parse_num_sequences(fbc(128, 0)) == 0
        assert parse_num_sequences(fbc(130, 5)) == (2 << 8) + 5
        # Long form: 0xFF then le16 + 0x7F00 (RFC; the reference adds
        # only 0x7F, sequences.rs:84).
        assert parse_num_sequences(fbc(255, 0x34, 0x12)) == 0x1234 + 0x7F00
