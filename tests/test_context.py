"""Checkpoint/resume of the decoding context — serializing the complete
inter-block state (output, repeat offsets, cached Huffman table, cached
sequence tables) and resuming a decode mid-frame (SURVEY.md §5,
checkpoint/resume)."""

import pytest

from zstd_tpu.format.frame import ZstdFrame, iter_frames
from zstd_tpu.runtime.context import DecodingContext
from zstd_tpu.runtime.oracle import decode_block, decode_frame
from zstd_tpu.testing import libzstd

pytestmark = pytest.mark.skipif(
    not libzstd.available(), reason="libzstd not available"
)


def _multiblock_frame() -> ZstdFrame:
    # Force multiple compressed blocks: > 128 KiB of compressible data.
    data = (b"block spanning payload #%d " * 2000) % tuple(range(2000))
    data = data * 4
    comp = libzstd.compress(data, 3)
    frame = next(iter_frames(comp))
    assert isinstance(frame, ZstdFrame) and len(frame.blocks) >= 2
    return frame


def test_checkpoint_mid_frame_resume():
    frame = _multiblock_frame()
    expected = decode_frame(frame, verify_checksum=False)

    # Decode the first half of the blocks, checkpoint, resume in a fresh
    # context, and compare against the straight-through decode.
    half = len(frame.blocks) // 2
    ctx = DecodingContext(window_size=frame.header.window_size)
    for b in frame.blocks[:half]:
        decode_block(b, ctx)
    state = ctx.state_dict()

    resumed = DecodingContext.from_state_dict(state)
    assert resumed.rep == ctx.rep
    assert bytes(resumed.output) == bytes(ctx.output)
    for b in frame.blocks[half:]:
        decode_block(b, resumed)
    assert bytes(resumed.output) == expected


def test_state_dict_roundtrip_tables():
    frame = _multiblock_frame()
    ctx = DecodingContext(window_size=frame.header.window_size)
    for b in frame.blocks[: len(frame.blocks) // 2 + 1]:
        decode_block(b, ctx)
    state = ctx.state_dict()
    resumed = DecodingContext.from_state_dict(state)
    if ctx.huffman is not None:
        assert resumed.huffman is not None
        assert (resumed.huffman.symbol == ctx.huffman.symbol).all()
        assert (resumed.huffman.nbits == ctx.huffman.nbits).all()
    for a, b in [
        (ctx.ll_spec, resumed.ll_spec),
        (ctx.of_spec, resumed.of_spec),
        (ctx.ml_spec, resumed.ml_spec),
    ]:
        assert (a is None) == (b is None)
        if a is not None:
            assert a.kind == b.kind and a.rle_byte == b.rle_byte
            if a.fse_table is not None:
                assert (a.fse_table.symbol == b.fse_table.symbol).all()
