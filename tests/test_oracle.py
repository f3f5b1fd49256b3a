"""End-to-end host-oracle decode tests: the reference's bundled corpus,
bit-exact against libzstd, plus checksum and edge-case behavior.

This closes the reference's test gap — its corpus files were only ever
exercised manually via the CLI (SURVEY.md §4)."""

import pytest

from zstd_tpu.format.frame import SkippableFrame, iter_frames
from zstd_tpu.runtime.oracle import decompress
from zstd_tpu.testing import libzstd
from zstd_tpu.utils.errors import ChecksumMismatch

pytestmark = pytest.mark.skipif(
    not libzstd.available(), reason="libzstd not available"
)


def test_corpus_bit_exact(corpus):
    for name, data in corpus.items():
        assert decompress(data) == libzstd.decompress(data), name


def test_corpus_skippable_payloads(corpus):
    # skippables.zst: two skippable frames; payloads surface only with
    # include_skippable (CLI --print-skippable).
    data = corpus["skippables.zst"]
    frames = list(iter_frames(data))
    assert len(frames) == 2
    assert all(isinstance(f, SkippableFrame) for f in frames)
    assert decompress(data) == b""
    with_skip = decompress(data, include_skippable=True)
    assert with_skip == b"".join(bytes(f.payload) for f in frames)


def test_welcome_has_skippable_prefix(corpus):
    frames = list(iter_frames(corpus["welcome.zst"]))
    assert isinstance(frames[0], SkippableFrame)
    assert frames[0].magic == 0x184D2A57


def test_checksum_verified(corpus):
    # romeo.txt.zst carries a content checksum; flipping an output-
    # affecting byte must raise (or fail parsing), not warn.
    data = bytearray(corpus["romeo.txt.zst"])
    out = decompress(bytes(data))  # baseline decodes fine
    assert len(out) == 942
    data[-40] ^= 0xFF  # corrupt inside the last block's payload
    with pytest.raises(Exception):
        decompress(bytes(data))


def test_checksum_flag_roundtrip():
    payload = b"checksum me " * 100
    comp = libzstd.compress(payload, 3, checksum=True)
    assert decompress(comp) == payload
    # Flip a bit in the stored checksum itself (last 4 bytes).
    bad = comp[:-1] + bytes([comp[-1] ^ 1])
    with pytest.raises(ChecksumMismatch):
        decompress(bad)
    assert decompress(bad, verify_checksum=False) == payload


def test_non_utf8_output():
    # The reference CLI panics on non-UTF-8 output (src/main.rs:55-57);
    # we must return raw bytes.
    payload = bytes(range(256)) * 16
    comp = libzstd.compress(payload, 3)
    assert decompress(comp) == payload


def test_empty_input():
    assert decompress(b"") == b""


def test_empty_frame():
    comp = libzstd.compress(b"", 3)
    assert decompress(comp) == b""


def test_multi_frame_concat():
    a = libzstd.compress(b"hello " * 50, 5, checksum=True)
    b = libzstd.compress(bytes(1000), 1)
    assert decompress(a + b) == b"hello " * 50 + bytes(1000)
