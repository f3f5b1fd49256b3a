"""Differential fuzzing against libzstd — the strengthened replacement
for the reference's libFuzzer no-panic harness
(/root/reference/zstd-decompressor/fuzz/fuzz_targets/fuzz_target_1.rs):
round-trips must be *bit-equal*, and corrupt inputs must raise typed
errors, never crash the process."""

import os
import random

import pytest

from zstd_tpu.runtime.oracle import decompress
from zstd_tpu.testing import libzstd
from zstd_tpu.utils.errors import ZstdError

pytestmark = pytest.mark.skipif(
    not libzstd.available(), reason="libzstd not available"
)


def _gen(rng: random.Random, n: int, kind: int) -> bytes:
    if kind == 0:
        return rng.randbytes(n)
    if kind == 1:
        return bytes(rng.choice(b"abcdef\n ") for _ in range(n))
    if kind == 2:
        return (b"the quick brown fox jumps over the lazy dog. " * (n // 45 + 1))[:n]
    if kind == 3:
        return bytes(rng.randrange(4) for _ in range(n))
    return b"".join(
        rng.randbytes(8) * rng.randrange(1, 9) for _ in range(n // 32 + 1)
    )[:n]


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_roundtrip_levels(level):
    rng = random.Random(1000 + level)
    for trial in range(12):
        n = rng.choice([0, 1, 5, 100, 1000, 30000, 150000])
        data = _gen(rng, n, rng.randrange(5))
        comp = libzstd.compress(data, level, checksum=rng.random() < 0.5)
        assert decompress(comp) == data


def test_high_level_big_window():
    rng = random.Random(7)
    data = _gen(rng, 300_000, 4)
    comp = libzstd.compress(data, 22, window_log=23)
    assert decompress(comp) == data


def _lib_try(data: bytes) -> bytes | None:
    try:
        return libzstd.decompress(data)
    except Exception:
        return None


def _ours_try(data: bytes) -> bytes | None:
    # ZstdError only: any other exception type is a bug, so let it
    # propagate and fail the test.
    try:
        return decompress(data)
    except ZstdError:
        return None


def test_corrupt_differential_accept_reject():
    # Stronger than no-panic: cross-check accept/reject AND bytes
    # against libzstd on the same mutated input.
    #  - both accept      -> outputs must be byte-equal
    #  - we accept alone  -> only legitimate because the stream carries
    #    a checksum that verified (decompress enforces it by default),
    #    so the decode is self-consistent even if libzstd is stricter
    #    about some structural rule.
    rng = random.Random(99)
    payload = _gen(rng, 5000, 1)
    base = libzstd.compress(payload, 3, checksum=True)
    accepted = rejected = 0
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        blob = bytes(data)
        ours = _ours_try(blob)
        theirs = _lib_try(blob)
        if ours is None:
            rejected += 1
        else:
            accepted += 1
        if ours is not None and theirs is not None:
            assert ours == theirs, "accepted stream decoded differently"
    assert rejected > 0  # mutations must actually be detected
    del accepted  # benign mutations are possible but not guaranteed


def test_truncations_differential():
    rng = random.Random(5)
    payload = _gen(rng, 5000, 2)
    base = libzstd.compress(payload, 6, checksum=True)
    for cut in range(0, len(base), 7):
        blob = base[:cut]
        ours = _ours_try(blob)
        theirs = _lib_try(blob)
        if ours is not None and theirs is not None:
            assert ours == theirs
        # A truncated checksummed stream must never silently decode to
        # the full payload's prefix without the checksum.
        if ours is not None and cut < len(base):
            assert theirs is not None or ours == payload


def test_garbage_raises():
    rng = random.Random(3)
    for _ in range(100):
        blob = rng.randbytes(rng.randrange(1, 200))
        try:
            decompress(blob)
        except ZstdError:
            pass
