"""Test configuration.

Tests run on the default JAX platform (the real TPU chip when present,
CPU otherwise).  Multi-chip sharding is exercised separately in
tests/test_parallel.py, which re-launches itself in a subprocess with a
virtual 8-device CPU mesh (``xla_force_host_platform_device_count``) —
the SURVEY.md §4 pattern — because the platform must be chosen before
JAX initializes and the suite may already hold a TPU.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

CORPUS_DIR = pathlib.Path("/root/reference/resources")
CORPUS_FILES = [
    "welcome.zst",
    "romeo.txt.zst",
    "romeo3.txt.zst",
    "skippables.zst",
    "moby-dick.txt.zst",
]


@pytest.fixture(scope="session")
def corpus():
    """The reference's bundled .zst corpus as {name: bytes}."""
    if not CORPUS_DIR.is_dir():
        pytest.skip("reference corpus not available")
    return {name: (CORPUS_DIR / name).read_bytes() for name in CORPUS_FILES}
