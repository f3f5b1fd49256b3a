"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh (SURVEY.md §4's
"pattern to replicate on TPU"): the JAX platform is forced to CPU with
``xla_force_host_platform_device_count=8`` so multi-chip sharding logic
is exercised without TPU hardware.  These env vars must be set before
JAX is first imported, hence here.
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
