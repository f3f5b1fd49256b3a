"""CLI tests (reference parity: /root/reference/src/main.rs:7-25).

Covers the four reference flags plus the raw-byte output fix and the
r2 ``--info`` entropy-table dump (the reference pretty-prints the fully
parsed frame including the Huffman decoder, main.rs:35-40)."""

import io
import sys

import pytest

from zstd_tpu.cli import main

ROMEO = "/root/reference/resources/romeo.txt.zst"
SKIPPABLES = "/root/reference/resources/skippables.zst"


def _run(capsys, *argv) -> tuple[int, str]:
    rc = main(list(argv))
    out = capsys.readouterr().out
    return rc, out


def test_info_dumps_huffman_weights(corpus, capsys):
    rc, out = _run(capsys, ROMEO, "--info")
    assert rc == 0
    assert "ZStandard" in out
    assert "huffman: max_bits=8" in out
    assert "weights: [" in out
    assert "codes:" in out
    # FSE table summaries for the three sequence-code tables.
    assert "ll_table: fse(accuracy_log=6" in out
    assert "of_table: fse(accuracy_log=5" in out
    assert "ml_table: fse(accuracy_log=5" in out


def test_info_skippable(corpus, capsys):
    rc, out = _run(capsys, SKIPPABLES, "--info")
    assert rc == 0
    assert out.count("Skippable") == 2


def test_decode_to_file(corpus, tmp_path, capsys):
    from zstd_tpu.testing import libzstd

    if not libzstd.available():
        pytest.skip("libzstd not available")
    out_path = tmp_path / "out.bin"
    rc = main([ROMEO, "-o", str(out_path)])
    assert rc == 0
    assert out_path.read_bytes() == libzstd.decompress(open(ROMEO, "rb").read())


def test_print_skippable_payload(corpus, tmp_path):
    out_path = tmp_path / "skip.bin"
    rc = main([SKIPPABLES, "--print-skippable", "-o", str(out_path)])
    assert rc == 0
    assert out_path.read_bytes() == bytes([0x10, 0x20, 0x30, 0x42])
    # Without the flag skippable payloads are dropped.
    rc = main([SKIPPABLES, "-o", str(out_path)])
    assert rc == 0
    assert out_path.read_bytes() == b""


def test_corrupt_input_exits_nonzero(corpus, tmp_path, capsys):
    data = bytearray(open(ROMEO, "rb").read())
    data[len(data) // 2] ^= 0x55
    p = tmp_path / "corrupt.zst"
    p.write_bytes(bytes(data))
    rc = main([str(p), "-o", str(tmp_path / "x.bin")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "error:" in err and "Traceback" not in err


def test_report_flag_emits_json(corpus, tmp_path, capsys):
    import json

    rc = main([ROMEO, "--device", "--report", "-o", str(tmp_path / "r.bin")])
    assert rc == 0
    err = capsys.readouterr().err
    line = [ln for ln in err.splitlines() if ln.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["bytes_out"] == 942
    assert rep["kernel_calls"] >= 1
    assert "total" in rep["wall_s"]
