#!/usr/bin/env python3
"""Differential fuzz harness.

Successor to the reference's libFuzzer target
(/root/reference/zstd-decompressor/fuzz/fuzz_targets/fuzz_target_1.rs),
with a stronger contract: round-trips must be byte-equal to libzstd,
corrupt/truncated/garbage inputs must raise typed ZstdError — never
crash, hang, or return wrong bytes silently.

Usage:  python tools/fuzz.py [--iterations N] [--seed S] [--engine]
"""

from __future__ import annotations

import argparse
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from zstd_tpu import encode  # noqa: E402
from zstd_tpu.runtime.oracle import decompress  # noqa: E402
from zstd_tpu.testing import libzstd  # noqa: E402
from zstd_tpu.utils.errors import ZstdError  # noqa: E402


def gen_payload(rng: random.Random) -> bytes:
    n = rng.choice([0, 1, 7, 100, 1000, 5000, 40_000, 200_000, 500_000])
    kind = rng.randrange(6)
    if kind == 0:
        return rng.randbytes(n)
    if kind == 1:
        return bytes(rng.choice(b"abcdefgh \n") for _ in range(n))
    if kind == 2:
        return (b"repetitive payload unit! " * (n // 25 + 1))[:n]
    if kind == 3:
        return bytes(rng.randrange(3) for _ in range(n))
    if kind == 4:
        return b"".join(
            rng.randbytes(rng.randrange(1, 16)) * rng.randrange(1, 20)
            for _ in range(n // 64 + 1)
        )[:n]
    return bytes(n)  # zeros


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--engine", action="store_true", help="also run the device engine"
    )
    args = ap.parse_args()
    rng = random.Random(args.seed)

    engine = None
    if args.engine:
        from zstd_tpu.runtime.engine import DeviceEngine

        engine = DeviceEngine()

    failures = 0
    for it in range(args.iterations):
        payload = gen_payload(rng)
        mode = rng.randrange(4)
        try:
            if mode == 0:  # libzstd round-trip
                comp = libzstd.compress(
                    payload, rng.choice([1, 3, 6, 12, 19]), checksum=rng.random() < 0.5
                )
                assert decompress(comp) == payload
                if engine:
                    assert engine.decompress(comp) == payload
            elif mode == 1:  # our encoder, both decoders
                comp = encode.compress(payload, 3, checksum=True)
                assert decompress(comp) == payload
                assert libzstd.decompress(comp) == payload
            elif mode == 2:  # mutation: typed error or valid output
                comp = bytearray(libzstd.compress(payload, 3, checksum=True))
                if comp:
                    for _ in range(rng.randrange(1, 5)):
                        comp[rng.randrange(len(comp))] ^= 1 << rng.randrange(8)
                try:
                    decompress(bytes(comp))
                except ZstdError:
                    pass
            else:  # truncation / garbage
                blob = libzstd.compress(payload, 3)[: rng.randrange(0, 64)]
                blob += rng.randbytes(rng.randrange(0, 32))
                try:
                    decompress(blob)
                except ZstdError:
                    pass
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"[{it}] FAILURE mode={mode} len={len(payload)}: {type(e).__name__}: {e}")
    print(f"{args.iterations} iterations, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
