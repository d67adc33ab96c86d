"""BitMagic wire-compatibility validation driver (COMPAT.md §5).

Usage (see tools/bm_validate.cpp for the full 3-step recipe):

    python tools/bm_validate.py dump  <dir>   # write fixture cases
    g++ -O2 -I $BM_INCLUDE tools/bm_validate.cpp -o /tmp/bmval && /tmp/bmval <dir>
    python tools/bm_validate.py check <dir>   # compare both directions

`dump` writes position sets spanning every encoder/decoder path this
repo implements (sparse arrays, GAP runs, dense blocks, intervals,
multi-block vectors, digest-friendly clustered bits) plus this repo's
own serialize() stream per case.  `check` then asserts that

  a. io/bitmagic.deserialize decodes every real-bm stream (levels 3-5,
     level 5 emits the bienc/digest0 opcodes self-rated medium-LOW
     confidence offline) to the exact position set, and
  b. real bm::deserialize recovered this repo's streams exactly.

This environment has no BitMagic and no network; the harness exists so
that validation is one command wherever the headers are available.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msweep_tpu.io import bitmagic  # noqa: E402


def _cases() -> list[tuple[int, np.ndarray]]:
    rng = np.random.default_rng(20260821)
    B = bitmagic.BLOCK_BITS
    cases = [
        (B, np.array([], dtype=np.uint64)),
        (B, np.array([0], dtype=np.uint64)),
        (B, np.array([65535], dtype=np.uint64)),
        (B, np.arange(100, 200, dtype=np.uint64)),  # interval
        (B, np.uint64(np.sort(rng.choice(B, 30, replace=False)))),  # sparse arr
        (B, np.uint64(np.sort(rng.choice(B, 500, replace=False)))),  # arr/GAP
        (B, np.uint64(np.sort(rng.choice(B, 40000, replace=False)))),  # dense
        # clustered bits (digest-friendly): a few hot 1024-bit waves
        (B, np.uint64(np.sort(np.concatenate([
            rng.choice(1024, 200, replace=False),
            20480 + rng.choice(1024, 300, replace=False),
        ])))),
        # multi-block with zero-run gaps
        (10 * B, np.uint64(np.sort(np.concatenate([
            rng.choice(B, 100, replace=False),
            7 * B + rng.choice(B, 200, replace=False),
        ])))),
        # alignment-shaped: reads x targets grid bits
        (1 << 20, np.uint64(np.sort(rng.choice(1 << 20, 5000, replace=False)))),
    ]
    return [(int(sz), pos.astype(np.uint64)) for sz, pos in cases]


def dump(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    for i, (size, pos) in enumerate(_cases()):
        arr = np.concatenate([
            np.array([size, len(pos)], dtype=np.uint64), pos
        ])
        arr.astype("<u8").tofile(os.path.join(d, f"case_{i}.pos"))
        stream = bitmagic.serialize(pos, size)
        with open(os.path.join(d, f"case_{i}.msweep.bin"), "wb") as f:
            f.write(stream)
    print(f"dumped {i + 1} cases to {d}")


def check(d: str) -> int:
    failures = 0
    for i, (size, pos) in enumerate(_cases()):
        for lvl in (3, 4, 5):
            path = os.path.join(d, f"case_{i}.bm.lvl{lvl}.bin")
            if not os.path.exists(path):
                print(f"case {i} lvl {lvl}: MISSING (run the C++ step)")
                failures += 1
                continue
            got, _ = bitmagic.deserialize(open(path, "rb").read())
            if not np.array_equal(got.astype(np.uint64), pos):
                print(f"case {i} lvl {lvl}: DECODE MISMATCH "
                      f"({len(got)} vs {len(pos)} positions)")
                failures += 1
            else:
                print(f"case {i} lvl {lvl}: ok")
        rt = os.path.join(d, f"case_{i}.roundtrip.pos")
        if os.path.exists(rt):
            raw = np.fromfile(rt, dtype="<u8")
            if raw[1] != len(pos) or not np.array_equal(raw[2:], pos):
                print(f"case {i}: bm::deserialize of OUR stream MISMATCH")
                failures += 1
            else:
                print(f"case {i}: bm round-trip of our stream ok")
        else:
            print(f"case {i}: roundtrip MISSING")
            failures += 1
    print("FAILED" if failures else "ALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) != 3 or sys.argv[1] not in ("dump", "check"):
        print(__doc__)
        sys.exit(2)
    if sys.argv[1] == "dump":
        dump(sys.argv[2])
    else:
        sys.exit(check(sys.argv[2]))
