"""Committed golden-output test of the full CLI (VERDICT round-1 item 7).

The inputs AND expected outputs live in tests/golden/ (generated once
with --precision double on the CPU backend; see the recipe in this
file's history / docs/example.md).  This pins the end-to-end file
contract: EC ordering (hash order), 6-sig-digit formatting, headers,
and the double-precision optimizer trajectory (iteration count).
"""

import os
import subprocess
import sys

import numpy as np

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
EXPECTED_ITERS = 7


def _parse_probs(text):
    lines = [l for l in text.strip().splitlines() if l]
    header = lines[0]
    ids, vals = [], []
    for l in lines[1:]:
        parts = l.split("\t")
        ids.append(int(parts[0]))
        vals.append([float(v) for v in parts[1:]])
    return header, ids, np.array(vals)


def test_cli_golden_outputs(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(GOLD).rsplit("/tests", 1)[0]
    r = subprocess.run(
        [
            sys.executable, "-m", "msweep_tpu.cli",
            "--themisto-1", os.path.join(GOLD, "s1.txt"),
            "--themisto-2", os.path.join(GOLD, "s2.txt"),
            "-i", os.path.join(GOLD, "clustering.txt"),
            "-o", str(tmp_path / "run"),
            "--precision", "double", "--write-probs", "--verbose",
            "--backend", "cpu",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr

    # double-precision trajectory is pinned: identical iteration count
    assert f"finished after {EXPECTED_ITERS} iterations" in r.stderr

    got = open(tmp_path / "run_abundances.txt").read()
    want = open(os.path.join(GOLD, "golden_abundances.txt")).read()
    assert got == want  # byte-for-byte, including headers and formatting

    gh, gi, gv = _parse_probs(open(tmp_path / "run_probs.tsv").read())
    wh, wi, wv = _parse_probs(open(os.path.join(GOLD, "golden_probs.tsv")).read())
    assert gh == wh
    assert gi == wi  # EC ordering (ascending pattern-hash) is pinned
    np.testing.assert_allclose(gv, wv, atol=5e-6)
