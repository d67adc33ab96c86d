"""Binning semantics tests (VERDICT round-1 item 8; COMPAT.md section 4).

The rule (core/binning.py, reconstructed from the mGEMS paper + the call
contract at /root/reference/src/mSWEEP.cpp:437-469): EC e goes to bin g
iff gamma_eg >= theta_g, multi-assignment allowed.  Covered here:
hand-computed toy equality, overlap (one read in several bins), unknown
--target-groups names, zero-abundance targets, and --min-abundance
filtering — both at the library level and through the CLI.
"""

import numpy as np
import pytest

from msweep_tpu.core.alignment import CollapsedAlignment
from msweep_tpu.core.binning import bin_reads, filter_target_groups
from msweep_tpu.cli import main


def _toy_aln():
    """3 ECs: EC0 = reads {0, 3}, EC1 = reads {1}, EC2 = reads {2, 4, 5}."""
    return CollapsedAlignment(
        n_targets=4,
        n_reads=6,
        ec_counts=np.array([2, 1, 3]),
        ec_pattern_targets=np.array([0, 1, 2, 3]),
        ec_pattern_ptr=np.array([0, 2, 3, 4]),
        ec_read_ids=np.array([0, 3, 1, 2, 4, 5], dtype=np.uint32),
        ec_read_ptr=np.array([0, 2, 3, 6]),
    )


def test_hand_computed_toy():
    aln = _toy_aln()
    names = ["gA", "gB"]
    theta = np.array([0.4, 0.5])
    # posteriors (rows = ECs): gamma = log(probs)
    probs = np.array([
        [0.5, 0.5],   # EC0: 0.5 >= 0.4 and 0.5 >= 0.5 -> both bins (overlap)
        [0.9, 0.1],   # EC1: only gA (0.1 < 0.5)
        [0.1, 0.9],   # EC2: only gB (0.1 < 0.4)
    ])
    bins = bin_reads(aln, np.log(probs), theta, names, names)
    np.testing.assert_array_equal(bins["gA"], [0, 1, 3])        # EC0 + EC1
    np.testing.assert_array_equal(bins["gB"], [0, 2, 3, 4, 5])  # EC0 + EC2


def test_overlap_reads_in_multiple_bins():
    aln = _toy_aln()
    theta = np.array([0.3, 0.3])
    probs = np.full((3, 2), 0.5)  # everything clears both thresholds
    bins = bin_reads(aln, np.log(probs), theta, ["a", "b"], ["a", "b"])
    np.testing.assert_array_equal(bins["a"], np.arange(6))
    np.testing.assert_array_equal(bins["b"], np.arange(6))


def test_threshold_is_inclusive():
    aln = _toy_aln()
    theta = np.array([0.5, 0.5])
    probs = np.array([[0.5, 0.49999], [0.5, 0.5], [0.25, 0.75]])
    bins = bin_reads(aln, np.log(probs), theta, ["a", "b"], ["a", "b"])
    # gamma >= theta: EC0 a only; EC1 both; EC2 b only
    np.testing.assert_array_equal(bins["a"], [0, 1, 3])
    np.testing.assert_array_equal(bins["b"], [1, 2, 4, 5])


def test_unknown_target_group_errors():
    aln = _toy_aln()
    with pytest.raises(ValueError, match="not among the estimated groups"):
        bin_reads(aln, np.log(np.full((3, 2), 0.5)), np.array([0.5, 0.5]),
                  ["a", "b"], ["a", "nosuch"])


def test_zero_abundance_target_bins_nothing():
    aln = _toy_aln()
    theta = np.array([1.0, 0.0])
    probs = np.array([[1.0, 1e-30], [1.0, 1e-30], [1.0, 1e-30]])
    bins = bin_reads(aln, np.log(probs), theta, ["a", "b"], ["a", "b"])
    np.testing.assert_array_equal(bins["a"], np.arange(6))
    # threshold 0.0 is cleared by ANY probability (>= 0): the zero-
    # abundance group binds everything — this is why mSWEEP applies
    # FilterTargetGroups first (src/mSWEEP.cpp:444-446).
    np.testing.assert_array_equal(bins["b"], np.arange(6))
    assert filter_target_groups(["a", "b"], theta, 0.0, ["a", "b"]) == ["a"]


def test_filter_target_groups_strictly_greater():
    names = ["x", "y", "z"]
    theta = np.array([0.5, 0.03, 0.47])
    assert filter_target_groups(names, theta, 0.03, names) == ["x", "z"]
    assert filter_target_groups(names, theta, 0.0, names) == names
    # unknown names filter out silently (abundance treated as 0)
    assert filter_target_groups(names, theta, 0.1, ["x", "ghost"]) == ["x"]


def test_million_ec_binning_is_vectorized():
    """1M ECs x 3 targets must bin in ~no time (VERDICT r04 item 7: the
    old per-EC Python loop crawled at reference scale)."""
    import time

    rng = np.random.default_rng(0)
    E = 1_000_000
    reads_per_ec = rng.integers(1, 4, size=E)
    ptr = np.zeros(E + 1, dtype=np.int64)
    np.cumsum(reads_per_ec, out=ptr[1:])
    aln = CollapsedAlignment(
        n_targets=8,
        n_reads=int(ptr[-1]),
        ec_counts=reads_per_ec.astype(np.int64),
        ec_pattern_targets=np.zeros(E, dtype=np.uint32),
        ec_pattern_ptr=np.arange(E + 1, dtype=np.int64),
        ec_read_ids=np.arange(ptr[-1], dtype=np.uint32),
        ec_read_ptr=ptr,
    )
    gamma = np.log(rng.dirichlet(np.ones(3), size=E))
    theta = np.array([0.4, 0.4, 0.2])
    names = ["a", "b", "c"]
    t0 = time.perf_counter()
    bins = bin_reads(aln, gamma, theta, names, names)
    elapsed = time.perf_counter() - t0
    assert elapsed < 1.0, f"binning 1M ECs took {elapsed:.2f}s"
    # Correctness vs the naive rule on a sample of ECs.
    probs = np.exp(gamma)
    sel = np.flatnonzero(probs[:, 0] >= theta[0])
    expect = np.sort(
        np.concatenate([np.arange(ptr[e], ptr[e + 1]) for e in sel[:1000]])
    )
    got = bins["a"]
    np.testing.assert_array_equal(got[: len(expect)], expect)


# ---------------------------------------------------------------------------
# CLI end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(99)
    clusters = ["c1"] * 3 + ["c2"] * 3 + ["c3"] * 2
    (tmp_path / "clustering.txt").write_text("\n".join(clusters) + "\n")
    members = {0: range(0, 3), 1: range(3, 6), 2: range(6, 8)}
    lines = []
    for rid in range(300):
        lin = rng.choice(3, p=[0.6, 0.35, 0.05])
        tg = sorted({t for t in members[lin] if rng.random() < 0.9})
        lines.append(f"{rid} " + " ".join(map(str, tg)) if tg else str(rid))
    (tmp_path / "aln.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def _bin_args(d, extra=()):
    return [
        "--themisto", str(d / "aln.txt"),
        "-i", str(d / "clustering.txt"),
        "-o", str(d / "out"),
        "--bin-reads", *extra,
    ]


def test_cli_bins_written_and_consistent(dataset):
    assert main(_bin_args(dataset)) == 0
    all_binned = {}
    for name in ("c1", "c2", "c3"):
        path = dataset / f"{name}.bin"
        assert path.exists()
        ids = [int(x) for x in path.read_text().split()]
        assert ids == sorted(ids)
        all_binned[name] = set(ids)
    # bins may overlap but every binned id is a real read id
    union = set().union(*all_binned.values())
    assert union and max(union) < 300
    # sanity: the dominant cluster holds the most reads
    assert len(all_binned["c1"]) >= len(all_binned["c3"])


def test_cli_min_abundance_filters_bins(dataset):
    assert main(_bin_args(dataset, ["--min-abundance", "0.3"])) == 0
    assert (dataset / "c1.bin").exists()
    assert not (dataset / "c3.bin").exists()


def test_cli_target_groups_subset(dataset):
    for leftover in dataset.glob("*.bin"):
        leftover.unlink()
    assert main(_bin_args(dataset, ["--target-groups", "c2"])) == 0
    assert (dataset / "c2.bin").exists()
    assert not (dataset / "c1.bin").exists()


def test_cli_unknown_target_group_fails(dataset, capsys):
    rc = main(_bin_args(dataset, ["--target-groups", "ghost"]))
    assert rc == 1
    assert "not among the estimated groups" in capsys.readouterr().err
