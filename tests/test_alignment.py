"""Tests for plaintext parsing, paired merge, and EC collapse (SURVEY.md section 3.1)."""

import numpy as np

from msweep_tpu.core.alignment import collapse, hash_reads
from msweep_tpu.io.themisto import (
    count_lines,
    merge_strands,
    parse_plaintext_pairs,
)

MIX = 0x517CC1B727220A95
M64 = (1 << 64) - 1


def ref_hash(targets):
    """Direct transcription of the reference mixer
    (include/mSWEEP_alignment.hpp:150-155) in python ints mod 2^64."""
    h = 0
    for j in sorted(targets):
        h ^= (j + MIX + ((h << 6) & M64) + (h >> 2)) & M64
        h &= M64
    return h


def test_parse_plaintext():
    data = b"0 1 2\n1\n2 0 3 2\n"
    r, t, n = parse_plaintext_pairs(data)
    assert n == 3
    np.testing.assert_array_equal(r, [0, 0, 2, 2, 2])
    np.testing.assert_array_equal(t, [1, 2, 0, 3, 2])


def test_parse_no_trailing_newline():
    assert count_lines(b"0 1\n1 2") == 2
    assert count_lines(b"0 1\n1 2\n") == 2
    r, t, n = parse_plaintext_pairs(b"0 1\n1 2")
    assert n == 2


def test_merge_intersection_union():
    s1 = (np.array([0, 0, 1], dtype=np.uint64), np.array([0, 1, 2], dtype=np.uint64))
    s2 = (np.array([0, 1, 1], dtype=np.uint64), np.array([1, 2, 3], dtype=np.uint64))
    T = 4
    inter = merge_strands([s1, s2], T, "intersection")
    np.testing.assert_array_equal(inter, [0 * T + 1, 1 * T + 2])
    uni = merge_strands([s1, s2], T, "union")
    np.testing.assert_array_equal(uni, [0, 1, 1 * T + 2, 1 * T + 3])


def test_merge_unknown_mode_raises():
    s1 = (np.array([0], dtype=np.uint64), np.array([0], dtype=np.uint64))
    try:
        merge_strands([s1, s1], 4, "unpaired")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # single file: merge never runs, any mode accepted (quirk SURVEY 9.3)
    merge_strands([s1], 4, "unpaired")


def test_hash_matches_reference_mixer():
    rng = np.random.default_rng(0)
    pairs = []
    for read in range(50):
        tgts = rng.choice(200, size=rng.integers(1, 10), replace=False)
        for t in tgts:
            pairs.append((read, t))
    pairs.sort()
    r = np.array([p[0] for p in pairs], dtype=np.uint64)
    t = np.array([p[1] for p in pairs], dtype=np.uint64)
    reads, start, counts, h = hash_reads(r, t)
    for i, read in enumerate(reads):
        mine = int(h[i])
        expect = ref_hash(t[start[i] : start[i] + counts[i]].tolist())
        assert mine == expect, f"read {read}"


def test_collapse_toy():
    # reads: 0:{1,2} 1:{1,2} 2:{0} 3:(none) 4:{1,2} 5:{0}
    from msweep_tpu.io.themisto import key_radix

    T = 4
    R = key_radix(T)
    keys = []
    for read, tgts in [(0, [1, 2]), (1, [1, 2]), (2, [0]), (4, [1, 2]), (5, [0])]:
        for t in tgts:
            keys.append(read * R + t)
    keys = np.array(sorted(keys), dtype=np.uint64)
    aln = collapse(keys, n_targets=T, n_reads=6)

    assert aln.n_reads == 6
    assert aln.n_ecs == 2
    assert aln.n_aligned == 5

    # EC order = ascending hash of patterns {1,2} and {0}
    h12, h0 = ref_hash([1, 2]), ref_hash([0])
    order = [h0, h12] if h0 < h12 else [h12, h0]
    np.testing.assert_array_equal(aln.hashes, order)

    for i in range(2):
        members = aln.reads_assigned_to_ec(i)
        pattern = aln.ec_pattern_targets[aln.ec_pattern_ptr[i] : aln.ec_pattern_ptr[i + 1]]
        if aln.hashes[i] == h12:
            np.testing.assert_array_equal(members, [0, 1, 4])
            np.testing.assert_array_equal(pattern, [1, 2])
            assert aln.ec_counts[i] == 3
        else:
            np.testing.assert_array_equal(members, [2, 5])
            np.testing.assert_array_equal(pattern, [0])
            assert aln.ec_counts[i] == 2


def test_collapse_deterministic_order():
    from msweep_tpu.io.themisto import key_radix

    rng = np.random.default_rng(7)
    T = 100
    R = key_radix(T)
    keys = set()
    for read in range(500):
        for t in rng.choice(T, size=rng.integers(1, 6), replace=False):
            keys.add(read * R + int(t))
    keys = np.array(sorted(keys), dtype=np.uint64)
    aln = collapse(keys, n_targets=T, n_reads=500)
    assert np.all(np.diff(aln.hashes.astype(object)) > 0)  # strictly ascending
    assert aln.ec_counts.sum() == len(np.unique(keys // R))
