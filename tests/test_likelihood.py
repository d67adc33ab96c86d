"""Unit tests for the beta-binomial likelihood (SURVEY.md section 3.2)."""

import numpy as np
import pytest
from scipy.stats import betabinom

from msweep_tpu.core.likelihood import (
    Likelihood,
    bb_parameters,
    build_likelihood,
    ldbb_scaled,
    precalc_table,
    read_likelihood_msweep,
    write_likelihood_msweep,
)


def test_bb_parameters_mean_is_q():
    sizes = np.array([1, 2, 5, 10, 100, 731])
    alpha, beta = bb_parameters(sizes, q=0.65, e=0.01)
    np.testing.assert_allclose(alpha / (alpha + beta), 0.65, rtol=1e-12)


def test_bb_parameters_reference_formula():
    # include/Likelihood.hpp:198-207: mu=n*q; alpha=mu/(n-mu+e); beta=(n-mu)/(n-mu+e)
    n, q, e = 7.0, 0.65, 0.01
    alpha, beta = bb_parameters(np.array([n]), q, e)
    mu = n * q
    assert alpha[0] == pytest.approx(mu / (n - mu + e), rel=1e-14)
    assert beta[0] == pytest.approx((n - mu) / (n - mu + e), rel=1e-14)


def test_ldbb_scaled_matches_scipy():
    # ldbb_scaled(k,n,a,b) = betabinom.logpmf(k) - betabinom.logpmf(n)
    n = 12
    a, b = 1.7, 0.4
    k = np.arange(1, n + 1, dtype=float)
    ours = ldbb_scaled(k, float(n), a, b)
    ref = betabinom.logpmf(k.astype(int), n, a, b) - betabinom.logpmf(n, n, a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_ldbb_scaled_full_hit_is_zero():
    a, b = bb_parameters(np.array([9.0]), 0.65, 0.01)
    assert ldbb_scaled(9.0, 9.0, a[0], b[0]) == pytest.approx(0.0, abs=1e-12)


def test_precalc_table_structure():
    sizes = np.array([3, 5])
    zi = 0.01
    t = precalc_table(sizes, 0.65, 0.01, zi)
    assert t.shape == (2, 6)
    np.testing.assert_allclose(t[:, 0], np.log(zi))
    # k = n_g scores log1p(-zi) exactly (scaled pmf is 0 there)
    assert t[0, 3] == pytest.approx(np.log1p(-zi), abs=1e-12)
    assert t[1, 5] == pytest.approx(np.log1p(-zi), abs=1e-12)


def _toy_likelihood(min_hits=0):
    from msweep_tpu.core.alignment import CollapsedAlignment

    # 3 ECs over 4 targets; groups: t0,t1 -> g0 ; t2 -> g1 ; t3 -> g2
    # EC0 hits {t0,t1}  (k = [2,0,0]), count 3
    # EC1 hits {t1,t2}  (k = [1,1,0]), count 1
    # EC2 hits {t3}     (k = [0,0,1]), count 2
    aln = CollapsedAlignment(
        n_targets=4,
        n_reads=7,
        ec_counts=np.array([3, 1, 2]),
        ec_pattern_targets=np.array([0, 1, 1, 2, 3], dtype=np.uint32),
        ec_pattern_ptr=np.array([0, 2, 4, 5]),
        ec_read_ids=np.arange(6, dtype=np.uint32),
        ec_read_ptr=np.array([0, 3, 4, 6]),
    )
    indicators = np.array([0, 0, 1, 2])
    sizes = np.array([2, 1, 1])
    return build_likelihood(aln, indicators, sizes, min_hits=min_hits)


def test_build_likelihood_dense():
    lik = _toy_likelihood()
    dense = lik.dense()
    assert dense.shape == (3, 3)
    table = precalc_table(np.array([2, 1, 1]), 0.65, 0.01, 0.01)
    zi = np.log(0.01)
    expect = np.array(
        [
            [table[0, 2], zi, zi],
            [table[0, 1], table[1, 1], zi],
            [zi, zi, table[2, 1]],
        ]
    )
    np.testing.assert_allclose(dense, expect)


def test_min_hits_masking():
    # group weights: g0 hit by EC0(3)+EC1(1)=4; g1 by EC1(1)=1; g2 by EC2(2)=2
    lik = _toy_likelihood(min_hits=2)
    np.testing.assert_array_equal(lik.groups_mask, [True, False, True])
    assert lik.n_groups == 2
    dense = lik.dense()
    table = precalc_table(np.array([2, 1]), 0.65, 0.01, 0.01)
    zi = np.log(0.01)
    expect = np.array(
        [
            [table[0, 2], zi],
            [table[0, 1], zi],
            [zi, table[1, 1]],
        ]
    )
    np.testing.assert_allclose(dense, expect)


def test_likelihood_file_roundtrip(tmp_path):
    import io

    lik = _toy_likelihood()
    buf = io.StringIO()
    write_likelihood_msweep(lik, buf)
    text = buf.getvalue()
    # rows: count \t ll per group
    rows = text.strip().split("\n")
    assert len(rows) == 3
    assert rows[0].split("\t")[0] == "3"

    back = read_likelihood_msweep(text, n_groups=3)
    np.testing.assert_array_equal(back.ec_counts, lik.ec_counts)
    # 6-sig-digit round trip
    np.testing.assert_allclose(back.dense(), lik.dense(), rtol=1e-5)
