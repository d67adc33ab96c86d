"""Production-vs-oracle trajectory tests (VERDICT round-1 item 7).

oracle_vbem.py is a from-the-paper, full-recompute numpy implementation.
Agreement here validates the production implementation's load-bearing
tricks — the delta-accumulated ELBO (never computing F from scratch),
the two-stage f32/f64 reductions, padding inertness, and the chunked
scan with frozen convergence — against ground-truth numerics, on the
full per-iteration trajectory (bound sequence + iteration count +
gamma), not just the fixed point.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from msweep_tpu.inference.pack import pack_problem
from msweep_tpu.inference.rcg import _rcg_chunk, _rcg_init
from msweep_tpu.inference.em import fit_em
from msweep_tpu.inference.mixture import mixture_components
from msweep_tpu.core.likelihood import Likelihood

import oracle_vbem


def _random_problem(seed, E=160, G=7):
    rng = np.random.default_rng(seed)
    theta_true = rng.dirichlet(np.ones(G) * 2)
    L = np.log(rng.dirichlet(theta_true * G + 0.3, size=E) + 1e-12)
    counts = rng.integers(1, 20, E).astype(np.float64)
    alpha = np.ones(G)
    return L, counts, alpha


def _lik(L, counts):
    E, G = L.shape
    return Likelihood(
        n_ecs=E,
        n_groups_total=G,
        groups_mask=np.ones(G, bool),
        group_sizes=np.zeros(G, np.int64),
        ec_counts=counts.astype(np.int64),
        zero_inflation=0.01,
        _dense=L,
    )


def _run_production(L, counts, alpha, tol, max_iters, chunk=16):
    """Drive the XLA f64 path chunk by chunk, collecting the per-iteration
    bound history that _rcg_chunk returns."""
    problem = pack_problem(_lik(L, counts), alpha=alpha, dtype=jnp.float64)
    st = _rcg_init(problem.logL, problem.counts, problem.alpha, problem.bound_const)
    bounds, resets = [], []
    it = 0
    while it < max_iters:
        n = min(chunk, max_iters - it)
        st, (active, bs, rs) = _rcg_chunk(
            st, problem.logL, problem.counts, problem.alpha,
            length=n, tol=tol, impl="xla",
        )
        a = np.asarray(active)
        bounds.extend(np.asarray(bs)[a].tolist())
        resets.extend(np.asarray(rs)[a].tolist())
        it += n
        if bool(st.done):
            break
    gamma = np.asarray(st.gamma)[: L.shape[0], : L.shape[1]]
    return gamma, int(st.it), bounds, problem


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_rcg_trajectory_matches_oracle(seed):
    L, counts, alpha = _random_problem(seed)
    tol = 1e-6
    g_o, it_o, bounds_o = oracle_vbem.fit_vbem_cg(L, counts, alpha, tol=tol)
    g_p, it_p, bounds_p, _ = _run_production(L, counts, alpha, tol, 5000)

    assert it_p == it_o, f"iteration counts diverge: {it_p} vs {it_o}"
    assert len(bounds_p) == it_p
    # full per-iteration ELBO trajectory, absolute values (validates
    # bound_const + the delta-accumulation scheme against full recompute)
    np.testing.assert_allclose(bounds_p, bounds_o[: len(bounds_p)], rtol=1e-9)
    np.testing.assert_allclose(g_p, g_o, atol=1e-6)


def test_rcg_abundances_match_oracle_near_convergence():
    L, counts, alpha = _random_problem(11, E=300, G=5)
    g_o, _, _ = oracle_vbem.fit_vbem_cg(L, counts, alpha, tol=1e-10)
    g_p, _, _, problem = _run_production(L, counts, alpha, 1e-10, 5000)
    th_o = (counts @ np.exp(g_o)) / counts.sum()
    th_p = np.asarray(
        mixture_components(
            jnp.asarray(np.pad(g_p, ((0, problem.logL.shape[0] - 300), (0, problem.logL.shape[1] - 5)), constant_values=-1e30)),
            problem.counts,
            5,
        )
    )
    np.testing.assert_allclose(th_p, th_o, atol=1e-8)


def test_rcg_fixed_point_stationarity_certificate():
    """Independent convergence certificate (VERDICT r04 item 9): at an
    rcg fixed point, gamma must satisfy the VB stationarity condition
    gamma = rownorm(L + digamma(N)), N = alpha + c @ exp(gamma) —
    checked here in from-scratch f64 numpy, no production code.  Run on
    an ill-conditioned community problem where the raw f32 path stops
    at its numerical floor: the escalated fit's residual must be orders
    of magnitude smaller."""
    from scipy.special import digamma as np_digamma

    from msweep_tpu.synth import make_community_likelihood
    from msweep_tpu.inference.rcg import fit_rcg_result

    lik = make_community_likelihood(
        4096, 128, seed=2, similarity=0.99, cluster_size=8, present_frac=0.1
    )
    E, G = lik.n_ecs, lik.n_groups
    L = lik.dense(np.float64)
    counts = lik.ec_counts.astype(np.float64)
    problem = pack_problem(lik, dtype=jnp.float32)

    def theta_residual(res):
        gamma = np.asarray(res.gamma(), np.float64)[:E, :G]
        N = 1.0 + counts @ np.exp(gamma)
        eta = L + np_digamma(N)[None, :]
        eta -= eta.max(axis=1, keepdims=True)
        eta -= np.log(np.exp(eta).sum(axis=1, keepdims=True))
        th = (counts @ np.exp(gamma)) / counts.sum()
        th_eta = (counts @ np.exp(eta)) / counts.sum()
        return np.abs(th - th_eta).max()

    r_esc = fit_rcg_result(problem, tol=1e-8, max_iters=3000, impl="pallas_interpret")
    r_raw = fit_rcg_result(
        problem, tol=1e-8, max_iters=3000, impl="pallas_interpret", refine=False
    )
    res_esc = theta_residual(r_esc)
    res_raw = theta_residual(r_raw)
    assert res_esc < 1e-6, f"stationarity residual {res_esc:.2e}"
    assert res_esc < res_raw / 50, (res_esc, res_raw)


def test_rcg_fixed_point_vs_independent_em_oracle():
    """rcg fixed points vs the INDEPENDENT numpy EM oracle at tight
    tolerance (VERDICT r04 item 9).  With alpha=1 and large counts the
    VB posterior mean and the ML fixed point agree to O(1/total):
    total=2e5 here, so 5e-4 is a conservative bound that still catches
    any systematic optimizer bias."""
    rng = np.random.default_rng(17)
    G, E = 5, 250
    theta_true = rng.dirichlet(np.ones(G) * 2)
    L = np.log(rng.dirichlet(theta_true * G + 0.3, size=E) + 1e-12)
    counts = rng.multinomial(200_000, np.full(E, 1.0 / E)).astype(np.float64)
    alpha = np.ones(G)
    th_o, it_o, _ = oracle_vbem.fit_em(L, counts, alpha, tol=1e-12, max_iters=50000)
    g_p, _, _, problem = _run_production(L, counts, alpha, 1e-10, 5000)
    th_p = (counts @ np.exp(g_p)) / counts.sum()
    np.testing.assert_allclose(th_p, th_o, atol=5e-4)


@pytest.mark.parametrize("seed", [3, 5])
def test_em_matches_oracle(seed):
    L, counts, alpha = _random_problem(seed, E=120, G=6)
    tol = 1e-8
    th_o, it_o, obj_o = oracle_vbem.fit_em(L, counts, alpha, tol=tol)
    problem = pack_problem(_lik(L, counts), alpha=alpha, dtype=jnp.float64)
    logp, it_p, obj_p = fit_em(problem, tol=tol, max_iters=5000, impl="xla")
    th_p = np.asarray(
        mixture_components(logp, problem.counts, 6)
    )
    # the production deferred-delta check fires one iteration after the
    # naive formulation (inference/em.py docstring) with the same deltas;
    # the one-step stopping offset bounds the theta gap at ~tol scale.
    np.testing.assert_allclose(th_p, th_o, atol=1e-6)
    assert abs(int(it_p) - it_o) <= 1
