"""Independent numpy oracle for the natural-gradient conjugate VB update.

Written directly from the published update equations (Hensman et al.,
"Fast variational inference in the conjugate exponential family" /
BitSeq estimateVBExpression lineage; Maklin et al. 2021 Wellcome Open
Res) — NOT from msweep_tpu/inference/rcg.py.  Deliberately dumb numerics:

- the ELBO F(gamma) is FULLY RECOMPUTED from scratch every iteration in
  float64 (the production code accumulates per-iteration deltas from
  elementwise differences precisely to avoid this; the oracle is the
  ground truth that scheme must reproduce),
- no chunking, no padding, no fused anything: plain dense numpy.

Shared policy choices (documented, required for trajectory equality):
Fletcher-Reeves beta with metric weight c_e*phi, revert-and-reset on a
bound decrease, convergence when an accepted step improves by
0 <= delta < tol or when the pure VB step after a reset still decreases
(numerical floor).

Model: theta ~ Dir(alpha); EC e (count c_e) from component z_e with
log-lik L[e, g]; q(z_e) = Cat(exp gamma_e), q(theta) = Dir(N),
N = alpha + sum_e c_e exp(gamma_e).
"""

from __future__ import annotations

import numpy as np
from scipy.special import digamma, gammaln


def _rownorm(x: np.ndarray) -> np.ndarray:
    """log-softmax over groups (the simplex retraction)."""
    m = x.max(axis=1, keepdims=True)
    return x - (m + np.log(np.exp(x - m).sum(axis=1, keepdims=True)))


def elbo(L, counts, alpha, gamma) -> float:
    """Full ELBO, recomputed from scratch (f64).

    F = sum_e c_e sum_g phi_eg (L_eg - gamma_eg)        [data + entropy]
      + sum_g lgamma(N_g) - lgamma(sum_g N_g)           [Dirichlet]
      - sum_g lgamma(alpha_g) + lgamma(sum_g alpha_g)
    (the alpha terms and the constant sum_e c_e parts form bound_const
    in the production code; absolute values must match, not just deltas)
    """
    phi = np.exp(gamma)
    N = alpha + counts @ phi
    data = float(np.sum(counts[:, None] * phi * (L - gamma)))
    dirich = float(np.sum(gammaln(N)) - gammaln(np.sum(N)))
    prior = float(gammaln(np.sum(alpha)) - np.sum(gammaln(alpha)))
    return data + dirich + prior


def fit_vbem_cg(L, counts, alpha, tol=1e-6, max_iters=5000):
    """Returns (gamma, n_iters, bounds) — bounds is the per-iteration
    ACCEPTED bound trajectory (floats), len == n_iters."""
    L = np.asarray(L, np.float64)
    counts = np.asarray(counts, np.float64)
    alpha = np.asarray(alpha, np.float64)
    E, G = L.shape

    gamma = _rownorm(np.zeros((E, G)))
    d = np.zeros((E, G))
    oldnorm = 1.0
    just_reset = False
    bound = elbo(L, counts, alpha, gamma)
    bounds = []

    for it in range(1, max_iters + 1):
        N = alpha + counts @ np.exp(gamma)
        s = _rownorm(L + digamma(N)[None, :]) - gamma

        w = counts[:, None] * np.exp(gamma)
        newnorm = float(np.sum(w * s * s))
        beta = 0.0 if (just_reset or it == 1 or oldnorm <= 0) else newnorm / oldnorm

        d_try = s + beta * d
        gamma_try = _rownorm(gamma + d_try)
        bound_try = elbo(L, counts, alpha, gamma_try)
        delta = bound_try - bound

        if delta < 0:  # revert + momentum reset
            d = np.zeros((E, G))
            oldnorm = 1.0
            if just_reset:  # pure VB step still decreased: numerical floor
                bounds.append(bound)
                return gamma, it, bounds
            just_reset = True
            bounds.append(bound)
            continue

        gamma, d, bound, oldnorm = gamma_try, d_try, bound_try, newnorm
        just_reset = False
        bounds.append(bound)
        if delta < tol:
            return gamma, it, bounds

    return gamma, max_iters, bounds


def fit_em(L, counts, alpha, tol=1e-6, max_iters=5000):
    """Plain EM oracle (SURVEY.md section 3.4), full-recompute objective.

    E: p_eg prop. theta_g exp(L_eg); M: theta_g prop. max(alpha_g-1+sum_e
    c_e p_eg, 0); J = sum_e c_e lse_g(L+log theta) + sum (alpha-1) log theta.
    """
    L = np.asarray(L, np.float64)
    counts = np.asarray(counts, np.float64)
    alpha = np.asarray(alpha, np.float64)
    E, G = L.shape
    theta = np.full(G, 1.0 / G)

    def objective(th):
        t = L + np.log(th)[None, :]
        m = t.max(axis=1)
        lse = m + np.log(np.exp(t - m[:, None]).sum(axis=1))
        return float(counts @ lse + np.sum((alpha - 1.0) * np.log(th)))

    obj = objective(theta)
    for it in range(1, max_iters + 1):
        t = L + np.log(theta)[None, :]
        m = t.max(axis=1, keepdims=True)
        p = np.exp(t - m)
        p /= p.sum(axis=1, keepdims=True)
        raw = np.maximum(alpha - 1.0 + counts @ p, 0.0)
        theta = raw / raw.sum()
        obj_new = objective(theta)
        delta = obj_new - obj
        obj = obj_new
        if abs(delta) < tol:
            return theta, it, obj
    return theta, max_iters, obj
