"""Shared mixture-model pieces: ELBO constant and abundance extraction."""

from __future__ import annotations

import numpy as np
from scipy.special import gammaln as host_gammaln

import jax.numpy as jnp


def bound_const(counts: np.ndarray, alpha: np.ndarray) -> float:
    """Constant ELBO terms (host, f64).

    With q(theta)=Dirichlet(N) kept at its coordinate optimum,
    sum(N) = sum(alpha) + sum(counts) is constant, so the ELBO's
    theta-terms reduce to

        lgamma(sum a) - sum lgamma(a) - lgamma(sum a + sum c)

    plus the variable sum_g lgamma(N_g) handled per-iteration.  This is
    the "bound_const = f(log_ec_counts, alphas)" the reference
    precomputes inside rcgpar (SURVEY.md section 3.3) [reconstructed: derived
    from the variational objective, not from rcgpar source].
    """
    a = np.asarray(alpha, dtype=np.float64)
    c = np.asarray(counts, dtype=np.float64)
    return float(
        host_gammaln(a.sum()) - host_gammaln(a).sum() - host_gammaln(a.sum() + c.sum())
    )


def mixture_components(gamma, counts, n_groups: int | None = None):
    """Relative abundances theta_g = sum_e c_e exp(gamma_eg) / sum_e c_e.

    Equivalent of rcgpar::mixture_components (call site src/mSWEEP.cpp:420;
    derivation SURVEY.md section 3.3).  `gamma` is (E, G) log-probabilities,
    `counts` the (possibly resampled) EC counts.  Padded rows/cols fall
    out automatically (counts 0 / exp(gamma)=0).
    """
    w = jnp.sum(counts[:, None] * jnp.exp(gamma), axis=0)
    theta = w / jnp.sum(counts)
    if n_groups is not None:
        theta = theta[:n_groups]
    return theta
