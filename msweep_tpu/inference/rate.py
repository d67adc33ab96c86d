"""RATE/KLD reliability scoring (--run-rate, experimental in the reference).

Closed-form version of Sample::dirichlet_kld and Sample::get_rates
(src/Sample.cpp:99-152).  The reference materializes a per-read loop
repeating each EC round(exp(log_count)) times (src/Sample.cpp:107-110);
mathematically that is just a_g = sum_e c_e * exp(gamma_eg), which is the
form used here (quirk SURVEY.md section 9.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from .pack import acc_dtype


@jax.jit
def dirichlet_kld_from_pseudocounts(a):
    """Per-group log KLD scores, (G_pad,), from the Dirichlet
    pseudo-counts a_g = sum_e c_e exp(gamma_eg).

    KLD_g = max(lgamma(a0) - lgamma(a0-a_g) - lgamma(a_g)
                + a_g*(digamma(a_g) - digamma(a0)), 1e-16)

    (src/Sample.cpp:99-131; the reference's custom digamma series at
    src/Sample.cpp:87-97 agrees with the standard digamma to ~1e-12,
    well inside the 6-digit output precision.)  `a` falls straight out
    of the optimizer state (N - alpha, see rcg._state_theta), so the
    RATE path is O(G) — the reference rebuilds it with a per-read loop
    over an in-memory probs matrix (src/Sample.cpp:104-112).
    """
    acc = acc_dtype()
    a = jnp.asarray(a, acc)
    a0 = jnp.sum(a)
    # Clamp away exact zeros (padded / unhit groups) so digamma(0)*0 can't
    # produce NaN; such groups clamp to the 1e-16 KLD floor anyway.
    a = jnp.maximum(a, jnp.finfo(acc).tiny)
    kld = gammaln(a0) - gammaln(a0 - a) - gammaln(a) + a * (digamma(a) - digamma(a0))
    kld = jnp.maximum(kld, 1e-16)
    return jnp.log(kld)


@jax.jit
def dirichlet_kld(gamma, counts):
    """dirichlet_kld_from_pseudocounts at a = c @ exp(gamma), for callers
    that hold a materialized gamma.  The weighted colsum keeps f32
    blocks with f64 partials — no (E, G) f64 intermediate is ever built
    (at reference scale under x64 that intermediate would be ~18 GB)."""
    E, G = gamma.shape
    acc = acc_dtype()
    B = 1024
    while E % B != 0:
        B //= 2
    w = counts[:, None] * jnp.exp(gamma)
    if B <= 1:
        a = jnp.sum(w.astype(acc), axis=0)
    else:
        a = jnp.sum(jnp.sum(w.reshape(E // B, B, G), axis=1).astype(acc), axis=0)
    return dirichlet_kld_from_pseudocounts(a)


@jax.jit
def rates_from_log_kld(log_kld, group_mask):
    """RATE_g = KLD_g / sum KLD via stable logsumexp (src/Sample.cpp:133-152).

    `group_mask` excludes padded groups from the normalizer.
    """
    masked = jnp.where(group_mask, log_kld, -jnp.inf)
    lse = jax.scipy.special.logsumexp(masked)
    return jnp.where(group_mask, jnp.exp(log_kld - lse), 0.0)
