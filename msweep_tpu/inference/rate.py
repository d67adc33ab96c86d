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
def dirichlet_kld(gamma, counts):
    """Per-group log KLD scores, (G_pad,).

    KLD_g = max(lgamma(a0) - lgamma(a0-a_g) - lgamma(a_g)
                + a_g*(digamma(a_g) - digamma(a0)), 1e-16),  a = c @ exp(gamma)

    (src/Sample.cpp:99-131; the reference's custom digamma series at
    src/Sample.cpp:87-97 agrees with the standard digamma to ~1e-12,
    well inside the 6-digit output precision.)
    """
    acc = acc_dtype()
    a = jnp.sum((counts[:, None] * jnp.exp(gamma)).astype(acc), axis=0)
    a0 = jnp.sum(a)
    # Clamp away exact zeros (padded / unhit groups) so digamma(0)*0 can't
    # produce NaN; such groups clamp to the 1e-16 KLD floor anyway.
    a = jnp.maximum(a, jnp.finfo(acc).tiny)
    kld = gammaln(a0) - gammaln(a0 - a) - gammaln(a) + a * (digamma(a) - digamma(a0))
    kld = jnp.maximum(kld, 1e-16)
    return jnp.log(kld)


@jax.jit
def rates_from_log_kld(log_kld, group_mask):
    """RATE_g = KLD_g / sum KLD via stable logsumexp (src/Sample.cpp:133-152).

    `group_mask` excludes padded groups from the normalizer.
    """
    masked = jnp.where(group_mask, log_kld, -jnp.inf)
    lse = jax.scipy.special.logsumexp(masked)
    return jnp.where(group_mask, jnp.exp(log_kld - lse), 0.0)
