"""Plain EM with Dirichlet-MAP M-step (the "emgpu" algorithm).

TPU-native replacement for rcgpar::em_torch (call site src/mSWEEP.cpp:202).
Standard EM on the mixture (SURVEY.md section 3.4) [reconstructed: em_torch
source unavailable; this is the textbook algorithm its API implies]:

  E-step:  p_eg  proportional to theta_g * exp(L_eg), normalized per EC
  M-step:  theta_g proportional to max(alpha_g - 1 + sum_e c_e p_eg, 0)

Convergence when the MAP objective
  J = sum_e c_e logsumexp_g(L_eg + log theta_g) + sum_g (alpha_g-1) log theta_g
improves by less than tol.  With the default alpha=1 this is plain
maximum likelihood.  Like the reference's emgpu, the trajectory is
precision-sensitive (docs/gpubenchmarks.md:20-25: float converges in 335
iters where double hits the 5000 cap at tol 1e-6); dtype follows the
packed matrix, scalars accumulate per pack.acc_dtype.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import NEG
from .pack import DeviceProblem, acc_dtype


class EMState(NamedTuple):
    theta: jax.Array  # (G,)
    objective: jax.Array  # scalar
    it: jax.Array
    done: jax.Array


def _safe_log(x, dtype):
    return jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-300)), jnp.asarray(NEG, dtype))


@partial(jax.jit, static_argnames=("max_iters", "tol", "verbose"))
def _em_run(logL, counts, alpha, *, max_iters: int, tol: float, verbose: bool):
    dtype = logL.dtype
    acc = acc_dtype()
    G_pad = logL.shape[1]

    from ..utils import PAD_THRESHOLD

    valid = logL[0, :] > jnp.asarray(PAD_THRESHOLD, dtype)  # padded-group
    # mask; row 0 is a real EC row whose padded cols are NEG (E>=1 always).
    n_valid = jnp.sum(valid)
    theta0 = jnp.where(valid, 1.0 / n_valid, 0.0).astype(dtype)

    am1 = (alpha - 1.0).astype(acc)
    csum_prior = jnp.sum(am1) + jnp.sum(counts.astype(acc))

    def estep(theta):
        t = logL + _safe_log(theta, dtype)[None, :]
        lse = jax.scipy.special.logsumexp(t, axis=1)
        logp = t - lse[:, None]
        obj = jnp.sum((counts * lse).astype(acc)) + jnp.sum(
            jnp.where(valid, am1 * _safe_log(theta, dtype).astype(acc), 0.0)
        )
        return logp, obj

    def body(st: EMState) -> EMState:
        logp, obj = estep(st.theta)
        w = counts[:, None] * jnp.exp(logp)
        nw = jnp.sum(w.astype(acc), axis=0)
        raw = jnp.maximum(am1 + nw, 0.0)
        raw = jnp.where(valid, raw, 0.0)
        theta_new = (raw / jnp.sum(raw)).astype(dtype)
        delta = obj - st.objective
        done = jnp.abs(delta) < tol
        if verbose:
            jax.debug.print("  iter {i}  objective {o}", i=st.it + 1, o=obj)
        return EMState(theta=theta_new, objective=obj, it=st.it + 1, done=st.done | done)

    st = EMState(
        theta=theta0,
        objective=jnp.asarray(-jnp.inf, acc),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
    )
    st = jax.lax.while_loop(
        lambda s: (s.it < max_iters) & ~s.done, body, st
    )

    # Final responsibilities at the converged theta (the returned log
    # probs matrix, same downstream handling as rcg: src/mSWEEP.cpp:419-423).
    logp, obj = estep(st.theta)
    return logp, st.it, obj


def fit_em(
    problem: DeviceProblem,
    *,
    tol: float = 1e-6,
    max_iters: int = 5000,
    verbose: bool = False,
    counts=None,
):
    c = problem.counts if counts is None else counts
    return _em_run(
        problem.logL,
        c,
        problem.alpha,
        max_iters=int(max_iters),
        tol=float(tol),
        verbose=bool(verbose),
    )


def fit_em_batch(problem: DeviceProblem, counts_batch, *, tol=1e-6, max_iters=5000):
    run = partial(_em_run, max_iters=int(max_iters), tol=float(tol), verbose=False)
    return jax.vmap(lambda c: run(problem.logL, c, problem.alpha))(counts_batch)
