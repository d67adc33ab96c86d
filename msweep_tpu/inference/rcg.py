"""Riemannian conjugate-gradient variational Bayes (the "rcg" algorithm).

TPU-native replacement for rcgpar::rcg_optl_omp / rcg_optl_torch
(call sites src/mSWEEP.cpp:194-198).  rcgpar's source is not in the
reference snapshot (it is a FetchContent dependency), so this is a
from-scratch derivation of the published algorithm (Maklin et al. 2021,
Wellcome Open Res; Hensman et al. 2012/2015 natural-gradient conjugate
VB) matching the observed API contract (SURVEY.md section 3.3): inputs
(logL, ec counts, prior counts, tol, max_iters), output log EC->group
probabilities, convergence when the ELBO improves by < tol.

Model and objective
-------------------
theta ~ Dirichlet(alpha); read e (multiplicity c_e) has component z_e with
log-likelihood L[e,g].  Mean-field q(Z)q(theta) with q(z_e)=Cat(exp gamma_e),
q(theta)=Dir(N), N = alpha + sum_e c_e exp(gamma_e).  With q(theta) kept
at its coordinate optimum the ELBO as a function of gamma alone is

    F(gamma) = bound_const + sum_g lgamma(N_g)
             + sum_e c_e sum_g exp(gamma_eg) (L_eg - gamma_eg)

(bound_const in mixture.bound_const; sum N is constant).

Iteration
---------
For conjugate-exponential mean-field models the *natural* gradient of F
w.r.t. the natural parameters of q(z_e) is (eta* - gamma), where
eta*_eg = L_eg + digamma(N_g) (row-normalized) is the exact VB
coordinate update.  The optimizer is nonlinear CG in that geometry:

    s      = rownorm(L + digamma(N)) - gamma      # natural gradient
    beta   = <s, s>_phi / <s_old, s_old>_phi      # Fletcher-Reeves,
                                                  # metric weight c_e*phi
    d      = s + beta * d_old
    gamma' = rownorm(gamma + d);  N' = alpha + sum_e c_e exp(gamma'_e)
    if F(gamma') < F(gamma): revert, reset d (next step is then the pure
    VB update gamma+s = eta*, which is monotone -> guaranteed recovery)

A beta=0 step is exactly VBEM, so the fixed points — and therefore the
converged abundances — coincide with the reference's optimizer even
though the step sequence need not.

Shapes: logL (E, G), counts (E,), alpha (G,); padding per inference.pack
is inert.  The whole loop is one jitted lax.while_loop; E-axis reductions
accumulate in f64 when x64 is enabled (see pack.acc_dtype).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from .pack import DeviceProblem, acc_dtype


class RCGState(NamedTuple):
    gamma: jax.Array  # (E, G) log q(z)
    d: jax.Array  # (E, G) conjugate direction
    n_counts: jax.Array  # (G,) Dirichlet posterior counts N
    oldnorm: jax.Array  # scalar, previous metric norm
    bound: jax.Array  # scalar, current ELBO
    delta: jax.Array  # scalar, last accepted improvement
    it: jax.Array  # int32 iteration counter
    done: jax.Array  # bool
    just_reset: jax.Array  # bool, momentum was reset last step


def _rownorm(x):
    return x - jax.scipy.special.logsumexp(x, axis=-1, keepdims=True)


def _make_step(tol: float, verbose: bool):
    def step(carry, logL, counts, alpha, bc):
        st: RCGState = carry
        acc = acc_dtype()

        psi_n = digamma(st.n_counts).astype(logL.dtype)
        eta = _rownorm(logL + psi_n[None, :])
        s = eta - st.gamma

        phi_old = jnp.exp(st.gamma)
        newnorm = jnp.sum(
            (counts[:, None] * phi_old * s * s).astype(acc)
        )
        beta_fr = jnp.where(
            st.just_reset | (st.it == 0) | (st.oldnorm <= 0),
            jnp.zeros((), acc),
            newnorm / st.oldnorm,
        ).astype(logL.dtype)

        d_new = s + beta_fr * st.d
        gamma_new = _rownorm(st.gamma + d_new)

        phi = jnp.exp(gamma_new)
        w = counts[:, None] * phi
        n_new = alpha.astype(acc) + jnp.sum(w.astype(acc), axis=0)
        elbo_data = jnp.sum((w * (logL - gamma_new)).astype(acc))
        bound_new = bc + jnp.sum(gammaln(n_new)) + elbo_data

        decreased = bound_new < st.bound
        delta = bound_new - st.bound

        # Converged: accepted step with 0 <= improvement < tol, or a pure
        # VB step that still "decreased" (numerical floor).
        newly_done = (~decreased & (delta < tol)) | (decreased & st.just_reset)

        gamma_out = jnp.where(decreased, st.gamma, gamma_new)
        d_out = jnp.where(decreased, jnp.zeros_like(d_new), d_new)
        n_out = jnp.where(decreased, st.n_counts, n_new.astype(logL.dtype))
        bound_out = jnp.where(decreased, st.bound, bound_new)
        norm_out = jnp.where(decreased, jnp.ones((), acc), newnorm)
        delta_out = jnp.where(decreased, st.delta, delta)

        if verbose:
            jax.debug.print(
                "  iter {i}  bound {b}  (reset={r})", i=st.it + 1, b=bound_new, r=decreased
            )

        return RCGState(
            gamma=gamma_out,
            d=d_out,
            n_counts=n_out,
            oldnorm=norm_out,
            bound=bound_out,
            delta=delta_out,
            it=st.it + 1,
            done=st.done | newly_done,
            just_reset=decreased,
        )

    return step


@partial(jax.jit, static_argnames=("max_iters", "tol", "verbose"))
def _rcg_run(logL, counts, alpha, bc, *, max_iters: int, tol: float, verbose: bool):
    E, G = logL.shape
    dtype = logL.dtype
    acc = acc_dtype()

    from ..utils import PAD_THRESHOLD

    # gamma_0 = log(1/G) on real groups; NEG-ish on padded groups so their
    # softmax weight is 0 from the start.
    init_logits = jnp.where(logL > jnp.asarray(PAD_THRESHOLD, dtype), 0.0, logL)
    gamma0 = _rownorm(init_logits)
    n0 = alpha.astype(acc) + jnp.sum(
        (counts[:, None] * jnp.exp(gamma0)).astype(acc), axis=0
    )

    st = RCGState(
        gamma=gamma0,
        d=jnp.zeros_like(gamma0),
        n_counts=n0.astype(dtype),
        oldnorm=jnp.ones((), acc),
        bound=jnp.asarray(-jnp.inf, acc),
        delta=jnp.asarray(jnp.inf, acc),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        just_reset=jnp.zeros((), bool),
    )

    step = _make_step(tol, verbose)
    bc = jnp.asarray(bc, acc)

    st = jax.lax.while_loop(
        lambda s: (s.it < max_iters) & ~s.done,
        lambda s: step(s, logL, counts, alpha, bc),
        st,
    )
    return st.gamma, st.it, st.bound


def fit_rcg(
    problem: DeviceProblem,
    *,
    tol: float = 1e-6,
    max_iters: int = 5000,
    verbose: bool = False,
    counts=None,
):
    """Run rcg on a packed problem. Returns (gamma, n_iters, bound).

    `gamma` keeps the padded (E_pad, G_pad) shape (slice with
    problem.n_ecs/n_groups when materializing outputs); `counts`
    optionally overrides problem.counts (bootstrap replicates — vmap
    over this argument batches replicates over one shared logL).
    """
    c = problem.counts if counts is None else counts
    return _rcg_run(
        problem.logL,
        c,
        problem.alpha,
        problem.bound_const,
        max_iters=int(max_iters),
        tol=float(tol),
        verbose=bool(verbose),
    )


def fit_rcg_batch(problem: DeviceProblem, counts_batch, *, tol=1e-6, max_iters=5000):
    """vmapped rcg over a (B, E) batch of count vectors sharing one logL.

    This is the TPU formulation of the reference's serial bootstrap loop
    (src/mSWEEP.cpp:496-518): iterations proceed in lockstep; converged
    replicates stop updating via the per-replicate `done` flag... in the
    batched setting we simply run each replicate's full while_loop under
    vmap (jax batches the loop; replicates that converge early stop
    changing their state).
    """
    run = partial(
        _rcg_run, max_iters=int(max_iters), tol=float(tol), verbose=False
    )
    return jax.vmap(lambda c: run(problem.logL, c, problem.alpha, problem.bound_const))(
        counts_batch
    )
