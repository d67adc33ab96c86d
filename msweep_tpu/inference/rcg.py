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

TPU structure (why this file looks the way it does)
---------------------------------------------------
1. Iterations run as `lax.scan` CHUNKS with a host-side convergence
   check between chunks.  A data-dependent `lax.while_loop` would be the
   natural fit, but its per-iteration condition forces a host sync on
   remote-dispatch backends (~10ms/iter measured on the axon tunnel —
   40x the compute), while scan executes entirely on device.  Converged
   states freeze inside a chunk (lax.cond pass-through) so per-iteration
   convergence semantics are exact.
2. The ELBO *change* is accumulated directly from elementwise
   differences (phi'(L-gamma') - phi(L-gamma), then row-sum, then an
   f64 scalar sum) instead of differencing two O(sum c * |L|) totals.
   At tol=1e-6 *absolute* on a bound of magnitude ~1e7, differencing
   would need ~1e-13 relative precision — i.e. full f64 passes over the
   matrix, which the TPU emulates at ~6.5x the f32 cost.  Differences of
   nearly-equal intermediates cancel rounding to first order, so f32
   matrices converge at reference tolerances.
3. Long-axis reductions are two-stage: f32 inside rows / row-blocks,
   f64 across (see _rowsum_acc/_colsum_acc).  The G-sized state (N,
   digamma, lgamma) is carried in f64 — tiny, and it keeps the
   Dirichlet terms of the bound exact.

Shapes: logL (E, G), counts (E,), alpha (G,); padding per inference.pack
is inert.  tol < 0 is bench mode: run exactly max_iters iterations.
"""

from __future__ import annotations

import sys
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from ..utils import PAD_THRESHOLD
from .pack import DeviceProblem, acc_dtype


class RCGState(NamedTuple):
    gamma: jax.Array  # (E, G) log q(z)
    d: jax.Array  # (E, G): XLA impl = conjugate direction; Pallas impl =
    #             PREVIOUS gamma (d is rebuilt as gamma - gamma_prev + r,
    #             saving one matrix write + read per iteration — see
    #             ops/rcg_pallas.py module docstring)
    r: jax.Array  # (E, 1) lse-shift vector (Pallas impl only; zeros in XLA)
    n_counts: jax.Array  # (G,) Dirichlet posterior counts N (acc dtype)
    oldnorm: jax.Array  # scalar, previous metric norm (acc)
    bound: jax.Array  # scalar ELBO, running (acc)
    delta: jax.Array  # scalar, last accepted improvement (acc)
    it: jax.Array  # int32 iterations executed
    done: jax.Array  # bool
    just_reset: jax.Array  # bool, momentum was reset last step


def _rownorm(x):
    return x - jax.scipy.special.logsumexp(x, axis=-1, keepdims=True)


def _rowsum_acc(x):
    """Sum (E, G) -> scalar: f32 row sums, f64 across rows."""
    return jnp.sum(jnp.sum(x, axis=1).astype(acc_dtype()))


def _colsum_acc(x):
    """Sum (E, G) -> (G,): f32 within row blocks, f64 across blocks.

    Keeps the f64 work at O(E/B * G) elements instead of O(E * G).
    """
    E, G = x.shape
    B = 1024
    while E % B != 0:
        B //= 2
    if B <= 1:
        return jnp.sum(x.astype(acc_dtype()), axis=0)
    part = jnp.sum(x.reshape(E // B, B, G), axis=1)
    return jnp.sum(part.astype(acc_dtype()), axis=0)


def _weighted_colsum(w_phi):
    return _colsum_acc(w_phi)


def _make_step(tol: float):
    def step(st: RCGState, logL, counts, alpha):
        acc = acc_dtype()
        dtype = logL.dtype

        psi_n = digamma(st.n_counts).astype(dtype)
        eta = _rownorm(logL + psi_n[None, :])
        s = eta - st.gamma

        phi_old = jnp.exp(st.gamma)
        w_old = counts[:, None] * phi_old
        newnorm = _rowsum_acc(w_old * s * s)
        beta_fr = jnp.where(
            st.just_reset | (st.it == 0) | (st.oldnorm <= 0),
            jnp.zeros((), acc),
            newnorm / st.oldnorm,
        ).astype(dtype)

        d_new = s + beta_fr * st.d
        gamma_new = _rownorm(st.gamma + d_new)
        phi_new = jnp.exp(gamma_new)
        w_new = counts[:, None] * phi_new

        # ELBO change, elementwise-difference-first (see module docstring).
        data_diff = w_new * (logL - gamma_new) - w_old * (logL - st.gamma)
        elbo_delta = _rowsum_acc(data_diff)
        n_new = alpha.astype(acc) + _weighted_colsum(w_new)
        dirichlet_delta = jnp.sum(gammaln(n_new) - gammaln(st.n_counts))
        delta = elbo_delta + dirichlet_delta
        bound_new = st.bound + delta

        return _step_epilogue(
            st, tol, gamma_new, d_new, st.r, n_new, newnorm, delta, bound_new
        )

    return step


def _step_epilogue(st, tol, gamma_new, d_new, r_new, n_new, newnorm, delta, bound_new):
    """Accept/revert + convergence bookkeeping shared by both step impls.

    The revert (bound decreased -> undo step, reset momentum) is a rare
    numerical-floor event, so it is a lax.cond: the accepted path passes
    buffers through instead of paying full-matrix selects every
    iteration (under vmap this degrades to the equivalent select).
    """
    acc = acc_dtype()
    decreased = delta < 0

    # Converged: accepted step with 0 <= improvement < tol, or a pure
    # VB step that still "decreased" (numerical floor).  tol < 0 is
    # bench mode: never converge.
    if tol < 0:
        newly_done = jnp.zeros((), bool)
    else:
        newly_done = (~decreased & (delta < tol)) | (decreased & st.just_reset)

    # On revert, d/r keep their stale values: just_reset forces beta=0 on
    # the next step, so they are never read before being rewritten.
    gamma_out, d_out, r_out, n_out, norm_out, bound_out, delta_out = jax.lax.cond(
        decreased,
        lambda: (
            st.gamma,
            st.d,
            st.r,
            st.n_counts,
            jnp.ones((), acc),
            st.bound,
            st.delta,
        ),
        lambda: (gamma_new, d_new, r_new, n_new, newnorm, bound_new, delta),
    )

    return RCGState(
        gamma=gamma_out,
        d=d_out,
        r=r_out,
        n_counts=n_out,
        oldnorm=norm_out,
        bound=bound_out,
        delta=delta_out,
        it=st.it + 1,
        done=st.done | newly_done,
        just_reset=decreased,
    )


def _step_epilogue_optimistic(st, gamma_new, d_new, r_new, n_new, newnorm, delta, bound_new):
    """Always-accept epilogue: no revert/convergence cond on the big buffers.

    The accept/revert lax.cond in _step_epilogue costs ~4 extra (E, G)
    HBM traffics per iteration (XLA materializes the selected buffers),
    nearly doubling the per-iteration cost, to guard against an event
    that only occurs at the numerical floor.  The optimistic step always
    accepts; the HOST detects events from the per-iteration delta
    history at chunk boundaries and replays the chunk exactly when one
    fired (see _fit_rcg_pallas_optimistic) — per-iteration semantics are
    preserved, the hot path never pays for the cond.  Verbose diagnostics
    print from the host at the chunk-boundary sync (no jax.debug.print:
    host callbacks are unsupported on remote-dispatch TPU backends).
    """
    return RCGState(
        gamma=gamma_new,
        d=d_new,
        r=r_new,
        n_counts=n_new,
        oldnorm=newnorm,
        bound=bound_new,
        delta=delta,
        it=st.it + 1,
        done=st.done,
        just_reset=jnp.zeros((), bool),
    )


def _make_kernels(mesh, interpret):
    """The fused-Pallas pair of passes for one iteration, mesh-aware.

    Two fused passes over the (E, G) matrices (norm, then update) with
    per-block f32 partials summed in f64 by the caller, exactly
    mirroring _rowsum_acc/_colsum_acc two-stage accumulation.

    With a mesh, the kernel calls run under shard_map over the "ec"
    axis: each device runs the fused kernels on its EC shard and the
    G-sized sufficient statistics (newnorm, colsum, ELBO delta) merge
    with psum over ICI — the TPU-native form of the reference's
    MPI-allreduce design (docs/compilation.md:40-58).
    """
    from ..ops import rcg_pallas

    acc = acc_dtype()

    def kernels(logL, gamma, gprev, r, counts2d, psi, oldnorm, no_momentum):
        """Per-shard kernel calls; reductions are shard-local here."""
        newnorm_f32, lse1, rowelbo = rcg_pallas.rcg_norm(
            logL, gamma, counts2d, psi, interpret=interpret
        )
        newnorm = newnorm_f32.astype(acc)
        if mesh is not None:
            newnorm = jax.lax.psum(newnorm, "ec")
        beta_fr = jnp.where(
            no_momentum | (oldnorm <= 0), jnp.zeros((), acc), newnorm / oldnorm
        ).astype(logL.dtype)

        gamma_new, r_new, colsum, elbo_f32 = rcg_pallas.rcg_update(
            logL, gamma, gprev, counts2d, psi, lse1, rowelbo, r, beta_fr,
            interpret=interpret,
        )
        colsum = colsum.astype(acc)
        elbo_delta = elbo_f32.astype(acc)
        if mesh is not None:
            colsum = jax.lax.psum(colsum, "ec")
            elbo_delta = jax.lax.psum(elbo_delta, "ec")
        return gamma_new, r_new, colsum, elbo_delta, newnorm

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        sharded = P("ec", None)
        rep = P()
        kernels = shard_map(
            kernels,
            mesh=mesh,
            in_specs=(sharded, sharded, sharded, sharded, sharded, rep, rep, rep),
            out_specs=(sharded, sharded, rep, rep, rep),
            check_vma=False,
        )
    return kernels


def _make_step_pallas(tol: float, interpret: bool, mesh=None, optimistic: bool = False):
    """RCGState-shaped step built on _make_kernels (exact/revert path)."""
    acc = acc_dtype()
    kernels = _make_kernels(mesh, interpret)

    def step(st: RCGState, logL, counts, alpha):
        dtype = logL.dtype
        psi = digamma(st.n_counts).astype(dtype)[None, :]
        no_momentum = st.just_reset | (st.it == 0)

        gamma_new, r_new, colsum, elbo_delta, newnorm = kernels(
            logL, st.gamma, st.d, st.r, counts[:, None], psi, st.oldnorm, no_momentum
        )
        n_new = alpha.astype(acc) + colsum
        dirichlet_delta = jnp.sum(gammaln(n_new) - gammaln(st.n_counts))
        delta = elbo_delta + dirichlet_delta
        bound_new = st.bound + delta

        # New gamma_prev = the old gamma (same buffer, no copy).
        if optimistic:
            return _step_epilogue_optimistic(
                st, gamma_new, st.gamma, r_new, n_new, newnorm, delta, bound_new
            )
        return _step_epilogue(
            st, tol, gamma_new, st.gamma, r_new, n_new, newnorm, delta, bound_new
        )

    return step


@jax.jit
def _rcg_init(logL, counts, alpha, bc):
    acc = acc_dtype()
    dtype = logL.dtype
    # gamma_0 = log(1/G) on real groups; NEG-ish on padded groups so their
    # softmax weight is 0 from the start.
    init_logits = jnp.where(logL > jnp.asarray(PAD_THRESHOLD, dtype), 0.0, logL)
    gamma0 = _rownorm(init_logits)
    w0 = counts[:, None] * jnp.exp(gamma0)
    n0 = alpha.astype(acc) + _weighted_colsum(w0)
    # Exact initial bound (one full evaluation; all later bounds accumulate
    # deltas on top of this f64 scalar).
    bound0 = (
        jnp.asarray(bc, acc)
        + jnp.sum(gammaln(n0))
        + _rowsum_acc(w0 * (logL - gamma0))
    )
    return RCGState(
        gamma=gamma0,
        # d starts at zeros; the first step runs with beta=0 (no momentum),
        # so both impls' readings of this slot (direction / gamma_prev)
        # are inert until first written.
        d=jnp.zeros_like(gamma0),
        r=jnp.zeros((gamma0.shape[0], 1), dtype),
        n_counts=n0,
        oldnorm=jnp.ones((), acc),
        bound=bound0,
        delta=jnp.asarray(jnp.inf, acc),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        just_reset=jnp.zeros((), bool),
    )


def _pick_impl(logL, mesh=None) -> str:
    """Fused Pallas step on TPU with f32 matrices — single chip or an
    "ec"-axis mesh (shard_map + psum); plain XLA otherwise (CPU and f64
    validation runs)."""
    from ..ops import rcg_pallas

    mesh_ok = mesh is None or tuple(mesh.axis_names) == ("ec",)
    if (
        jax.default_backend() == "tpu"
        and mesh_ok
        and rcg_pallas.supports(logL)
    ):
        return "pallas"
    return "xla"


def _guarded_step(step, st, logL, counts, alpha):
    """Freeze converged states: cond pass-through, not a full select."""
    return jax.lax.cond(
        st.done, lambda s: s, lambda s: step(s, logL, counts, alpha), st
    )


@partial(jax.jit, static_argnames=("length", "tol", "impl", "mesh"))
def _rcg_chunk(
    state, logL, counts, alpha, *, length: int, tol: float,
    impl: str = "xla", mesh=None,
):
    """length iterations as one on-device lax.scan (XLA step impl).

    Returns (state, history) where history = (active, bound, reset) per
    scan step — tiny (length,) vectors the host uses for verbose
    diagnostics (jax.debug.print would need host callbacks, which
    remote-dispatch TPU backends do not support).  Frozen (converged)
    steps have active=False.
    """
    if impl == "pallas_interpret":  # CPU correctness testing of the kernels
        step = _make_step_pallas(tol, interpret=True, mesh=mesh)
    else:
        step = _make_step(tol)

    def body(st, _):
        new = _guarded_step(step, st, logL, counts, alpha)
        return new, (~st.done, new.bound, new.just_reset)

    state, hist = jax.lax.scan(body, state, None, length=length)
    return state, hist


@partial(jax.jit, static_argnames=("tol", "mesh"), donate_argnums=(0,))
def _rcg_step_pallas_jit(state, logL, counts, alpha, *, tol: float, mesh=None):
    """One fused-kernel iteration, dispatched from the host.

    The Pallas path deliberately does NOT wrap its step in lax.scan:
    XLA's compile time for scan-of-pallas_call grows pathologically with
    the array size (hours at E=2^19 where the standalone kernel compiles
    in <1s).  Host dispatch is asynchronous, so issuing `chunk` of these
    back-to-back pipelines on device exactly like a scan; the state is
    donated so gamma/d update in place.

    This exact (cond-ful) variant is the REPLAY step of the optimistic
    scheme; the hot path is _rcg_opt_step_*.
    """
    step = _make_step_pallas(tol, interpret=False, mesh=mesh)
    return _guarded_step(step, state, logL, counts, alpha)


def _opt_step_flat(
    gamma, gprev, r, n_counts, oldnorm, it, bound, hist, it0,
    logL, counts, alpha, *, mesh, interpret,
):
    """One always-accept iteration with the state UNPACKED.

    The caller keeps `gamma` alive host-side and ping-pongs it into the
    next call's `gprev` slot; gamma is deliberately NOT returned.  The
    round-2 shape of this step (pack the state, return RCGState with
    d=old-gamma) made XLA insert THREE full-matrix defensive copies per
    iteration (~11 ms at E=2^19: a donated input returned verbatim as an
    output conflicts with the pallas in/out alias of gprev->gamma'), which
    is exactly what the donation + input_output_aliases design was meant
    to avoid.  With gamma held by the host and only (gprev, r, hist)
    donated, every buffer pairs with exactly one same-shaped output and
    the profile shows zero copies.
    """
    from ..ops import rcg_pallas  # noqa: F401 (kernels built below)

    acc = acc_dtype()
    step_kernels = _make_kernels(mesh, interpret)
    psi = digamma(n_counts).astype(logL.dtype)[None, :]
    no_momentum = it == 0

    gamma_new, r_new, colsum, elbo_delta, newnorm = step_kernels(
        logL, gamma, gprev, r, counts[:, None], psi, oldnorm, no_momentum
    )
    n_new = alpha.astype(acc) + colsum
    dirichlet_delta = jnp.sum(gammaln(n_new) - gammaln(n_counts))
    delta = elbo_delta + dirichlet_delta
    hist = jax.lax.dynamic_update_slice(hist, delta[None], (it - it0,))
    return gamma_new, r_new, n_new, newnorm, it + 1, bound + delta, hist


# Donating variant clobbers (gprev, r, hist): gprev's buffer becomes
# gamma' (the pallas in/out alias), r's becomes r'.  The fresh variant
# donates nothing — used for the first TWO steps of a snapshot chunk so
# the chunk-start (gamma0, gprev0, r0) survive for replay (gamma0 is
# step 1's gprev, so it must not be donated there either).
_rcg_opt_flat_donate = partial(
    jax.jit, static_argnames=("mesh", "interpret"), donate_argnums=(1, 2, 7)
)(_opt_step_flat)
_rcg_opt_flat_fresh = partial(
    jax.jit, static_argnames=("mesh", "interpret")
)(_opt_step_flat)


def _fit_rcg_pallas_optimistic(
    state, logL, counts, alpha, *, tol, max_iters, verbose, chunk, mesh, interpret=False
):
    """Host driver for the optimistic Pallas path.

    Chunks of always-accept steps run device-resident (async host
    dispatches, donated buffers); each step records its ELBO delta in a
    tiny (chunk,)-history.  At the chunk boundary the host fetches the
    history (one small transfer — the only sync) and scans it for the
    first EVENT: a bound decrease (exact semantics: revert + momentum
    reset) or convergence (0 <= delta < tol).  Event-free chunks — all
    iterations except the last few near the numerical floor — never pay
    for the accept/revert cond, which costs ~4 (E, G) HBM traffics per
    iteration when done in-device.

    On an event at chunk-local step j the chunk is REPLAYED from the
    (undonated) chunk-start snapshot: j optimistic steps (identical
    results by determinism) for a convergence event, or the exact
    cond-ful step for the remainder when a revert fired.  Per-iteration
    trajectories and iteration counts therefore match the exact path
    bit-for-bit.

    Verbose diagnostics print from the HOST at the chunk-boundary sync
    (reconstructed from the delta history) so discarded speculative
    suffixes never print and replayed iterations print exactly once;
    the exact-step tail after a revert also prints host-side, per
    dispatch (jax.debug.print needs host callbacks, which
    remote-dispatch TPU backends like axon do not support).
    """
    import numpy as np

    acc = acc_dtype()
    bench_mode = tol < 0 and not verbose

    def run_chunk(carry, n, it0, protect):
        """n always-accept steps from `carry`, host-side gamma ping-pong.

        `protect`: how many leading steps use the non-donating stepper.
        With snapshots (protect=2) the chunk-start (gamma0, gprev0, r0)
        buffers survive for replay; bench mode passes protect=0 and runs
        with just 3 live matrices (logL + the two gamma buffers) — what
        lets reference-scale problems fit single-chip HBM.
        """
        gamma, gprev, r, n_counts, oldnorm, itc, bound = carry
        hist = jnp.zeros((n,), acc)
        for j in range(n):
            stepper = _rcg_opt_flat_fresh if j < protect else _rcg_opt_flat_donate
            gamma_new, r, n_counts, oldnorm, itc, bound, hist = stepper(
                gamma, gprev, r, n_counts, oldnorm, itc, bound, hist, it0,
                logL, counts, alpha, mesh=mesh, interpret=interpret,
            )
            gprev, gamma = gamma, gamma_new
        return (gamma, gprev, r, n_counts, oldnorm, itc, bound), hist

    def to_state(carry, done):
        gamma, gprev, r, n_counts, oldnorm, itc, bound = carry
        return RCGState(
            gamma=gamma, d=gprev, r=r, n_counts=n_counts, oldnorm=oldnorm,
            bound=bound, delta=jnp.asarray(jnp.inf, acc), it=itc,
            done=jnp.asarray(done, bool), just_reset=jnp.zeros((), bool),
        )

    carry = (state.gamma, state.d, state.r, state.n_counts,
             state.oldnorm, state.it, state.bound)
    it = 0
    while it < max_iters:
        n = min(chunk, max_iters - it)
        snapshot = carry
        # Real copy (not an alias of the carried it): the chunk donates
        # buffers while it0 may still be referenced.
        it0 = carry[5] + jnp.zeros((), carry[5].dtype)
        carry, hist = run_chunk(carry, n, it0, protect=0 if bench_mode else 2)
        if bench_mode:  # no convergence checks, no replay
            it += n
            continue
        h = np.asarray(hist)  # chunk-boundary sync
        decreased = h < 0
        converged = (tol >= 0) & (h >= 0) & (h < tol)
        event = decreased | converged
        j = int(np.argmax(event)) if event.any() else n
        if verbose:
            # The snapshot's first two steps never donate, so the
            # chunk-start bound is still fetchable here.
            b0 = float(np.asarray(snapshot[6]))
            bounds = b0 + np.cumsum(h)
            # Print accepted iterations; after a revert the whole chunk
            # re-runs (and prints) through the exact step below, so host
            # printing stops at the chunk start in that case.
            if j < n and decreased[j]:
                upto = 0
            elif j < n:
                upto = j + 1  # convergence event: its line is accepted
            else:
                upto = n
            for k in range(upto):
                print(
                    f"  iter {it + k + 1}  bound {bounds[k]}  (reset=False)",
                    file=sys.stderr,
                )
        if tol < 0 or not event.any():
            it += n
            continue
        # Restore the chunk-start state and re-run exactly.
        if converged[j] and not decreased[j]:
            # Deterministic replay of the j+1 accepted steps, then stop.
            carry, _ = run_chunk(snapshot, j + 1, it0, protect=2)
            return to_state(carry, done=True)
        state = to_state(snapshot, done=False)
        # A revert fired: finish the fit with the exact cond-ful step
        # (reverts cluster at the numerical floor, so this tail is short).
        while it < max_iters:
            m = min(chunk, max_iters - it)
            for _ in range(m):
                was_done = bool(state.done) if verbose else False
                if interpret:
                    state, _ = _rcg_chunk(
                        state, logL, counts, alpha, length=1, tol=float(tol),
                        impl="pallas_interpret", mesh=mesh,
                    )
                else:
                    state = _rcg_step_pallas_jit(
                        state, logL, counts, alpha, tol=float(tol), mesh=mesh,
                    )
                if verbose and not was_done:
                    print(
                        f"  iter {int(state.it)}  bound "
                        f"{float(state.bound)}  (reset={bool(state.just_reset)})",
                        file=sys.stderr,
                    )
            it += m
            if bool(state.done):
                break
        return state
    return to_state(carry, done=False)


def _fit_rcg_arrays(
    logL,
    counts,
    alpha,
    bc,
    *,
    tol: float,
    max_iters: int,
    verbose: bool,
    chunk: int = 16,
    impl: str | None = None,
    mesh=None,
):
    if impl is None:
        impl = _pick_impl(logL, mesh)
    state = _rcg_init(logL, counts, alpha, bc)
    if impl in ("pallas", "pallas_opt_interpret"):
        state = _fit_rcg_pallas_optimistic(
            state, logL, counts, alpha, tol=float(tol), max_iters=max_iters,
            verbose=verbose, chunk=chunk, mesh=mesh,
            interpret=(impl == "pallas_opt_interpret"),
        )
        return state.gamma, state.it, state.bound
    it = 0
    while it < max_iters:
        n = min(chunk, max_iters - it)
        state, hist = _rcg_chunk(
            state, logL, counts, alpha, length=n, tol=float(tol),
            impl=impl,
            mesh=mesh if impl == "pallas_interpret" else None,
        )
        if verbose:
            _print_chunk_history(it, hist)
        it += n
        if bool(state.done):
            break
    return state.gamma, state.it, state.bound


def _print_chunk_history(it0: int, hist) -> None:
    """Host-side per-iteration diagnostics from a chunk's history
    (active steps form a prefix: convergence freezes the scan state)."""
    import numpy as np

    active, bounds, resets = (np.asarray(h) for h in hist)
    for k in range(len(active)):
        if not active[k]:
            break
        print(
            f"  iter {it0 + k + 1}  bound {bounds[k]}  (reset={bool(resets[k])})",
            file=sys.stderr,
        )


def fit_rcg(
    problem: DeviceProblem,
    *,
    tol: float = 1e-6,
    max_iters: int = 5000,
    verbose: bool = False,
    counts=None,
    chunk: int = 16,
    impl: str | None = None,
):
    """Run rcg on a packed problem. Returns (gamma, n_iters, bound).

    `gamma` keeps the padded (E_pad, G_pad) shape (slice with
    problem.n_ecs/n_groups when materializing outputs); `counts`
    optionally overrides problem.counts (bootstrap replicates).
    `impl` None = auto: fused Pallas kernels on TPU (shard_map + psum on
    an "ec" mesh), XLA elsewhere.
    """
    c = problem.counts if counts is None else counts
    if impl is None:
        impl = _pick_impl(problem.logL, problem.mesh)
    return _fit_rcg_arrays(
        problem.logL,
        c,
        problem.alpha,
        problem.bound_const,
        tol=float(tol),
        max_iters=int(max_iters),
        verbose=bool(verbose),
        chunk=chunk,
        impl=impl,
        mesh=problem.mesh if impl.startswith("pallas") else None,
    )


def fit_rcg_batch(
    problem: DeviceProblem,
    counts_batch,
    *,
    tol: float = 1e-6,
    max_iters: int = 5000,
    chunk: int = 16,
):
    """vmapped rcg over a (B, E) batch of count vectors sharing one logL.

    This is the TPU formulation of the reference's serial bootstrap loop
    (src/mSWEEP.cpp:496-518): replicates advance in lockstep chunks; each
    replicate freezes at its own convergence iteration, and the host
    loop stops when all are done.
    """
    init = jax.vmap(lambda c: _rcg_init(problem.logL, c, problem.alpha, problem.bound_const))
    state = init(counts_batch)
    it = 0
    while it < max_iters:
        n = min(chunk, max_iters - it)
        state = jax.vmap(
            lambda st, c: _rcg_chunk(
                st, problem.logL, c, problem.alpha, length=n, tol=float(tol)
            )[0]
        )(state, counts_batch)
        it += n
        if bool(jnp.all(state.done)):
            break
    return state.gamma, state.it, state.bound
