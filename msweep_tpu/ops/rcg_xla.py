"""XLA (jnp) twins of the implicit-rcg Pallas passes, in any dtype.

Same math as ops/rcg_pallas.rcg_norm / rcg_update (see that module's
derivation), expressed as plain jnp so XLA can run it in float64 —
which Mosaic cannot.  Used by the PRECISION-ESCALATION tail of the rcg
fit (inference/rcg.py): the f32 Pallas path converges to its numerical
floor (per-iteration ELBO deltas below the f32 row-differencing noise,
~1e-3 at reference scale, are unobservable), after which these passes
continue the SAME implicit O(G) iteration with f64 arithmetic until the
true tol is reached.

Memory: a naive whole-matrix jnp formulation lets XLA materialize
multiple (E, G) f64 temporaries — measured 61 GB at reference scale,
4x over a v5e's HBM.  Both passes therefore lax.scan over fixed row
blocks: logL stays in its compact on-device dtype (f32, a free reshape
view), each block upcasts ~1k rows at a time, and only (block, G) f64
temporaries ever exist.  The implicit design's O(G) state and
4 B/cell/pass streaming traffic survive the precision escalation —
which is how the framework beats the reference's all-double rcggpu run
(27.9 GB working set, docs/gpubenchmarks.md:18) at equal convergence
honesty on a 16 GB chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import PAD_THRESHOLD

_BLOCK_ROWS = 8192  # f64 temporaries per block: 8192 x 512 x 8 B x ~6 = 200 MB


def _pick_block(E: int) -> int:
    b = _BLOCK_ROWS
    while E % b != 0:
        b //= 2
    return max(b, 1)


def _masked_softmax(logL, L, chat, vhat):
    """Twin of rcg_pallas._masked_softmax in L.dtype (the pad mask keys
    off the ORIGINAL logL values, padded cells stay at their NEG)."""
    ghat = jnp.where(logL <= jnp.asarray(PAD_THRESHOLD, logL.dtype), L, chat * L + vhat)
    m = jnp.max(ghat, axis=1, keepdims=True)
    num = jnp.exp(ghat - m)
    denom = jnp.sum(num, axis=1, keepdims=True)
    gamma = (ghat - m) - jnp.log(denom)
    return gamma, num, denom


@jax.jit
def rcg_norm(logL, counts2d, psi, c, v):
    """Pass 1 at gamma = (c, v): returns the newnorm scalar in
    psi.dtype (f64 on the escalation path)."""
    dt = psi.dtype
    E, G = logL.shape
    b = _pick_block(E)
    Lb = logL.reshape(E // b, b, G)
    cb = counts2d.reshape(E // b, b, 1)

    def body(acc, xs):
        Lraw, cnt = xs
        L = Lraw.astype(dt)
        t = L + psi
        m1 = jnp.max(t, axis=1, keepdims=True)
        lse1 = m1 + jnp.log(jnp.sum(jnp.exp(t - m1), axis=1, keepdims=True))
        gamma, num, denom = _masked_softmax(Lraw, L, c, v)
        w = cnt.astype(dt) * (num / denom)
        s = (t - lse1) - gamma
        return acc + jnp.sum(w * s * s), None

    newnorm, _ = jax.lax.scan(body, jnp.zeros((), dt), (Lb, cb))
    return newnorm


@jax.jit
def rcg_bound_stats(logL, counts2d, c, v):
    """(data_term, colsum) of gamma = (c, v), one blocked f64 pass.

    data_term = sum_e c_e sum_g phi (L - gamma) and colsum = the N
    update — together with bound_const + lgamma(N) this is the EXACT
    f64 ELBO at (c, v).  The blind-f32 escalation tail evaluates this
    every K iterations as its honest convergence supervisor."""
    dt = c.dtype
    E, G = logL.shape
    b = _pick_block(E)
    Lb = logL.reshape(E // b, b, G)
    cb = counts2d.reshape(E // b, b, 1)

    def body(acc, xs):
        Lraw, cnt = xs
        data, colsum = acc
        L = Lraw.astype(dt)
        gamma, num, denom = _masked_softmax(Lraw, L, c, v)
        w = cnt.astype(dt) * (num / denom)
        data = data + jnp.sum(jnp.sum(w * (L - gamma), axis=1))
        colsum = colsum + jnp.sum(w, axis=0)
        return (data, colsum), None

    (data, colsum), _ = jax.lax.scan(
        body, (jnp.zeros((), dt), jnp.zeros((G,), dt)), (Lb, cb)
    )
    return data, colsum


@jax.jit
def rcg_update(logL, counts2d, c_old, v_old, c_new, v_new):
    """Pass 2: (colsum (G,), elbo-delta scalar) at gamma' = (c_new,
    v_new), differencing the old data term recomputed at (c_old, v_old)
    per row in the same block (dual softmax — the rowelbo buffer the
    Pallas kernels also dropped; see rcg_pallas._update_kernel)."""
    dt = v_new.dtype
    E, G = logL.shape
    b = _pick_block(E)
    Lb = logL.reshape(E // b, b, G)
    cb = counts2d.reshape(E // b, b, 1)

    def body(acc, xs):
        Lraw, cnt = xs
        colsum, elbo = acc
        L = Lraw.astype(dt)
        w_scale = cnt.astype(dt)
        g_old, num_o, den_o = _masked_softmax(Lraw, L, c_old, v_old)
        w_old = w_scale * (num_o / den_o)
        row_old = jnp.sum(w_old * (L - g_old), axis=1, keepdims=True)
        g_new, num, denom = _masked_softmax(Lraw, L, c_new, v_new)
        w_new = w_scale * (num / denom)
        colsum = colsum + jnp.sum(w_new, axis=0)
        row_new = jnp.sum(w_new * (L - g_new), axis=1, keepdims=True)
        elbo = elbo + jnp.sum(row_new - row_old)
        return (colsum, elbo), None

    (colsum, elbo), _ = jax.lax.scan(
        body, (jnp.zeros((G,), dt), jnp.zeros((), dt)), (Lb, cb)
    )
    return colsum, elbo
