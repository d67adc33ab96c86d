"""Fused Pallas TPU kernels for one rcg iteration.

The rcg step (inference/rcg.py, reconstructing rcgpar::rcg_optl_* — call
sites src/mSWEEP.cpp:176-205) streams the (E, G) matrices each
iteration.  The Fletcher-Reeves coefficient needs a global reduction
over the *current* natural-gradient direction before the update can be
applied, so one iteration is inherently two passes:

  pass 1 (norm):    read logL, gamma            -> newnorm, lse1,
                                                   per-row old ELBO terms
  pass 2 (update):  read logL, gamma, gamma_prev (+ (E,1) vectors)
                    write gamma'                 -> r', colsum, ELBO delta

Total SIX (E, G)-array traffics plus ~4/G of vector traffic per
iteration.  The conjugate direction d is never stored: with
u = t + beta*d the update satisfies

  gamma' = u - lse(u)        and        d' = u - lse1 - gamma,

so    d' = (gamma' - gamma) + r'   with   r' = lse(u) - lse1  (E,1).

Carrying (gamma, gamma_prev, r) instead of (gamma, d) therefore removes
one full (E, G) write AND one read per iteration (7 -> 6 traffics for
the pair of passes; d is rebuilt in-kernel with two adds).  The
subtraction gamma - gamma_prev of nearly-equal f32s is exact (Sterbenz),
so the rebuilt d carries the same O(eps*|gamma|) absolute error as a
stored one.

On top of the bandwidth floor the step is exp-bound on the VPU, so the
kernels are arranged to spend exactly THREE exp sweeps per iteration:

  1. exp(t - m) for the row logsumexp of eta        (pass 1)
  2. exp(gamma) for the metric weights              (pass 1)
  3. exp(u - m2) for the retraction row-softmax     (pass 2)

Pass 2 reuses its softmax numerator for the new weights
(w_new = c * e2 / sum(e2) == c * exp(gamma_new), exactly), and reads
lse1 from pass 1 instead of recomputing eta.

The ELBO data-term change is accumulated from per-row differences
(sum_g w_new(logL - gamma') minus pass 1's per-row old sums): rows
change little near convergence, so the row-level cancellation keeps the
f64 total accurate at tolerances far below f32 resolution of the whole
term (same reasoning as rcg.py module docstring point 2).

Reductions accumulate across the sequential TPU grid into
constant-index output tiles (grid steps run in order on one core, so
read-modify-write of a resident output block is the standard Pallas
accumulation pattern).  G rides the 128-wide lanes in one block
(G_pad <= _MAX_G), the E axis is the grid.

Padding contract (inference/pack.py): padded rows have counts == 0 so
they contribute 0 to every partial; padded group columns hold NEG so
their softmax weight underflows to 0 exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Every (block_e, G) f32 operand block must fit VMEM (~16 MB) with
# double buffering.  512KB blocks measured fastest on v5e across kernels
# (2MB: ~-15%; 4MB: VMEM stack OOM) — the pipeline wants enough grid
# steps in flight to hide DMA behind compute.
_MAX_G = 4096


def _pick_block_e(E: int, G: int, target_bytes: int = 512 * 1024) -> int:
    target = max(8, target_bytes // (G * 4))
    be = 8  # E_pad is always a multiple of 8 (pack.SUBLANE)
    while be * 2 <= target and E % (be * 2) == 0:
        be *= 2
    return be


def _row_logsumexp(t):
    m = jnp.max(t, axis=1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(t - m), axis=1, keepdims=True))


def _acc_add(ref, value):
    """Full-tile broadcast accumulate (scalar and sub-tile VMEM stores are
    not supported by the Mosaic lowering); every cell carries the running
    total, the caller reads [0, 0] / row 0."""
    ref[:, :] += jnp.broadcast_to(value, ref.shape)


def _norm_kernel(logL_ref, gamma_ref, counts_ref, psi_ref,
                 norm_ref, lse1_ref, rowelbo_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        norm_ref[:, :] = jnp.zeros_like(norm_ref)

    logL = logL_ref[:]
    gamma = gamma_ref[:]
    t = logL + psi_ref[:]
    lse1 = _row_logsumexp(t)  # exp sweep 1
    s = (t - lse1) - gamma
    w = counts_ref[:] * jnp.exp(gamma)  # exp sweep 2
    lse1_ref[:, :] = lse1
    rowelbo_ref[:, :] = jnp.sum(w * (logL - gamma), axis=1, keepdims=True)
    _acc_add(norm_ref, jnp.sum(w * s * s))


def _update_kernel(
    beta_ref,  # (1,1) SMEM scalar: Fletcher-Reeves coefficient
    logL_ref,
    gamma_ref,
    gprev_ref,  # previous gamma: d = gamma - gamma_prev + r
    counts_ref,
    psi_ref,
    lse1_ref,
    rowelbo_ref,
    r_ref,  # (E,1) lse-shift carried from the previous update
    gnew_ref,
    rnew_ref,
    colsum_ref,
    elbo_ref,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        colsum_ref[:, :] = jnp.zeros_like(colsum_ref)
        elbo_ref[:, :] = jnp.zeros_like(elbo_ref)

    logL = logL_ref[:]
    gamma = gamma_ref[:]
    t = logL + psi_ref[:]
    d = (gamma - gprev_ref[:]) + r_ref[:]
    u = t + beta_ref[0, 0] * d

    # rownorm(gamma + d_new) == u - lse(u): the lse1 shift cancels.
    m2 = jnp.max(u, axis=1, keepdims=True)
    e2 = jnp.exp(u - m2)  # exp sweep 3 — reused for the weights below
    s2 = jnp.sum(e2, axis=1, keepdims=True)
    logs2 = jnp.log(s2)
    g_new = (u - m2) - logs2
    # d_new = (u - lse1) - gamma = (g_new - gamma) + r_new:
    rnew_ref[:, :] = (m2 + logs2) - lse1_ref[:]

    c = counts_ref[:]
    w_new = (c / s2) * e2  # == c * exp(g_new), no extra exp sweep

    gnew_ref[:] = g_new
    _acc_add(colsum_ref, jnp.sum(w_new, axis=0, keepdims=True))
    row_new = jnp.sum(w_new * (logL - g_new), axis=1, keepdims=True)
    _acc_add(elbo_ref, jnp.sum(row_new - rowelbo_ref[:]))


def supports(logL) -> bool:
    return (
        logL.dtype == jnp.float32
        and logL.ndim == 2
        and logL.shape[1] <= _MAX_G
        and logL.shape[0] % 8 == 0
        and logL.shape[1] % 128 == 0
    )


def _mat_spec(be, G):
    return pl.BlockSpec((be, G), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _vec_spec(be):
    return pl.BlockSpec((be, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _acc_spec(rows, cols):
    """Constant-index accumulator block resident in VMEM for all steps."""
    return pl.BlockSpec((rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("interpret",))
def rcg_norm(logL, gamma, counts2d, psi, *, interpret: bool = False):
    """Returns (newnorm scalar f32, lse1 (E,1) f32, rowelbo_old (E,1) f32)."""
    E, G = logL.shape
    be = _pick_block_e(E, G)  # 512KB blocks measured fastest on v5e
    # x64 mode turns index-map literals into i64 scalars, which the
    # Mosaic lowering cannot legalize; kernels are pure f32/i32.
    with jax.enable_x64(False):
        norm, lse1, rowelbo = pl.pallas_call(
            _norm_kernel,
            grid=(E // be,),
            in_specs=[
                _mat_spec(be, G),
                _mat_spec(be, G),
                _vec_spec(be),
                pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[_acc_spec(8, 128), _vec_spec(be), _vec_spec(be)],
            out_shape=[
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
                jax.ShapeDtypeStruct((E, 1), jnp.float32),
                jax.ShapeDtypeStruct((E, 1), jnp.float32),
            ],
            interpret=interpret,
        )(logL, gamma, counts2d, psi)
    return norm[0, 0], lse1, rowelbo


@partial(jax.jit, static_argnames=("interpret",))
def rcg_update(logL, gamma, gprev, counts2d, psi, lse1, rowelbo, r, beta, *, interpret: bool = False):
    """Apply the conjugate step.

    Returns (gamma_new, r_new (E,1), colsum (G,) f32, elbo_delta scalar
    f32) where elbo_delta is already the data-term CHANGE vs the
    pre-step state (row-level differencing against pass 1's per-row
    sums).  The caller's next state is (gamma_new, gamma, r_new): the
    old gamma becomes gamma_prev with no copy.
    """
    E, G = logL.shape
    be = _pick_block_e(E, G)  # 512KB blocks measured fastest on v5e
    beta2d = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    with jax.enable_x64(False):
        gamma_new, r_new, colsum, elbo = pl.pallas_call(
            _update_kernel,
            grid=(E // be,),
            # gamma' overwrites gamma_prev in place (that buffer is dead
            # after this kernel: the state ping-pongs between the two
            # gamma buffers), and r' overwrites r.  Declaring the alias
            # lets donated state buffers thread through with ZERO copies
            # — XLA's own donation pass was inserting full-matrix copies
            # (~7 ms/iter at E=2^19) when left to infer reuse; when the
            # caller still needs gamma_prev (the exact step's revert
            # cond), jax inserts the preserving copy automatically.
            input_output_aliases={3: 0, 8: 1},
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                _mat_spec(be, G),
                _mat_spec(be, G),
                _mat_spec(be, G),
                _vec_spec(be),
                pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
                _vec_spec(be),
                _vec_spec(be),
                _vec_spec(be),
            ],
            out_specs=[
                _mat_spec(be, G),
                _vec_spec(be),
                _acc_spec(8, G),
                _acc_spec(8, 128),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((E, G), jnp.float32),
                jax.ShapeDtypeStruct((E, 1), jnp.float32),
                jax.ShapeDtypeStruct((8, G), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            interpret=interpret,
        )(beta2d, logL, gamma, gprev, counts2d, psi, lse1, rowelbo, r)
    return gamma_new, r_new, colsum[0, :], elbo[0, 0]
