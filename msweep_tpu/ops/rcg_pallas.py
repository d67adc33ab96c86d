"""Fused Pallas TPU kernels for one rcg iteration.

The rcg step (inference/rcg.py, reconstructing rcgpar::rcg_optl_* — call
sites src/mSWEEP.cpp:176-205) is HBM-bandwidth-bound: per iteration it
must stream the (E, G) arrays logL, gamma, d and write gamma', d'.  The
Fletcher-Reeves coefficient needs a global reduction over the *current*
natural-gradient direction before the update can be applied, so one
iteration is inherently two passes:

  pass 1 (norm):    read logL, gamma            -> newnorm
  pass 2 (update):  read logL, gamma, d
                    write gamma', d'            -> colsum / ELBO-delta

Total 7 (E, G)-array traffics per iteration — the speed-of-light for
this algorithm at f32 on one chip.  The unfused XLA graph materializes
eta, the row-softmax, both weight matrices and the revert selects, and
measures ~2-3x more traffic.

All row-block work (row logsumexp, exp, weighted sums) happens in VMEM.
Reductions accumulate across the sequential TPU grid into small
constant-index output blocks (TPU grid steps run in order on one core,
so read-modify-write of a resident output block is the standard Pallas
accumulation pattern); the f32 running sums lose the two-stage f64
accumulation of the XLA path but stay within f32 round-off of it, which
is already the noise floor of an f32 trajectory.  G rides the 128-wide
lanes in one block (G_pad <= _MAX_G), the E axis is the grid.

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

# One (block_e, G) f32 block of every operand must fit VMEM with double
# buffering: 5 live matrices x 2 buffers x block bytes << 16 MB.
_MAX_G = 4096
_TARGET_BLOCK_BYTES = 512 * 1024


def _pick_block_e(E: int, G: int) -> int:
    target = max(8, _TARGET_BLOCK_BYTES // (G * 4))
    be = 8  # E_pad is always a multiple of 8 (pack.SUBLANE)
    while be * 2 <= target and E % (be * 2) == 0:
        be *= 2
    return be


def _row_logsumexp(t):
    m = jnp.max(t, axis=1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(t - m), axis=1, keepdims=True))


def _norm_kernel(logL_ref, gamma_ref, counts_ref, psi_ref, out_ref):
    """Accumulate sum(c * phi * s^2), s = rownorm(logL+psi) - gamma."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    t = logL_ref[:] + psi_ref[:]
    s = (t - _row_logsumexp(t)) - gamma_ref[:]
    w = counts_ref[:] * jnp.exp(gamma_ref[:])
    # Full-tile broadcast accumulate (scalar and sub-tile VMEM stores are
    # not supported by the Mosaic lowering); every cell carries the
    # running total, the caller reads [0, 0].
    out_ref[:, :] += jnp.full(out_ref.shape, jnp.sum(w * s * s), out_ref.dtype)


def _update_kernel(
    beta_ref,  # (1,1) SMEM scalar: Fletcher-Reeves coefficient
    logL_ref,
    gamma_ref,
    d_ref,
    counts_ref,
    psi_ref,
    gnew_ref,
    dnew_ref,
    colsum_ref,
    elbo_ref,
):
    """Conjugate step + simplex retraction + sufficient-stat partials."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        colsum_ref[:, :] = jnp.zeros_like(colsum_ref)
        elbo_ref[:, :] = jnp.zeros_like(elbo_ref)

    logL = logL_ref[:]
    gamma = gamma_ref[:]
    t = logL + psi_ref[:]
    s = (t - _row_logsumexp(t)) - gamma

    d_new = s + beta_ref[0, 0] * d_ref[:]
    g_un = gamma + d_new
    g_new = g_un - _row_logsumexp(g_un)

    c = counts_ref[:]
    w_old = c * jnp.exp(gamma)
    w_new = c * jnp.exp(g_new)

    gnew_ref[:] = g_new
    dnew_ref[:] = d_new
    # Full-tile broadcast accumulates (see _norm_kernel): row 0 of the
    # colsum tile and cell [0,0] of the elbo tile are what the caller reads.
    colsum_ref[:, :] += jnp.broadcast_to(
        jnp.sum(w_new, axis=0, keepdims=True), colsum_ref.shape
    )
    # ELBO data-term change as elementwise differences (f32-safe near
    # convergence; see rcg.py module docstring point 2).
    elbo_ref[:, :] += jnp.full(
        elbo_ref.shape,
        jnp.sum(w_new * (logL - g_new) - w_old * (logL - gamma)),
        elbo_ref.dtype,
    )


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


def _acc_spec(rows, cols):
    """Constant-index accumulator block resident in VMEM for all steps."""
    return pl.BlockSpec((rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("interpret",))
def rcg_norm(logL, gamma, counts2d, psi, *, interpret: bool = False):
    """newnorm as an (8, 128) accumulator; the scalar lives at [0, 0]."""
    E, G = logL.shape
    be = _pick_block_e(E, G)
    # x64 mode turns index-map literals into i64 scalars, which the
    # Mosaic lowering cannot legalize; kernels are pure f32/i32.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _norm_kernel,
            grid=(E // be,),
            in_specs=[
                _mat_spec(be, G),
                _mat_spec(be, G),
                pl.BlockSpec((be, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=_acc_spec(8, 128),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret,
        )(logL, gamma, counts2d, psi)
    return out[0, 0]


@partial(jax.jit, static_argnames=("interpret",))
def rcg_update(logL, gamma, d, counts2d, psi, beta, *, interpret: bool = False):
    """Apply the conjugate step.

    Returns (gamma_new, d_new, colsum (G,) f32, elbo_delta scalar f32).
    """
    E, G = logL.shape
    be = _pick_block_e(E, G)
    beta2d = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    with jax.enable_x64(False):
        gamma_new, d_new, colsum, elbo = pl.pallas_call(
            _update_kernel,
            grid=(E // be,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                _mat_spec(be, G),
                _mat_spec(be, G),
                _mat_spec(be, G),
                pl.BlockSpec((be, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                _mat_spec(be, G),
                _mat_spec(be, G),
                _acc_spec(8, G),
                _acc_spec(8, 128),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((E, G), jnp.float32),
                jax.ShapeDtypeStruct((E, G), jnp.float32),
                jax.ShapeDtypeStruct((8, G), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            interpret=interpret,
        )(beta2d, logL, gamma, d, counts2d, psi)
    return gamma_new, d_new, colsum[0, :], elbo[0, 0]
