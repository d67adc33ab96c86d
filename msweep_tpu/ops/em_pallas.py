"""Fused Pallas TPU kernel for one EM iteration (the "emgpu" algorithm).

One EM step (inference/em.py, replacing rcgpar::em_torch — call site
src/mSWEEP.cpp:202) needs exactly one pass over the (E, G) likelihood
matrix: row logsumexp at the current theta, responsibility-weighted
column sums for the M-step, and the objective-change dot product against
the previous iteration's row logsumexp vector.  This kernel fuses all
three into a single HBM read of logL (plus (E,)-vector lse traffic,
~1/G of the matrix), making EM the cheapest iteration in the framework:
1 array-traffic/iteration vs rcg's 7.

Same accumulation and padding contracts as ops/rcg_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rcg_pallas import _acc_add, _acc_spec, _mat_spec, _pick_block_e


def _em_kernel(
    logL_ref,
    counts_ref,
    lse_prev_ref,
    logtheta_ref,
    lse_ref,
    colsum_ref,
    ddot_ref,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        colsum_ref[:, :] = jnp.zeros_like(colsum_ref)
        ddot_ref[:, :] = jnp.zeros_like(ddot_ref)

    t = logL_ref[:] + logtheta_ref[:]
    m = jnp.max(t, axis=1, keepdims=True)
    e = jnp.exp(t - m)  # the kernel's single exp sweep
    s = jnp.sum(e, axis=1, keepdims=True)
    lse = m + jnp.log(s)
    c = counts_ref[:]
    w = (c / s) * e  # == c * exp(t - lse), softmax numerator reused

    lse_ref[:, :] = lse
    _acc_add(colsum_ref, jnp.sum(w, axis=0, keepdims=True))
    # Objective data-term change vs the previous iteration: differences
    # of nearly-equal row logsumexps stay f32-accurate near convergence.
    _acc_add(ddot_ref, jnp.sum(c * (lse - lse_prev_ref[:])))


@partial(jax.jit, static_argnames=("interpret",))
def em_step(logL, counts2d, lse_prev2d, logtheta, *, interpret: bool = False):
    """Returns (lse (E,1) f32, colsum (G,) f32, ddot scalar f32)."""
    E, G = logL.shape
    be = _pick_block_e(E, G)  # 512KB blocks measured fastest (4MB OOMs VMEM)
    vec = lambda: pl.BlockSpec((be, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        lse, colsum, ddot = pl.pallas_call(
            _em_kernel,
            grid=(E // be,),
            in_specs=[
                _mat_spec(be, G),
                vec(),
                vec(),
                pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[vec(), _acc_spec(8, G), _acc_spec(8, 128)],
            out_shape=[
                jax.ShapeDtypeStruct((E, 1), jnp.float32),
                jax.ShapeDtypeStruct((8, G), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            interpret=interpret,
        )(logL, counts2d, lse_prev2d, logtheta)
    return lse, colsum[0, :], ddot[0, 0]
