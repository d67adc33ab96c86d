"""Per-kernel timing on the real TPU: where does the rcg iteration go?

Chained (data-dependent) reps so async dispatch cannot hide device time.

v5e roofline: 819 GB/s HBM.  6 traffics x 1 GiB (E=2^19, G=512, f32)
=> 7.9 ms/iter floor => 34 G cells/s ceiling.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = int(os.environ.get("E", 1 << 19))
G = int(os.environ.get("G", 512))
REPS = int(os.environ.get("REPS", 20))
WHICH = os.environ.get("WHICH", "copy,norm,update,full").split(",")

print(f"backend={jax.default_backend()} E={E} G={G} reps={REPS}", file=sys.stderr)

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
logL = jax.nn.log_softmax(jax.random.normal(k1, (E, G), jnp.float32) * 4.0, axis=1)
gamma0 = jax.nn.log_softmax(jax.random.normal(k2, (E, G), jnp.float32), axis=1)
gprev0 = jax.nn.log_softmax(jax.random.normal(k3, (E, G), jnp.float32), axis=1)
counts2d = jnp.ones((E, 1), jnp.float32)
psi = jnp.zeros((1, G), jnp.float32)

from msweep_tpu.ops import rcg_pallas

GIB = E * G * 4 / 1e9


def report(name, dt, traffics):
    print(f"{name:28s} {dt*1e3:8.3f} ms   {traffics*GIB/dt:6.1f} GB/s   ({traffics} traffics)")


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def bench_copy(be):
    spec = pl.BlockSpec((be, G), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @partial(jax.jit, donate_argnums=(0,))
    def run(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                _copy_kernel, grid=(E // be,), in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((E, G), jnp.float32),
                input_output_aliases={0: 0},
            )(x)

    x = gamma0 + 0
    x = run(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(REPS):
        x = run(x)
    jax.block_until_ready(x)
    report(f"copy be={be}", (time.perf_counter() - t0) / REPS, 2)


def bench_norm():
    @jax.jit
    def run(g):
        nn, lse1, rowelbo = rcg_pallas.rcg_norm(logL, g, counts2d, psi)
        return g + (nn * 0).astype(g.dtype), lse1, rowelbo

    g = gamma0 + 0
    g, lse1, rowelbo = run(g)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(REPS):
        g, lse1, rowelbo = run(g)
    jax.block_until_ready(g)
    # 2 kernel traffics + 2 for the chaining add
    report("rcg_norm (+chain 2)", (time.perf_counter() - t0) / REPS, 4)
    return lse1, rowelbo


def bench_update(lse1, rowelbo):
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(g, gp, r):
        g2, r2, colsum, elbo = rcg_pallas.rcg_update(
            logL, g, gp, counts2d, psi, lse1, rowelbo, r, jnp.float32(0.01)
        )
        return g2, g, r2  # ping-pong: old gamma becomes gamma_prev

    g, gp, r = gamma0 + 0, gprev0 + 0, jnp.zeros((E, 1), jnp.float32)
    g, gp, r = run(g, gp, r)
    jax.block_until_ready((g, gp))
    t0 = time.perf_counter()
    for _ in range(REPS):
        g, gp, r = run(g, gp, r)
    jax.block_until_ready((g, gp))
    report("rcg_update donated", (time.perf_counter() - t0) / REPS, 4)


def bench_full():
    from msweep_tpu.inference.mixture import bound_const
    from msweep_tpu.inference.rcg import _rcg_init, _rcg_opt_step_donate, _rcg_opt_step_fresh

    counts = jnp.ones((E,), jnp.float32)
    alpha = jnp.ones((G,), jnp.float64)
    bc = bound_const(np.ones(E), np.ones(G))
    state = _rcg_init(logL, counts, alpha, bc)
    hist = jnp.zeros((REPS + 1,), jnp.float64)
    it0 = state.it
    state, hist = _rcg_opt_step_fresh(state, hist, it0, logL, counts, alpha, mesh=None, interpret=False)
    jax.block_until_ready(state.gamma)
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, hist = _rcg_opt_step_donate(state, hist, it0, logL, counts, alpha, mesh=None, interpret=False)
    jax.block_until_ready(state.gamma)
    dt = (time.perf_counter() - t0) / REPS
    report("full opt step (donated)", dt, 6)
    print(f"  = {E*G/dt/1e9:.2f} G cells/s")


if "copy" in WHICH:
    for be in [int(x) for x in os.environ.get("COPY_BE", "256").split(",") if x]:
        bench_copy(be)
if "norm" in WHICH or "update" in WHICH:
    lse1, rowelbo = bench_norm()
    if "update" in WHICH:
        bench_update(lse1, rowelbo)
if "full" in WHICH:
    bench_full()
