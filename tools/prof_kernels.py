"""Per-kernel timing on the real TPU: where does the rcg iteration go?

All timed reps run data-chained inside ONE lax.scan dispatch (see
_scan_time) — host-chained loops through the remote (axon) tunnel
produced wildly wrong readings in both directions.

Nominal v5e roofline: 819 GB/s HBM => 2.6 ms/iter floor for the
implicit-gamma step (2 traffics x 1 GiB at E=2^19, G=512, f32).
Measured reality (round 4): the kernels are MEMORY-bound, and the
practical single-stream Pallas read rate tops out near ~340 GB/s
steady-state on this device — a read-only kernel with the production
operand structure costs the same as the full softmax body, so the exp
sweeps and per-cell ALU work are hidden behind the DMA.  Removing an
entire softmax from pass 1 gains only ~8%.  A "two-stream" variant
(logL bound twice over half-ranges, two in-flight DMAs) reached
~360-380 GB/s in isolation but LOST ~6-11% end-to-end in the production
scan; single-stream ships (docs/benchmarks.md).

NOTE on microbench trust: some minimal kernels (plain read+sum with few
operands) report physically impossible rates through this stack even
when their RESULTS are correct — treat any reading above the HBM
roofline as instrumentation failure, and prefer the norm/update/full
rows (they cross-check against `python bench.py` end-to-end numbers).

Microbenches (WHICH env, comma-sep):
  dispatch  per-jit-call overhead (tiny op, chained, sync every rep)
  dispatch_async  same but only one final sync (pipelined dispatch rate)
  copy      read-bandwidth ceiling attempt (see trust note above)
  exp       read + exp + rowsum: one exp sweep at streaming rate
  exp2      read + two exp sweeps (max/exp/sum twice)
  norm      current rcg pass 1 (rcg_norm: grad norm + old row ELBO)
  update    current rcg pass 2 (rcg_update: colsum + ELBO delta)
  full      full implicit rcg iterations via the production scan chunk
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
WHICH = os.environ.get(
    "WHICH", "dispatch,dispatch_async,copy,exp,exp2,norm,update,full"
).split(",")

print(f"backend={jax.default_backend()} E={E} G={G} reps={REPS}", file=sys.stderr)

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
logL = jax.nn.log_softmax(jax.random.normal(k1, (E, G), jnp.float32) * 4.0, axis=1)
gamma0 = jax.nn.log_softmax(jax.random.normal(k2, (E, G), jnp.float32), axis=1)
counts2d = jnp.ones((E, 1), jnp.float32)
psi = jnp.zeros((1, G), jnp.float32)

from msweep_tpu.ops import rcg_pallas

GIB = E * G * 4 / 1e9
BE = int(os.environ.get("BE", 0)) or rcg_pallas._pick_block_e(E, G)


_ROOFLINE_GBPS = 819.0  # v5e HBM; any implied rate above this is invalid


def report(name, dt, traffics):
    gbps = traffics * GIB / dt
    flag = ""
    if gbps > _ROOFLINE_GBPS:
        # same guard bench.py applies to the scored metric: a reading
        # above the physical roofline is an instrumentation failure
        # (see the module docstring's trust note), not a result.
        flag = "  << INVALID: above HBM roofline, instrumentation failure"
    print(
        f"{name:28s} {dt*1e3:8.3f} ms   {gbps:6.1f} GB/s   "
        f"({traffics} traffics, {E*G/dt/1e9:.1f} G cells/s){flag}"
    )


def _mat(be):
    return pl.BlockSpec((be, G), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _vec(be):
    return pl.BlockSpec((be, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


def bench_dispatch(sync_each=True):
    @jax.jit
    def run(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    x = run(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(REPS * 5):
        x = run(x)
        if sync_each:
            jax.block_until_ready(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / (REPS * 5)
    tag = "sync-each" if sync_each else "async-chain"
    print(f"dispatch {tag:18s} {dt*1e3:8.3f} ms/call")


def _read_kernel(x_ref, s_ref, o_ref):
    # cheapest possible full read: one add per cell + row-sum; the smem
    # scalar makes each rep's input depend on the previous rep's output
    # so chained reps cannot overlap or be elided.
    o_ref[:, :] = jnp.sum(x_ref[:] + s_ref[0, 0] * 1e-30, axis=1, keepdims=True)



def _scan_time(run_one):
    """Time REPS data-chained kernel launches inside ONE lax.scan dispatch.

    Host-chained rep loops are meaningless through the remote (axon)
    tunnel — dispatch pipelining and lazy completion produced both 400x
    under- and 6x over-roofline readings.  A scan executes entirely on
    device, like the production _rcg_chunk, so wall time is device time.
    run_one(logL, s) must return a scalar; the carry feeds the next rep.
    """

    @jax.jit
    def scan(x, s0):
        def body(s, _):
            # the raw result is the next carry: a `r * 0` chain let XLA
            # constant-fold the carry and dead-code the kernel entirely
            # (observed: "200 TB/s").  Kernels fold the scalar to ~0
            # INSIDE the opaque pallas body instead.
            r = run_one(x, s.reshape(1, 1))
            return jnp.reshape(r, ())[()] * 1.0, None
        out, _ = jax.lax.scan(body, s0, None, length=REPS)
        return out

    s0 = jnp.zeros((), jnp.float32)
    jax.block_until_ready(scan(logL, s0))
    t0 = time.perf_counter()
    jax.block_until_ready(scan(logL, s0))
    return (time.perf_counter() - t0) / REPS


def bench_copy(be):
    """READ-bandwidth ceiling (the rcg/EM kernels write ~nothing).

    NOTE a previous version used an aliased in-place copy kernel chained
    by donation; XLA elided the chain and reported absurd bandwidth.
    This version chains through a scalar smem operand like _bench_exp."""
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    def run(x, s):
        # x passed as an argument: a closed-over device array would be
        # embedded as an MLIR constant, forcing a host fetch of the
        # whole matrix through the tunnel at lowering time (hangs).
        with jax.enable_x64(False):
            out = pl.pallas_call(
                _read_kernel, grid=(E // be,), in_specs=[_mat(be), smem],
                out_specs=_vec(be),
                out_shape=jax.ShapeDtypeStruct((E, 1), jnp.float32),
            )(x, s)
        return out[0]

    report(f"read be={be}", _scan_time(run), 1)


def _exp_kernel(x_ref, s_ref, o_ref):
    t = x_ref[:] + s_ref[0, 0] * 1e-30
    m = jnp.max(t, axis=1, keepdims=True)
    e = jnp.exp(t - m)
    o_ref[:, :] = m + jnp.log(jnp.sum(e, axis=1, keepdims=True))


def _exp2_kernel(x_ref, s_ref, o_ref):
    x = x_ref[:]
    t = x + s_ref[0, 0] * 1e-30
    m = jnp.max(t, axis=1, keepdims=True)
    e = jnp.exp(t - m)
    lse = m + jnp.log(jnp.sum(e, axis=1, keepdims=True))
    t2 = 0.5 * x + s_ref[0, 0] * 2.0
    m2 = jnp.max(t2, axis=1, keepdims=True)
    e2 = jnp.exp(t2 - m2)
    lse2 = m2 + jnp.log(jnp.sum(e2, axis=1, keepdims=True))
    o_ref[:, :] = lse + lse2


def _bench_exp(kernel, name, be):
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    def run(x, s):
        # x as an argument, not a closure constant (see bench_copy note)
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel, grid=(E // be,), in_specs=[_mat(be), smem],
                out_specs=_vec(be),
                out_shape=jax.ShapeDtypeStruct((E, 1), jnp.float32),
            )(x, s)
        return out[0]  # chain on a scalar

    report(f"{name} be={be}", _scan_time(run), 1)


def bench_norm():
    """Pass 1 of the implicit step: rcg_norm(logL, counts2d, psi, c, v).
    Chained on the returned scalar so reps cannot overlap."""

    def run(L, c):
        nn = rcg_pallas.rcg_norm(
            L, counts2d, psi, c[0, 0], jnp.zeros((1, G), jnp.float32)
        )
        # chain: next rep's c genuinely depends on nn (a `* 0` fold here
        # would let XLA constant-fold the carry and dead-code the kernel)
        return nn * 1e-30 + 1.0

    report("rcg_norm (pass 1)", _scan_time(run), 1)


def bench_update():
    """Pass 2 (dual softmax): rcg_update(logL, counts2d, c_old, v_old,
    c_new, v_new)."""
    zv = jnp.zeros((1, G), jnp.float32)

    def run(L, c):
        colsum, elbo = rcg_pallas.rcg_update(
            L, counts2d, c[0, 0] * 0.5, zv, c[0, 0], zv
        )
        return elbo * 1e-30 + 1.0  # genuine data dependence (see bench_norm)

    report("rcg_update (pass 2)", _scan_time(run), 1)


def bench_full():
    """Full implicit iterations via the production scan chunk
    (inference/rcg._rcg_chunk, impl='pallas'): 2 traffics/iter."""
    from msweep_tpu.inference.mixture import bound_const
    from msweep_tpu.inference.rcg import _rcg_chunk, _rcg_init_implicit

    counts = jnp.ones((E,), jnp.float32)
    alpha = jnp.ones((G,), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    bc = bound_const(np.ones(E), np.ones(G))
    st = _rcg_init_implicit(logL, counts, alpha, bc)
    run = lambda s: _rcg_chunk(
        s, logL, counts, alpha, length=REPS, tol=-1.0, impl="pallas"
    )[0]
    st = run(st)
    jax.block_until_ready(st.bound)
    st = _rcg_init_implicit(logL, counts, alpha, bc)
    t0 = time.perf_counter()
    st = run(st)
    jax.block_until_ready(st.bound)
    dt = (time.perf_counter() - t0) / REPS
    report("full implicit step (scan)", dt, 2)


if "dispatch" in WHICH:
    bench_dispatch(sync_each=True)
if "dispatch_async" in WHICH:
    bench_dispatch(sync_each=False)
if "copy" in WHICH:
    for be in [int(x) for x in os.environ.get("COPY_BE", str(BE)).split(",") if x]:
        bench_copy(be)
if "exp" in WHICH:
    _bench_exp(_exp_kernel, "exp1+lse", BE)
if "exp2" in WHICH:
    _bench_exp(_exp2_kernel, "exp2+2lse", BE)
if "norm" in WHICH:
    bench_norm()
if "update" in WHICH:
    bench_update()
if "full" in WHICH:
    bench_full()
