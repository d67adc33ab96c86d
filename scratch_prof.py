"""Microbenchmark of the rcg step components on the real TPU."""
import time

_T0 = time.time()


def mark(s):
    print(f"[{time.time()-_T0:7.1f}s] {s}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from msweep_tpu.inference.rcg import _rcg_init, _rcg_step_pallas_jit
from msweep_tpu.ops import rcg_pallas

E, G = 1 << 19, 512
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
mark("make data")
logL = jax.nn.log_softmax(jax.random.normal(k1, (E, G), jnp.float32) * 4.0, axis=1)
counts = jax.random.randint(k2, (E,), 1, 100).astype(jnp.float32)
alpha = jnp.ones((G,), jnp.float32)
bc = -1000.0  # constant offset only; irrelevant for timing

mark("init state")
st = _rcg_init(logL, counts, alpha, bc)
gamma = jax.block_until_ready(st.gamma)
d = jnp.zeros_like(gamma)
counts2d = counts[:, None]
psi = jax.scipy.special.digamma(st.n_counts).astype(jnp.float32)[None, :]
mark("state ready")


def _force(out):
    """axon block_until_ready appears async; fetching a value truly syncs."""
    leaf = jax.tree.leaves(out)[0]
    idx = (0,) * leaf.ndim
    return float(leaf[idx])


def timeit(name, fn, *args, n=30):
    _force(fn(*args))  # compile + sync
    mark(f"{name}: compiled")
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    _force(out)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.3f} ms  ({E*G/dt/1e9:7.2f} Gcells/s-equiv)",
          flush=True)
    return dt


# 1. HBM copy bandwidth reference: read+write one (E,G) f32 array
t = timeit("copy x+1 (2 traffics)", jax.jit(lambda x: x + 1.0), logL)
print(f"  -> implied HBM BW {2*E*G*4/t/1e9:.0f} GB/s", flush=True)

# 2. norm kernel alone (2 mat reads + vectors)
nk = jax.jit(rcg_pallas.rcg_norm)
timeit("rcg_norm kernel", nk, logL, gamma, counts2d, psi)

norm, lse1, rowelbo = jax.block_until_ready(nk(logL, gamma, counts2d, psi))
beta = jnp.zeros((), jnp.float32)

# 3. update kernel alone (3 mat reads + 2 mat writes + vectors)
uk = jax.jit(rcg_pallas.rcg_update)
timeit("rcg_update kernel", uk, logL, gamma, d, counts2d, psi, lse1, rowelbo, beta)


# 4. both kernels back to back
@jax.jit
def both(logL, gamma, d, counts2d, psi, beta):
    n, l1, re = rcg_pallas.rcg_norm(logL, gamma, counts2d, psi)
    return rcg_pallas.rcg_update(logL, gamma, d, counts2d, psi, l1, re, beta)


timeit("norm+update kernels", both, logL, gamma, d, counts2d, psi, beta)

# 5. the full step as dispatched in production (donated state)
state = _rcg_init(logL, counts, alpha, bc)
state = jax.block_until_ready(state)


def full_step(_):
    global state
    state = _rcg_step_pallas_jit(state, logL, counts, alpha, tol=1e-6, verbose=False)
    return state.bound


timeit("full _rcg_step_pallas_jit", full_step, None)
mark("done")


# 6. the optimistic step (production hot path)
from msweep_tpu.inference.rcg import _rcg_opt_step_donate, _rcg_opt_step_fresh

state2 = _rcg_init(logL, counts, alpha, bc)
hist = jnp.zeros((64,), jnp.float64)
it0 = state2.it + jnp.zeros((), state2.it.dtype)
state2, hist = _rcg_opt_step_fresh(state2, hist, it0, logL, counts, alpha,
                                   verbose=False, mesh=None, interpret=False)


def opt_step(_):
    global state2, hist
    state2, hist = _rcg_opt_step_donate(state2, hist, it0, logL, counts, alpha,
                                        verbose=False, mesh=None, interpret=False)
    return state2.bound


timeit("optimistic step", opt_step, None)

# 7. epilogue-only cost: digamma+gammaln+scalars on the G-sized f64 state
from jax.scipy.special import digamma, gammaln

@jax.jit
def epi(n_counts, alpha, colsum):
    psi = digamma(n_counts).astype(jnp.float32)
    n_new = alpha.astype(jnp.float64) + colsum
    dd = jnp.sum(gammaln(n_new) - gammaln(n_counts))
    return psi, n_new, dd

nc = jnp.asarray(np.random.default_rng(0).uniform(1, 100, G), jnp.float64)
cs = jnp.asarray(np.random.default_rng(1).uniform(1, 100, G), jnp.float64)
timeit("epilogue f64 G-ops", epi, nc, alpha, cs)
mark("done2")
