"""Isolate the 6.8ms/iter overhead of the optimistic rcg step."""
import time

_T0 = time.time()


def mark(s):
    print(f"[{time.time()-_T0:7.1f}s] {s}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from jax.scipy.special import digamma, gammaln

from msweep_tpu.inference.rcg import _rcg_init
from msweep_tpu.ops import rcg_pallas

E, G = 1 << 19, 512
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
logL = jax.nn.log_softmax(jax.random.normal(k1, (E, G), jnp.float32) * 4.0, axis=1)
counts = jax.random.randint(k2, (E,), 1, 100).astype(jnp.float32)
alpha = jnp.ones((G,), jnp.float32)

state = _rcg_init(logL, counts, alpha, -1000.0)
state = jax.tree.map(lambda x: x, state)
mark("state made")


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, n=30):
    _force(fn(*args))
    mark(f"{name}: compiled")
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    _force(out)
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt*1e3:8.3f} ms", flush=True)
    return dt


acc = jnp.float64

# A. step with counts2d reshaped INSIDE the jit (current behavior)
@jax.jit
def step_reshape_inside(logL, alpha, gamma, d, n_counts, oldnorm, bound, counts):
    psi = digamma(n_counts).astype(jnp.float32)[None, :]
    c2 = counts[:, None]
    nn, lse1, rowelbo = rcg_pallas.rcg_norm(logL, gamma, c2, psi)
    beta = (nn.astype(acc) / oldnorm).astype(jnp.float32)
    g2, d2, colsum, elbo = rcg_pallas.rcg_update(
        logL, gamma, d, c2, psi, lse1, rowelbo, beta
    )
    n_new = alpha.astype(acc) + colsum.astype(acc)
    delta = elbo.astype(acc) + jnp.sum(gammaln(n_new) - gammaln(n_counts))
    return g2, d2, n_new, nn.astype(acc), bound + delta


# B. same but counts2d precomputed outside
counts2d = jax.device_put(np.asarray(counts).reshape(E, 1))


@jax.jit
def step_hoisted(logL, alpha, gamma, d, n_counts, oldnorm, bound, c2):
    psi = digamma(n_counts).astype(jnp.float32)[None, :]
    nn, lse1, rowelbo = rcg_pallas.rcg_norm(logL, gamma, c2, psi)
    beta = (nn.astype(acc) / oldnorm).astype(jnp.float32)
    g2, d2, colsum, elbo = rcg_pallas.rcg_update(
        logL, gamma, d, c2, psi, lse1, rowelbo, beta
    )
    n_new = alpha.astype(acc) + colsum.astype(acc)
    delta = elbo.astype(acc) + jnp.sum(gammaln(n_new) - gammaln(n_counts))
    return g2, d2, n_new, nn.astype(acc), bound + delta


# C. kernels only, f32 scalar glue (no f64 transcendentals at all)
@jax.jit
def step_nof64(logL, gamma, d, c2, psi, beta):
    nn, lse1, rowelbo = rcg_pallas.rcg_norm(logL, gamma, c2, psi)
    g2, d2, colsum, elbo = rcg_pallas.rcg_update(
        logL, gamma, d, c2, psi, lse1, rowelbo, beta
    )
    return g2, d2, nn, colsum, elbo


gamma0, d0 = state.gamma, state.d
nc0 = state.n_counts
on0 = jnp.ones((), acc)
b0 = jnp.zeros((), acc)
psi0 = digamma(nc0).astype(jnp.float32)[None, :]
beta0 = jnp.zeros((), jnp.float32)

timeit("A step, reshape inside", step_reshape_inside, logL, alpha, gamma0, d0, nc0, on0, b0, counts)
timeit("B step, counts2d hoisted", step_hoisted, logL, alpha, gamma0, d0, nc0, on0, b0, counts2d)
timeit("C kernels only (f32 glue)", step_nof64, logL, gamma0, d0, counts2d, psi0, beta0)


# D. unrolled 4-step version of B (one dispatch per 4 iterations)
@jax.jit
def step4(logL, alpha, gamma, d, n_counts, oldnorm, bound, c2):
    for _ in range(4):
        gamma, d, n_counts, oldnorm, bound = step_hoisted.__wrapped__(
            logL, alpha, gamma, d, n_counts, oldnorm, bound, c2
        )
    return gamma, d, n_counts, oldnorm, bound


t4 = timeit("D 4-step unrolled", step4, logL, alpha, gamma0, d0, nc0, on0, b0, counts2d, n=10)
print(f"  -> per-iteration {t4/4*1e3:.3f} ms", flush=True)
mark("done")
