"""Donation cost isolation: chained production optimistic steps."""
import time

_T0 = time.time()


def mark(s):
    print(f"[{time.time()-_T0:7.1f}s] {s}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from msweep_tpu.inference.rcg import (
    _rcg_init,
    _rcg_opt_step_donate,
    _rcg_opt_step_fresh,
)

E, G = 1 << 19, 512
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
logL = jax.nn.log_softmax(jax.random.normal(k1, (E, G), jnp.float32) * 4.0, axis=1)
counts = jax.random.randint(k2, (E,), 1, 100).astype(jnp.float32)
alpha = jnp.ones((G,), jnp.float32)


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def run_chain(stepper, n=30):
    state = _rcg_init(logL, counts, alpha, -1000.0)
    hist = jnp.zeros((n + 2,), jnp.float64)
    it0 = state.it + jnp.zeros((), state.it.dtype)
    # compile + warm the stepper under test
    state, hist = stepper(
        state, hist, it0, logL, counts, alpha, verbose=False, mesh=None, interpret=False
    )
    _force(state.bound)
    t0 = time.time()
    for _ in range(n):
        state, hist = stepper(
            state, hist, it0, logL, counts, alpha,
            verbose=False, mesh=None, interpret=False,
        )
    _force(state.bound)
    return (time.time() - t0) / n


mark("chain with donation")
dt = run_chain(_rcg_opt_step_donate)
print(f"donated chain   {dt*1e3:8.3f} ms/step", flush=True)

mark("chain without donation")
try:
    dt = run_chain(_rcg_opt_step_fresh)
    print(f"fresh chain     {dt*1e3:8.3f} ms/step", flush=True)
except Exception as e:
    print(f"fresh chain failed: {type(e).__name__}: {e}", flush=True)
mark("done")
