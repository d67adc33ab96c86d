"""Benchmark harness: rcg optimizer throughput on the standard problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: rcg cell-updates/sec = E_pad * G_pad * iters / elapsed on a
synthetic f32 problem (E=2^19 ECs x G=512 groups by default; override
with MSWEEP_BENCH_E/G/ITERS).  Cell-updates/s is size-independent, so it
can be compared against the reference's published numbers
(docs/gpubenchmarks.md): rcggpu on an NVIDIA A100 ran 220 iterations in
43 s at ~28 GB f64 working set; with rcgpar-torch keeping ~3 live
(G x E) f64 arrays that is ~1.16e9 cells, giving ~5.9e9 cell-updates/s.
vs_baseline = ours / 5.9e9 (>1 means faster than the reference's A100).
"""

import json
import os
import sys
import time

import numpy as np

A100_BASELINE_CELLS_PER_SEC = 5.9e9  # derived above from docs/gpubenchmarks.md:18


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # f64 scalar accumulation
    import jax.numpy as jnp

    E = int(os.environ.get("MSWEEP_BENCH_E", 1 << 19))
    G = int(os.environ.get("MSWEEP_BENCH_G", 512))
    iters = int(os.environ.get("MSWEEP_BENCH_ITERS", 30))
    dtype = jnp.float32

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from msweep_tpu.inference.mixture import bound_const
    from msweep_tpu.inference.rcg import _fit_rcg_arrays

    print(f"bench: E={E} G={G} iters={iters} dtype={dtype.__name__} "
          f"backend={jax.default_backend()} devices={len(jax.devices())}",
          file=sys.stderr)

    # Synthetic likelihood with realistic structure: each EC strongly
    # prefers a few groups (keeps exp/logsumexp in realistic ranges).
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    logL = jax.nn.log_softmax(
        jax.random.normal(k1, (E, G), dtype) * 4.0, axis=1
    )
    counts = jax.random.randint(k2, (E,), 1, 100).astype(dtype)
    alpha = jnp.ones((G,), dtype)
    bc = bound_const(np.asarray(counts, np.float64), np.ones(G))

    # tol=-1 is bench mode: never converge, run exactly n iterations
    # (one scan chunk per call -> a single device dispatch).
    run = lambda n: _fit_rcg_arrays(
        logL, counts, alpha, bc, max_iters=n, tol=-1.0, verbose=False, chunk=n
    )
    # Warmup must use the same chunk length as the timed run — length is a
    # static argument of the jitted scan, so a different n recompiles.
    t0 = time.time()
    jax.block_until_ready(run(iters))
    print(f"bench: compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    gamma, it, bound = jax.block_until_ready(run(iters))
    elapsed = time.time() - t0
    assert int(it) == iters
    assert np.isfinite(float(bound)), "non-finite bound in bench"

    cells = E * G * iters
    rate = cells / elapsed
    its_per_sec = iters / elapsed
    print(
        f"bench: {iters} iters in {elapsed:.3f}s = {its_per_sec:.2f} it/s, "
        f"{rate/1e9:.2f} G cell-updates/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "rcg_cell_updates_per_sec",
                "value": rate,
                "unit": "cells/s",
                "vs_baseline": rate / A100_BASELINE_CELLS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
