"""Device meshes for EC-axis data parallelism.

The scaling story (SURVEY.md sections 2.3 and 7): the EC dimension is sharded
across chips/hosts (the reference's MPI-era rcg_optl_mpi sharded the
same axis across ranks, docs/compilation.md:40-58) while the small group
dimension is replicated.  Arrays are placed with NamedSharding over a
1-D ("ec",) mesh; the jitted optimizers then run SPMD — XLA inserts the
all-reduces for the G-sized sufficient statistics (N_k, ELBO, theta)
automatically from the shardings, which is the psum-over-ICI design.

Multi-host: call init_distributed() (jax.distributed.initialize) before
building the mesh; per-host ingest can read disjoint file shards.
"""

from __future__ import annotations

import numpy as np


def make_ec_mesh(n_shards: int = 0):
    """1-D mesh over the first n_shards devices (0 = all). None if 1."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices) if n_shards in (0, None) else int(n_shards)
    if n <= 1:
        return None
    if n > len(devices):
        raise ValueError(f"requested {n} shards but only {len(devices)} devices")
    return Mesh(np.array(devices[:n]), ("ec",))


def init_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host process-group init (replaces the reference's MPI rank
    setup; root-only logging handled by Log(process_index=...))."""
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def to_host(arr) -> np.ndarray:
    """Bring a device array to host numpy, gathering across processes.

    Single-process (and fully-replicated multi-process) arrays convert
    directly; EC-sharded arrays in multi-process runs are all-gathered so
    the root process can do the reference's root-only output I/O
    (docs/compilation.md:56-58 in the reference)."""
    import jax

    if isinstance(arr, np.ndarray):
        return arr
    if arr.is_fully_addressable or arr.is_fully_replicated:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
