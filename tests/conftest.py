"""Test configuration: force CPU backend with 8 virtual devices + x64.

jax is already imported at interpreter startup in this environment (a
sitecustomize registers the axon TPU plugin), so env vars alone are too
late; jax.config.update still works because backends initialize lazily.
The 8 virtual CPU devices are the multi-chip test rig (SURVEY.md section 6: the
TPU analog of the reference's MPI rank-count-invariance checks).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
