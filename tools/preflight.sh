#!/usr/bin/env bash
# Preflight gate: run before every end-of-round / milestone commit.
#
# Round 3 shipped a snapshot whose production rcg path crashed on its
# first call — a 30-second check would have caught it.  This script IS
# that check: the full test suite, the quick bench suite (real backend),
# and the driver's two graft entry points.  All four must pass.
#
# Usage:  bash tools/preflight.sh            # full gate
#         MSWEEP_PREFLIGHT_CPU=1 bash ...    # force bench onto CPU
#                                            # (when no TPU is reachable)
set -u
cd "$(dirname "$0")/.."
fail=0

step() {
  echo "== preflight: $1" >&2
  shift
  if "$@"; then
    echo "== preflight: OK" >&2
  else
    echo "== preflight: FAILED ($1)" >&2
    fail=1
  fi
}

step "pytest" timeout 2400 python -m pytest tests/ -q

if [ "${MSWEEP_PREFLIGHT_CPU:-0}" = "1" ]; then
  step "bench quick (cpu)" timeout 1800 env JAX_PLATFORMS=cpu \
    MSWEEP_BENCH_SUITE=quick MSWEEP_BENCH_E=65536 MSWEEP_BENCH_G=128 \
    python bench.py
else
  step "bench quick" timeout 1800 env MSWEEP_BENCH_SUITE=quick python bench.py
fi

step "graft entry (single chip compile)" timeout 900 python -c "
import __graft_entry__ as g, jax
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print('entry ok')
"

step "graft dryrun_multichip(8)" timeout 900 env \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun ok')
"

if [ "$fail" -ne 0 ]; then
  echo "preflight: RED — do not commit a snapshot from this state" >&2
  exit 1
fi
echo "preflight: all green" >&2
