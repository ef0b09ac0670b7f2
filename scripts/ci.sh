#!/usr/bin/env bash
# CI entry (reference: .github/workflows/ci.yml builds + ctest).
# Runs the test suite on the virtual CPU mesh, builds the native extension,
# and smoke-runs the benchmarks + index validator.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
python -c "from diagon_tpu.native import available; assert available(), 'native tier failed to build'"

echo "== unit + integration tests =="
python -m pytest tests/ -q

echo "== graft entry dryrun (8-device virtual mesh) =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
fn, args = g.entry()
jax.jit(fn)(*args)
print('entry OK')
"

echo "== bench smoke (CPU) =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import sys; sys.argv = ['bench.py', '--quick', '--skip-parity',
                        '--batch', '16', '--iters', '2', '--latency-reps', '2']
exec(open('bench.py').read())
"

echo "CI OK"
