#!/usr/bin/env bash
# CI entry point — the gatkIntegration.sh analogue: run every golden-data
# contract (the same vectors GATK's own tests assert against), the mesh
# dry-run, and a quick benchmark sanity pass.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== unit + contract tests (8-device virtual CPU mesh) =="
python -m pytest tests/ -q

echo "== multi-chip dry run =="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip(8): OK')
"

echo "== benchmark sanity (quick) =="
python benchmarks/suite.py --quick
