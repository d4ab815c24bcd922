#!/usr/bin/env bash
# Local CI: the same gate .github/workflows/ci.yml runs, for a dev box.
# Usage: scripts/ci_local.sh [--full]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint =="
python scripts/lint.py

echo "== smoke tests (8-device CPU mesh) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest tests/ -q -x

if [[ "${1:-}" == "--full" ]]; then
    echo "== full tier =="
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m pytest tests/ -q --runslow
fi

echo "== multi-chip dryrun =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== multi-process dist-dryrun =="
python -m circom_compat_tpu dist-dryrun --processes 2

echo "CI local: ALL GREEN"
