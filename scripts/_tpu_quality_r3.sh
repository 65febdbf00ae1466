#!/bin/bash
# Round-3 quality protocol run (VERDICT r2 #4) — launch AFTER the bench
# session; strictly sequential TPU use.
set -u
cd "$(dirname "$0")/.."
echo "=== probe $(date +%T) ==="
timeout 200 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128,128)) @ jnp.ones((128,128)); print('PROBE_OK')" || { echo PROBE_FAILED; exit 1; }
echo "=== quality_dense 7k $(date +%T) ==="
# ~7k iters at ~1-2 it/s + 16 GT renders + 2 mesh extractions + chamfer
timeout 28800 python scripts/quality_dense.py --iters 7000 \
  --eval_iters 1000 3000 7000 --report QUALITY_r03.json
echo "=== done $(date +%T) rc=$? ==="
