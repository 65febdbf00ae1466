#!/bin/bash
# Round-4 endgame: after the 30k run's deadline kill, resume from the
# latest checkpoint WITHOUT training (iters == checkpoint iteration) to
# produce the final eval + BOTH mesh extractions + chamfer, bounded so the
# chip is free before the driver's end-of-round bench.
# Usage: _tpu_session_r4i.sh <ckpt_iter> [budget_seconds]
set -u
cd "$(dirname "$0")/.."
CK=${1:?checkpoint iteration}
BUDGET=${2:-2100}

stamp() { echo "=== $1 $(date +%T) ==="; }
stamp "mesh recovery from ckpt_q30k @ $CK (budget ${BUDGET}s)"
timeout "$BUDGET" python scripts/quality_dense.py \
  --iters "$CK" --eval_iters "$CK" --checkpoint /root/repo/ckpt_q30k \
  --report QUALITY_r04_30k_mesh.json || echo MESH_RECOVERY_FAILED
stamp done
