#!/bin/bash
# Round-4 session F: triage bench at the proven legacy config (also the
# first measurement of the new owner-merge + compaction-sort ranges, which
# are default-on), then commit the session's centerpiece: the 30k
# full-schedule quality run (VERDICT r3 #3) at the r4c-proven config.
set -u
cd "$(dirname "$0")/.."
LONGQ=${1:-25200}

stamp() { echo "=== $1 $(date +%T) ==="; }
gate() {
  for i in 1 2 3 4 5 6; do
    if timeout 150 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128,128)) @ jnp.ones((128,128)); print('PROBE_OK', float(x[0,0]))"; then
      return 0
    fi
    echo "# gate: probe hung (try $i/6); 330s full quiet"
    sleep 330
  done
  echo GATE_FAILED
  return 1
}

sleep 330  # full quiet after the killed compile
stamp probe
gate || exit 1

stamp "triage bench: 100k, legacy pack + scatter (new owner/ranges active)"
timeout 1500 python bench.py --scene 100k --no-parity || echo TRIAGE_100K_FAILED

gate || exit 1
stamp "dense bench, legacy pack + scatter"
timeout 2700 python bench.py --scene dense --auto --no-parity || echo TRIAGE_DENSE_FAILED

gate || exit 1
stamp "LONG full-schedule run (VERDICT r3 #3): 30k iters, checkpointed"
timeout "$LONGQ" python scripts/quality_dense.py \
  --iters 30000 --eval_iters 7000 15000 30000 \
  --checkpoint /root/repo/ckpt_q30k --report QUALITY_r04_30k.json \
  || echo QUALITY_30K_FAILED

stamp done
