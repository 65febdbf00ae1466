#!/bin/bash
# Round-4 session G: the 30k full-schedule run (VERDICT r3 #3) with DENSE
# eval/checkpoint points so any deadline kill costs <= ~3k iters, plus a
# hard wall-clock budget that frees the TPU before the driver's
# end-of-round bench. Resumes from ckpt_q30k if present.
set -u
cd "$(dirname "$0")/.."
LONGQ=${1:-20400}   # hard cap ~5.7h; quality_dense resumes on re-run

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

sleep 330
stamp probe
gate || exit 1

stamp "30k full-schedule run (dense checkpoints)"
timeout "$LONGQ" python scripts/quality_dense.py \
  --iters 30000 --eval_iters 4000 7000 11000 15000 20000 25000 30000 \
  --checkpoint /root/repo/ckpt_q30k --report QUALITY_r04_30k.json \
  || echo QUALITY_30K_FAILED

stamp done
