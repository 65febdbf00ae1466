#!/bin/bash
# Round-3 TPU measurement session — strictly sequential (CLAUDE.md: one
# TPU process at a time; chain everything in ONE background command).
# Usage: bash scripts/_tpu_session_r3.sh > /tmp/tpu_r3_session.log 2>&1
set -u
cd "$(dirname "$0")/.."

stamp() { echo "=== $1 $(date +%T) ==="; }

stamp probe
timeout 200 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128,128)) @ jnp.ones((128,128)); print('PROBE_OK', float(x[0,0]), jax.devices()[0].platform)" || { echo PROBE_FAILED; exit 1; }

stamp "bench (headline 100k + parity, then dense --auto; one merged JSON line)"
timeout 9000 python bench.py

stamp "breakdown 100k"
timeout 2400 python scripts/bench_breakdown.py --iters 8 || echo BREAKDOWN_100K_FAILED

stamp "breakdown dense (settled budget)"
timeout 3600 python scripts/bench_breakdown.py --scene dense --iters 4 --budget ${DENSE_BUDGET:-12582912} || echo BREAKDOWN_DENSE_FAILED

stamp "micro_sort sort B=16M"
timeout 1200 python scripts/_micro_sort.py --which sort --b $((1<<24)) || echo MICRO_SORT_FAILED

stamp "micro_sort sortpay B=8M"
timeout 1200 python scripts/_micro_sort.py --which sortpay --b $((1<<23)) || echo MICRO_SORTPAY_FAILED

stamp "mm-precision=high probe (100k)"
timeout 2400 env RADEGS_MM_PRECISION=high python bench.py --scene 100k --no-parity || echo MM_HIGH_FAILED

stamp "quality_dense (bounded fallback run)"
# a bounded protocol run so the round has a QUALITY artifact even if the
# full 7k run (scripts/_tpu_quality_r3.sh) doesn't fit before round end
timeout 7200 python scripts/quality_dense.py --iters 1500 \
  --eval_iters 500 1500 --report QUALITY_r03.json || echo QUALITY_FAILED

stamp done
