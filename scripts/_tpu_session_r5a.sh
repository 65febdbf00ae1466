#!/bin/bash
# Round-5 session A: trimmed priority chain for a short round window.
# Answers, in order (from BENCH_NOTES round-4 pending list):
#  1. Did the one-gather packed-table build (c8bda92) kill the dense
#     binning bar? (dense breakdown attribution)
#  2. Current-defaults merged bench (headline + dense) -> round number.
#  3. Pack-rides-sort at dense (RADEGS_FEAT_RIDE=1).
#  4. Scan vs scatter reduction at dense.
#  5. Backward orientation nm vs mn at 100k.
# Tight timeouts so the chip is free for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."

stamp() { echo "=== $1 $(date +%T) ==="; }
gate() {
  for i in 1 2 3; do
    if timeout 150 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128,128)) @ jnp.ones((128,128)); print('PROBE_OK', float(x[0,0]))"; then
      return 0
    fi
    echo "# gate: probe hung (try $i/3); 330s full quiet"
    sleep 330
  done
  echo GATE_FAILED
  return 1
}

stamp probe
gate || exit 1

stamp "1. breakdown dense (one-gather attribution)"
timeout 1200 python scripts/bench_breakdown.py --scene dense || echo BD_DENSE_FAILED

gate || exit 1
stamp "2. merged bench (current defaults)"
timeout 1000 python bench.py --no-parity || echo BENCH_FAILED

gate || exit 1
stamp "3. pack ride A/B dense (RADEGS_FEAT_RIDE=1)"
timeout 600 env RADEGS_FEAT_RIDE=1 python bench.py --scene dense --auto --no-parity || echo RIDE_FAILED

gate || exit 1
stamp "4. scan reduction A/B dense"
timeout 600 env RADEGS_REDUCE_IMPL=scan python bench.py --scene dense --auto --no-parity || echo SCAN_FAILED

gate || exit 1
stamp "5. bwd orient nm A/B (100k)"
timeout 500 env RADEGS_BWD_ORIENT=nm python bench.py --scene 100k --no-parity || echo ORIENT_FAILED

stamp done
