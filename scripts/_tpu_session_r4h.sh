#!/bin/bash
# Round-4 session H: consolidated pending measurements, priority-ordered so
# a short window still captures the top items. Run whenever the chip is
# free. Every stage gated + tightly timed.
#
# Pending questions this answers (BENCH_NOTES round-4):
#  1. Does the one-gather packed-table build (c8bda92) kill the dense
#     binning bar? (breakdown dense, then 100k)
#  2. Pack-rides-sort (RADEGS_FEAT_RIDE=1): compile time + runtime vs the
#     legacy post-sort gather.
#  3. Scan vs scatter gradient reduction at dense scale.
#  4. Backward orientation mn vs nm at 100k.
#  5. Composed-pipeline attribution at dense shapes (micro part3) +
#     honest primitive numbers (part2, DCE-fixed).
#  6. MXU segsum de-quarantine probe (grouped sorts).
set -u
cd "$(dirname "$0")/.."

stamp() { echo "=== $1 $(date +%T) ==="; }
gate() {
  for i in 1 2 3 4 5; do
    if timeout 150 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128,128)) @ jnp.ones((128,128)); print('PROBE_OK', float(x[0,0]))"; then
      return 0
    fi
    echo "# gate: probe hung (try $i/5); 330s full quiet"
    sleep 330
  done
  echo GATE_FAILED
  return 1
}

stamp probe
gate || exit 1

stamp "1a. breakdown dense (one-gather attribution)"
timeout 3600 python scripts/bench_breakdown.py --scene dense || echo BD_DENSE_FAILED

gate || exit 1
stamp "1b. breakdown 100k"
timeout 2400 python scripts/bench_breakdown.py --scene 100k || echo BD_100K_FAILED

gate || exit 1
stamp "1c. merged bench (headline + dense, current defaults)"
timeout 5400 python bench.py --no-parity || echo BENCH_FAILED

gate || exit 1
stamp "2. pack ride A/B (RADEGS_FEAT_RIDE=1), 100k then dense"
timeout 5400 env RADEGS_FEAT_RIDE=1 python bench.py --no-parity || echo RIDE_FAILED

gate || exit 1
stamp "3. scan reduction A/B at dense"
timeout 3600 env RADEGS_REDUCE_IMPL=scan python bench.py --scene dense --auto --no-parity || echo SCAN_DENSE_FAILED

gate || exit 1
stamp "4. bwd orient nm A/B (100k)"
timeout 2400 env RADEGS_BWD_ORIENT=nm python bench.py --scene 100k --no-parity || echo ORIENT_FAILED

gate || exit 1
stamp "5. micro: composed dense pipeline + primitives (DCE-fixed)"
timeout 3000 python scripts/_micro_binning.py dense || echo MICRO_DENSE_FAILED
timeout 1500 python scripts/_micro_binning.py prims || echo MICRO_PRIMS_FAILED

gate || exit 1
stamp "6. segsum mxu de-quarantine probe"
timeout 1500 python - <<'EOF' || echo SEGSUM_MXU_FAILED
import time
import jax, jax.numpy as jnp, numpy as np
from radegs_tpu.ops.pallas_blend import N_GRAD, N_GRAD_PAD
from radegs_tpu.ops.segsum import reduce_grad_rows_mxu
B, P = 1 << 20, 1 << 17
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(N_GRAD_PAD, B)).astype(np.float32))
gid = jnp.asarray(np.sort(rng.integers(0, P, B)).astype(np.float32))
g = g.at[N_GRAD].set(gid)
t0 = time.time()
out = jax.block_until_ready(reduce_grad_rows_mxu(g, jnp.int32(B - 1000), P))
print("SEGSUM_MXU_OK", out.shape, f"{time.time()-t0:.1f}s incl compile", flush=True)
for _ in range(3):
    t0 = time.time()
    g = g.at[0, 0].add(1.0)
    out = jax.block_until_ready(reduce_grad_rows_mxu(g, jnp.int32(B - 1000), P))
    print("steady:", f"{(time.time()-t0)*1000:.0f} ms", flush=True)
EOF

stamp done
