#!/bin/bash
# Round-5 session B: execute the armed A/Bs (VERDICT r4 #1), nothing else.
# Flip-to-default decisions come from THESE numbers.
#
#  1. RADEGS_FEAT_RIDE=1 (pack rides the tile sort) — dense, then 100k.
#  2. RADEGS_REDUCE_IMPL=scan — dense, then 100k.
#  3. RADEGS_BWD_ORIENT=nm — 100k.
#  4. combined best-guess (ride + scan) — dense.
#  5. segsum mxu de-quarantine probe (grouped sorts, VERDICT r4 #3).
#
# Every stage: tunnel-health gate, hard timeout (compile-wall guard —
# VERDICT r4 #6; bench.py now logs compile_wall_s in the JSON), epoch
# stamps so stage wall is computable from the log.
set -u
cd "$(dirname "$0")/.."

stamp() { echo "=== $1 @ $(date +%s) $(date +%T) ==="; }
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

stamp "1a. FEAT_RIDE dense"
timeout 3600 env RADEGS_FEAT_RIDE=1 python bench.py --scene dense --auto --no-parity || echo RIDE_DENSE_FAILED

gate || exit 1
stamp "1b. FEAT_RIDE 100k"
timeout 1800 env RADEGS_FEAT_RIDE=1 python bench.py --scene 100k --no-parity || echo RIDE_100K_FAILED

gate || exit 1
stamp "2a. scan reduce dense"
timeout 3600 env RADEGS_REDUCE_IMPL=scan python bench.py --scene dense --auto --no-parity || echo SCAN_DENSE_FAILED

gate || exit 1
stamp "2b. scan reduce 100k"
timeout 1800 env RADEGS_REDUCE_IMPL=scan python bench.py --scene 100k --no-parity || echo SCAN_100K_FAILED

gate || exit 1
stamp "3. bwd orient nm 100k"
timeout 1800 env RADEGS_BWD_ORIENT=nm python bench.py --scene 100k --no-parity || echo ORIENT_FAILED

gate || exit 1
stamp "4. combined ride+scan dense"
timeout 3600 env RADEGS_FEAT_RIDE=1 RADEGS_REDUCE_IMPL=scan python bench.py --scene dense --auto --no-parity || echo COMBO_DENSE_FAILED

gate || exit 1
stamp "5. segsum mxu de-quarantine probe"
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
