#!/bin/bash
# Round-4 session E (leftovers; run only if time remains after the r4d
# 30k run): backward-orientation A/B and the de-quarantine probe of the
# MXU segment-sum (its 'hang' was likely the monolithic 26-operand sort
# compile, now grouped).
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

stamp "bwd orient A/B: nm (100k)"
timeout 2700 env RADEGS_BWD_ORIENT=nm python bench.py --scene 100k --no-parity || echo ORIENT_NM_FAILED

gate || exit 1
stamp "segsum mxu de-quarantine probe (grouped sorts), 1M rows"
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

gate || exit 1
stamp "scan-reduction isolated timing, 4M rows"
timeout 1500 python - <<'EOF' || echo SCAN_ISO_FAILED
import time
import jax, jax.numpy as jnp, numpy as np
from radegs_tpu.ops.pallas_blend import N_GRAD, N_GRAD_PAD
from radegs_tpu.ops.segsum import reduce_grad_rows_scan
B, P = 1 << 22, 1 << 20
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(N_GRAD_PAD, B)).astype(np.float32))
gid = jnp.asarray(rng.integers(0, P, B).astype(np.float32))
g = g.at[N_GRAD].set(gid)
t0 = time.time()
out = jax.block_until_ready(reduce_grad_rows_scan(g, jnp.int32(B - 1000), P, max_run=8192))
print("SCAN_OK", out.shape, f"{time.time()-t0:.1f}s incl compile", flush=True)
for _ in range(3):
    t0 = time.time()
    g = g.at[0, 0].add(1.0)
    out = jax.block_until_ready(reduce_grad_rows_scan(g, jnp.int32(B - 1000), P, max_run=8192))
    print("steady:", f"{(time.time()-t0)*1000:.0f} ms", flush=True)
EOF

stamp done
