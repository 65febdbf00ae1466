#!/bin/bash
# Round-4 fixed measurement chain (v2). Context: the first r4 session measured
#   100k breakdown:  preprocess 3.7 | binning ~38 | fwd 26 | bwd kernel 40 |
#                    bwd reduce(scatter) ~18  => ~123 ms/step
#   dense breakdown: binning 847 | pack 323 | fwd 33 | (bwd hung in red(mxu))
#   micro_sort: 1-key 26-payload sort = 0.54 ms @ 8M rows (sorts are FREE)
#   mm precision HIGH: unsupported by Mosaic dot lowering (DEFAULT/HIGHEST only)
# and found that reduce_grad_rows_mxu (r3 segsum) HANGS the remote compile on
# real hardware. auto now defaults to scatter in code; this chain re-measures
# the merged bench clean, runs the bounded quality protocol (VERDICT r3 #1),
# A/Bs the bwd orientation, pins the segsum hang, and opens up binning.
set -u
cd "$(dirname "$0")/.."
QTIME=${1:-9000}

stamp() { echo "=== $1 $(date +%T) ==="; }

stamp probe
timeout 200 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128,128)) @ jnp.ones((128,128)); print('PROBE_OK', float(x[0,0]), jax.devices()[0].platform)" || { echo PROBE_FAILED; exit 1; }

stamp "merged bench (100k headline + dense --auto), scatter default"
timeout 5400 python bench.py || echo BENCH_MERGED_FAILED

stamp "bounded quality run (1500 iters, checkpointed) — VERDICT r3 #1"
timeout "$QTIME" python scripts/quality_dense.py \
  --iters 1500 --eval_iters 500 1500 --checkpoint /root/repo/ckpt_q1500 \
  --report QUALITY_r04.json || echo QUALITY_BOUNDED_FAILED

stamp "bwd orient A/B: nm (100k)"
timeout 2700 env RADEGS_BWD_ORIENT=nm python bench.py --scene 100k --no-parity || echo ORIENT_NM_FAILED

stamp "segsum hang pin: full reduce_grad_rows_mxu, 1M rows (sort alone is known-fast)"
timeout 900 python - <<'EOF' || echo SEGSUM_KERNEL_FAILED
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
print("SEGSUM_OK", out.shape, f"{time.time()-t0:.1f}s incl compile", flush=True)
t0 = time.time()
out = jax.block_until_ready(reduce_grad_rows_mxu(g, jnp.int32(B - 1000), P))
print("steady:", f"{(time.time()-t0)*1000:.0f} ms", flush=True)
EOF

stamp "binning internal stage micro (never measured on device)"
timeout 1800 python scripts/_micro_binning.py || echo MICRO_BINNING_FAILED

stamp done
