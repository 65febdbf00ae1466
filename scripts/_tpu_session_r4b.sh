#!/bin/bash
# Round-4 follow-up TPU session — run AFTER scripts/_tpu_session_r3.sh
# completes (strictly sequential TPU use, CLAUDE.md).
#
#   bash scripts/_tpu_session_r4b.sh <quality_timeout_s> > log 2>&1
#
# 1. A/B the backward-kernel reduction orientation (RADEGS_BWD_ORIENT)
# 2. decimation quality sweep at scale (VERDICT r3 #4)
# 3. long full-schedule quality run with per-eval checkpoints
#    (VERDICT r3 #3) — sized by the remaining round time; resumable.
set -u
cd "$(dirname "$0")/.."
QTIME=${1:-14400}

stamp() { echo "=== $1 $(date +%T) ==="; }

stamp probe
timeout 200 python -c "import jax, jax.numpy as jnp; x = jnp.ones((128,128)) @ jnp.ones((128,128)); print('PROBE_OK', float(x[0,0]), jax.devices()[0].platform)" || { echo PROBE_FAILED; exit 1; }

stamp "headline re-measure (mn) — insurance if the r3 session's merged line was lost"
timeout 2700 python bench.py --scene 100k --no-parity || echo HEADLINE_MN_FAILED

stamp "bwd orient A/B: nm"
timeout 2700 env RADEGS_BWD_ORIENT=nm python bench.py --scene 100k --no-parity || echo ORIENT_NM_FAILED

stamp "segsum diagnosis (the hang: breakdown 100k died in '+bwd red(mxu)', dense bench died in auto->mxu)"
timeout 600 python - <<'EOF' || echo SEGSUM_SORT26_FAILED
# (a) the 26-operand variadic sort alone
import time
import jax, jax.numpy as jnp, numpy as np
from radegs_tpu.ops.pallas_blend import N_GRAD
B = 1 << 20
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 1 << 20, B).astype(np.int32))
ops = (key,) + tuple(jnp.asarray(rng.normal(size=B).astype(np.float32))
                     for _ in range(N_GRAD))
t0 = time.time()
out = jax.block_until_ready(jax.jit(
    lambda o: jax.lax.sort(o, num_keys=1, is_stable=False))(ops))
print("SORT26_OK", f"{time.time()-t0:.1f}s incl compile")
t0 = time.time()
out = jax.block_until_ready(jax.jit(
    lambda o: jax.lax.sort(o, num_keys=1, is_stable=False))(ops))
print("steady:", f"{(time.time()-t0)*1000:.0f} ms")
EOF
timeout 900 python - <<'EOF' || echo SEGSUM_KERNEL_FAILED
# (b) the full reduce_grad_rows_mxu (sort + searchsorted + Pallas kernel)
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
print("SEGSUM_OK", out.shape, f"{time.time()-t0:.1f}s incl compile")
t0 = time.time()
out = jax.block_until_ready(reduce_grad_rows_mxu(g, jnp.int32(B - 1000), P))
print("steady:", f"{(time.time()-t0)*1000:.0f} ms")
EOF

stamp "dense --auto retry, scatter reduction (isolates the mxu segsum path)"
timeout 6000 env RADEGS_REDUCE_IMPL=scatter python bench.py --scene dense --auto --no-parity || echo DENSE_SCATTER_FAILED

stamp "dense --auto retry (auto = mxu segsum path)"
timeout 6000 python bench.py --scene dense --auto --no-parity || echo DENSE_RETRY_FAILED
timeout 600 python scripts/_kernel_smoke.py || echo KERNEL_SMOKE_MN_FAILED
timeout 900 env RADEGS_BWD_ORIENT=nm python scripts/_kernel_smoke.py || echo KERNEL_SMOKE_NM_FAILED

stamp "binning internal stage micro (rects/expand/cull/sort/ranges)"
timeout 1800 python scripts/_micro_binning.py || echo MICRO_BINNING_FAILED

stamp "decimation sweep (300k splats, 1600x1200, 6 views)"
timeout 7200 python scripts/decimation_sweep.py --n_points 300000 \
  --width 1600 --height 1200 --n_views 6 --report DECIM_SWEEP_R4.json \
  || echo DECIM_SWEEP_FAILED

stamp "long quality run (checkpointed, timeout ${QTIME}s)"
timeout "$QTIME" python scripts/quality_dense.py --iters 30000 \
  --eval_iters 1000 3000 7000 15000 30000 \
  --checkpoint /root/repo/ckpt_q30k --report QUALITY_30K_r04.json \
  || echo "QUALITY_30K timed out/failed (checkpoint at ckpt_q30k resumes it)"

stamp done
