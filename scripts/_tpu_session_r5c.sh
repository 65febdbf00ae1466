#!/bin/bash
# Round-5 session C: multi-tile kernel A/B (VERDICT r4 #2) -> merged bench
# at final defaults -> the COMPLETE 30k quality run (VERDICT r4 #4).
#
# Usage: bash scripts/_tpu_session_r5c.sh <round_deadline_epoch>
# The 30k run uses quality_dense --wall_budget so it CUTS ITSELF gracefully
# (final eval + meshes still run) and the chip is free for the driver's
# end-of-round bench.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 19800 ))}

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
# last JSON line with a "value" field from a log -> value (0 on failure)
val() { python -c "
import json,sys
v=0.0
try:
  for line in open('$1'):
    line=line.strip()
    if line.startswith('{'):
      try: v=json.loads(line).get('value',v)
      except Exception: pass
except FileNotFoundError: pass
print(v)"; }

stamp probe
gate || exit 1

stamp "1a. 100k baseline (current defaults, single-tile)"
timeout 1800 python bench.py --scene 100k --no-parity | tee _mt0.json || echo BASE_FAILED

gate || exit 1
stamp "1b. multi-tile gbatch=4 (100k)"
timeout 2400 env RADEGS_TILE_BATCH=4 python bench.py --scene 100k --no-parity | tee _mt4.json || echo MT4_FAILED

gate || exit 1
stamp "1c. multi-tile gbatch=2 (100k)"
timeout 1800 env RADEGS_TILE_BATCH=2 python bench.py --scene 100k --no-parity | tee _mt2.json || echo MT2_FAILED

V0=$(val _mt0.json); V4=$(val _mt4.json); V2=$(val _mt2.json)
BEST_TB=1
BEST_V=$V0
if python -c "import sys; sys.exit(0 if $V2 > $BEST_V else 1)"; then BEST_TB=2; BEST_V=$V2; fi
if python -c "import sys; sys.exit(0 if $V4 > $BEST_V else 1)"; then BEST_TB=4; BEST_V=$V4; fi
echo "MT_DECISION base=$V0 tb2=$V2 tb4=$V4 -> RADEGS_TILE_BATCH=$BEST_TB"

gate || exit 1
stamp "1d. multi-tile on-device parity (gbatch=4 vs single-tile)"
timeout 1500 python - <<'EOF' || echo MT_PARITY_FAILED
import numpy as np, jax, jax.numpy as jnp
from radegs_tpu.core.camera import Camera
from radegs_tpu.core.projection import preprocess_gaussians
from radegs_tpu.ops.binning import bin_gaussians
from radegs_tpu.ops.pallas_blend import blend_forward_pallas, blend_backward_pallas
from radegs_tpu.ops.pallas_blend_mt import blend_forward_pallas_mt, blend_backward_pallas_mt
W, H = 256, 128
rng = np.random.default_rng(0)
P = 4096
cam = Camera.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0], 0.9, 0.9, W, H)
prep = preprocess_gaussians(
    jnp.asarray(rng.normal(size=(P, 3)) * 0.6, jnp.float32),
    jnp.asarray(np.exp(rng.normal(size=(P, 3)) * 0.4 - 2.2), jnp.float32),
    jnp.tile(jnp.array([1.0, 0, 0, 0]), (P, 1)),
    jnp.full((P, 1), 0.7),
    jnp.asarray(rng.uniform(0.1, 0.9, size=(P, 1, 3)), jnp.float32),
    sh_degree=0, camera=cam, kernel_size=0.1)
b = bin_gaussians(prep.xy, prep.radius, prep.depth, prep.valid, W, H,
                  instance_budget=1 << 16, max_per_tile=512)
inputs = (prep.xy, prep.conic, prep.opacity, prep.rgb, prep.view_point,
          prep.camera_plane, prep.ray_plane, prep.normal, prep.ts)
ref = blend_forward_pallas(b, *inputs, width=W, height=H)
mt = blend_forward_pallas_mt(b, *inputs, width=W, height=H, gbatch=4)
worst = 0.0
for k in ref:
    a_, b_ = np.asarray(ref[k]), np.asarray(mt[k])
    err = (a_ != b_).mean() if k == "med_pos" else np.abs(a_ - b_).max()
    worst = max(worst, float(err))
cot = {k: jnp.ones_like(v) for k, v in ref.items() if k != "med_pos"}
gr = blend_backward_pallas(b, inputs, ref, cot, width=W, height=H)
gm = blend_backward_pallas_mt(b, inputs, ref, cot, width=W, height=H, gbatch=4)
for k in gr:
    a_, b_ = np.asarray(gr[k]), np.asarray(gm[k])
    worst = max(worst, float(np.abs(a_ - b_).max()))
print("MT_DEVICE_PARITY worst:", worst, flush=True)
assert worst == 0.0, worst
EOF

gate || exit 1
stamp "2. merged bench at winner defaults -> BENCH_r05 candidate"
timeout 5400 env RADEGS_TILE_BATCH=$BEST_TB python bench.py | tee _bench_r05_candidate.json || echo BENCH_FINAL_FAILED

gate || exit 1
stamp "3. FULL 30k quality run (32 train / 8 test views, wall-budgeted)"
NOW=$(date +%s)
WB=$(( DEADLINE - NOW - 3300 ))   # GT/compile setup (~15 min) runs before
# the budget clock starts; final eval + both meshes (~20 min) run after it
if [ "$WB" -lt 1200 ]; then
  echo "QUALITY_SKIPPED: only ${WB}s budget left"
else
  timeout $(( DEADLINE - NOW - 300 )) env RADEGS_TILE_BATCH=$BEST_TB python scripts/quality_dense.py \
    --iters 30000 --eval_iters 1000 7000 15000 30000 \
    --n_views 40 --eval_every 5 \
    --wall_budget "$WB" \
    --checkpoint /root/repo/ckpt_q30k_r5 \
    --report QUALITY_r05.json || echo QUALITY_CUT_OR_FAILED
fi

stamp done
