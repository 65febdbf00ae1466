#!/bin/bash
# Round-4 session D: measure the binning redesign (sort/scan-only
# scheduling + pack-rides-sort, commit 3c1fb5f) and the scan gradient
# reduction, recover the tetra chamfer the r4c quality run lost to a
# mid-run ImportError, then launch the long full-schedule run
# (VERDICT r3 #3). Strictly sequential; every stage has its own timeout.
set -u
cd "$(dirname "$0")/.."
LONGQ=${1:-28800}

stamp() { echo "=== $1 $(date +%T) ==="; }

# Probe gate between stages: both round-4 wedges began when a new process
# attached right after a crashed/timed-out TPU process, and launching into
# a wedge re-wedges it (CLAUDE.md). Gate = short probe; on hang, 330 s of
# COMPLETE quiet before retrying; give up after 5 tries (~30 min) so a
# dead tunnel doesn't burn the whole session.
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

stamp "merged bench: NEW binning headline + dense"
timeout 5400 python bench.py || echo BENCH_MERGED_FAILED

gate || exit 1
stamp "pack A/B: legacy post-sort gather (RADEGS_FEAT_RIDE=0), 100k+dense"
timeout 5400 env RADEGS_FEAT_RIDE=0 python bench.py --no-parity || echo PACK_LEGACY_FAILED

gate || exit 1
stamp "breakdown 100k (new pipeline attribution)"
timeout 2400 python scripts/bench_breakdown.py --scene 100k || echo BREAKDOWN_100K_FAILED

gate || exit 1
stamp "breakdown dense"
timeout 3600 python scripts/bench_breakdown.py --scene dense || echo BREAKDOWN_DENSE_FAILED

gate || exit 1
stamp "reduce A/B at dense: scatter"
timeout 2700 env RADEGS_REDUCE_IMPL=scatter python bench.py --scene dense --no-parity || echo REDUCE_SCATTER_FAILED

gate || exit 1
stamp "owner A/B at 100k: legacy scatter owner"
timeout 2400 env RADEGS_BIN_OWNER=scatter python bench.py --scene 100k --no-parity || echo OWNER_SCATTER_FAILED

gate || exit 1
stamp "binning primitives micro (dense-scale synthetic)"
timeout 1800 python scripts/_micro_binning.py prims || echo MICRO_PRIMS_FAILED

gate || exit 1
stamp "quality tetra recovery (resume ckpt_q1500, eval+mesh only)"
timeout 7200 python scripts/quality_dense.py \
  --iters 1500 --eval_iters 1500 --checkpoint /root/repo/ckpt_q1500 \
  --report QUALITY_r04b.json || echo QUALITY_RECOVER_FAILED

gate || exit 1
stamp "decimation quality sweep (analytic scene, TPU scale)"
timeout 7200 python scripts/decimation_sweep.py \
  --n_points 600000 --width 1600 --height 1200 \
  --report DECIMATION_R4.json || echo DECIM_SWEEP_FAILED

gate || exit 1
stamp "LONG full-schedule run (VERDICT r3 #3): 30k iters, checkpointed"
timeout "$LONGQ" env RADEGS_REDUCE_IMPL=scatter python scripts/quality_dense.py \
  --iters 30000 --eval_iters 7000 15000 30000 \
  --checkpoint /root/repo/ckpt_q30k --report QUALITY_r04_30k.json \
  || echo QUALITY_30K_FAILED

stamp done
