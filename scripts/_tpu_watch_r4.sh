#!/bin/bash
# Round-4 tunnel watcher. Follows CLAUDE.md recovery protocol: full quiet
# for 5 min, then a short probe under timeout; only launch real work after
# a probe returns fast. Fires the armed round-3 measurement session
# (headline + dense bench, breakdowns, micros, bounded quality run) as ONE
# strictly-sequential chain the moment the tunnel answers.
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 60); do
  sleep 300
  if timeout 110 python -c "import jax, jax.numpy as jnp; print('PROBE_OK', float((jnp.ones((128,128)) @ jnp.ones((128,128)))[0,0]), jax.devices()[0].platform)" > /tmp/probe_r4_$i.log 2>&1; then
    echo "RECOVERED probe=$i $(date +%T)"
    cat /tmp/probe_r4_$i.log
    bash scripts/_tpu_session_r3.sh > /tmp/tpu_r4_session.log 2>&1
    echo "SESSION_DONE rc=$? $(date +%T)"
    exit 0
  fi
  echo "probe $i failed $(date +%T)"
done
echo "NEVER_RECOVERED $(date +%T)"
exit 1
