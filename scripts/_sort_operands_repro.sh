#!/bin/bash
# Pin the many-operand lax.sort remote-compile hang: compile+run a stable
# 1-key sort at B=1M with k payload columns, k rising, each attempt in its
# own process under its own timeout (a hang kills only that attempt).
# Consumes EVERY output (sum) so DCE cannot shrink the sort.
set -u
cd "$(dirname "$0")/.."
for K in 1 2 3 6 12 18 25; do
  echo "=== k=$K payloads $(date +%T) ==="
  timeout 420 python - "$K" <<'EOF' || echo "K_FAILED (hang or crash)"
import sys, time
import jax, jax.numpy as jnp, numpy as np
k = int(sys.argv[1])
B = 1 << 20
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 7500, B).astype(np.int32))
pays = tuple(jnp.asarray(rng.normal(size=B).astype(np.float32)) for _ in range(k))
f = jax.jit(lambda t, ps: sum(jax.lax.sort((t,) + ps, num_keys=1, is_stable=True)[1:]))
t0 = time.time()
out = jax.block_until_ready(f(key, pays))
print(f"k={k} compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(5):
    key = (key + jnp.int32(1)) % 7500
    out = jax.block_until_ready(f(key, pays))
print(f"k={k} steady {(time.time()-t0)/5*1000:.1f} ms", flush=True)
EOF
  sleep 20
done
echo "=== repro done $(date +%T) ==="
