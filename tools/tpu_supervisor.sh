#!/bin/bash
# Wait for the axon TPU tunnel to respond, then run the given pipeline legs.
# Usage: tools/tpu_supervisor.sh "front" ["stage2 3600"] ...
# Probes with a tiny matmul; retries every 30s until the device answers.
cd "$(dirname "$0")/.."
while true; do
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('probe', float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), flush=True)
" >/dev/null 2>&1
  if [ $? -eq 0 ]; then break; fi
  echo "$(date) tunnel still down; retrying"
  sleep 30
done
echo "$(date) tunnel up"
for leg in "$@"; do
  echo "=== SUPERVISOR: leg [$leg] ==="
  bash tools/run_nested_pipeline.sh $leg
done
echo "SUPERVISOR DONE"
