#!/bin/bash
# Wait for the TPU tunnel to recover, then run the measurement queue.
# Run detached: nohup bash scripts/tpu_watch.sh &
# NEVER kill the python child mid-RPC — that wedges the tunnel.
cd /root/repo
LOG=out/tpu_queue.log
mkdir -p out
echo "=== watcher start $(date) ===" >> "$LOG"
while true; do
  # small probe; if the tunnel is healthy this finishes in seconds
  if timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.ones((64,64))@jnp.ones((64,64))).block_until_ready(); print('alive')" >> "$LOG" 2>&1; then
    break
  fi
  echo "still down $(date)" >> "$LOG"
  sleep 600
done
echo "=== TPU BACK $(date) ===" >> "$LOG"
# no timeout here on purpose
python scripts/tpu_queue.py >> "$LOG" 2>&1
echo "=== queue done $(date) ===" >> "$LOG"
