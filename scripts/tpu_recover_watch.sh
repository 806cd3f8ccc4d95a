#!/bin/bash
# Probe until the TPU tunnel answers, then log recovery. Detached use only.
cd /root/repo
LOG=out/tpu_recover.log
echo "=== watcher start $(date) ===" >> "$LOG"
while true; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.ones((64,64))@jnp.ones((64,64))).block_until_ready(); print('alive')" >> "$LOG" 2>&1; then
    break
  fi
  echo "still down $(date)" >> "$LOG"
  sleep 120
done
echo "=== TPU BACK $(date) ===" >> "$LOG"
