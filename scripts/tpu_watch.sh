#!/bin/bash
# Wait for the TPU tunnel to recover, then run the queued measurements.
# Run under tmux: tmux new-session -d -s tpuwatch 'bash scripts/tpu_watch.sh'
cd /root/repo
LOG=out/tpu_queue.log
mkdir -p out
echo "=== watcher start $(date) ===" >> "$LOG"
while true; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; (jnp.ones((64,64))@jnp.ones((64,64))).block_until_ready(); print('alive')" >> "$LOG" 2>&1; then
    break
  fi
  echo "still down $(date)" >> "$LOG"
  sleep 300
done
echo "=== TPU BACK $(date) ===" >> "$LOG"
echo "--- probe_pallas ---" >> "$LOG"
timeout 1200 python scripts/probe_pallas.py >> "$LOG" 2>&1
echo "--- bench fwd ---" >> "$LOG"
timeout 1800 python bench.py --frames 8 --warmup 2 >> "$LOG" 2>&1
echo "--- bench_traversal ---" >> "$LOG"
timeout 1800 python scripts/bench_traversal.py >> "$LOG" 2>&1
echo "=== queue done $(date) ===" >> "$LOG"
