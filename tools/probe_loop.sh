#!/bin/bash
# TPU tunnel data-channel probe loop (round 5).
# Every cycle: unless /tmp/tpu_lock exists (a real chip job is running),
# spawn a fresh python that does device-list + tiny matmul + scalar
# readback under a hard timeout.  Logs OK/FAIL lines to
# /tmp/tpu_probe_r5.log.  Respects ONE-TPU-PROCESS-AT-A-TIME.
LOG=/tmp/tpu_probe_r5.log
while true; do
  if [ -f /tmp/tpu_lock ]; then
    echo "$(date -u +%H:%M:%S) skip (lock)" >> "$LOG"
  else
    t0=$(date +%s)
    out=$(timeout 180 python -c "
import time, jax, jax.numpy as jnp
x = jnp.ones((128, 128)); y = (x @ x).block_until_ready()
t = time.time(); v = float(y[0, 0]); print('rb=%.1fs' % (time.time() - t))
" 2>/dev/null)
    rc=$?
    t1=$(date +%s)
    line=$(echo "$out" | tail -1)
    if [ $rc -eq 0 ] && [ -n "$line" ]; then
      echo "$(date -u +%H:%M:%S) OK $line total=$((t1-t0))s" >> "$LOG"
    else
      echo "$(date -u +%H:%M:%S) FAIL rc=$rc after $((t1-t0))s" >> "$LOG"
    fi
  fi
  sleep 240
done
