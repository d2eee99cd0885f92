#!/bin/bash
# Round-5 final: ONE definitive fresh 11M e2e (graph build + hierarchical
# embed + certified grid quality in one process) with the tuned stale
# recipe S=12, activation after 67% of the schedule (CPU A/B best-quality
# arm; chip ablation: stale sweeps 3.08x).  Data cache kept; graph/embed
# caches removed so the graph-build wall is measured, not loaded.
set -u
cd /root/repo
LOCK=/tmp/tpu_lock
LOG=/tmp/chain_r5.log
touch "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export ANNEMBED_CHANNEL_DEADLINE_S=${ANNEMBED_CHANNEL_DEADLINE_S:-300}
note() { echo "[chainE] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }
transient() {
  grep -qE "UNAVAILABLE|worker process crashed|response body closed|read body|remote_compile|DEADLINE_EXCEEDED|RESOURCE_EXHAUSTED|Connection reset|Socket closed|length limit exceeded|channel preflight DEADLINE" "$1"
}
wait_channel() {
  while true; do
    timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); y = (x @ x).block_until_ready()
print(float(y[0, 0]))" >/dev/null 2>&1 && return 0
    note "channel probe failed, waiting"
    sleep 120
  done
}
name=higgs11mfinal
alog=/tmp/step_${name}.attempt; log=/tmp/step_${name}.log
for i in 1 2 3 4; do
  wait_channel
  note "step $name attempt $i: fresh e2e S=12 after=0.67"
  : > "$alog"
  timeout 9000 python examples/higgs.py --synthetic 11000000 --quality \
    --no-exclusion --gather-reuse 12 --gather-reuse-after 0.67 \
    --json --out none --data-cache /tmp/h11m.npy \
    --graph-cache /tmp/g11m_f.npz --embed-cache /tmp/e11m_f.npy \
    >> "$alog" 2>&1
  rc=$?
  cat "$alog" >> "$log"
  note "step $name rc=$rc"
  if [ $rc -eq 0 ]; then
    grep -h '^{' "$alog" > artifacts/higgs11m_r5_final.json 2>/dev/null || true
    note "FINAL 11M artifact written"
    break
  fi
  if [ $rc -eq 17 ] || [ $rc -eq 124 ] || transient "$alog"; then
    note "transient, retrying"; sleep 45; continue
  fi
  note "NON-TRANSIENT failure, stopping"; break
done
