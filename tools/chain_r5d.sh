#!/bin/bash
# Round-5 chip-job chain, rev D (fresh VM: /tmp markers + caches wiped).
# Remaining queue after rev C: the 11M e2e north star (VERDICT item 1,
# target <= 25 min) and the 1.65M manifold conservation row.  New this
# rev: the stale-gather lever (dense_gather_reuse, interleaved full-k
# blocks + late activation) — ablation FIRST to pick S on measured
# s/sweep, then the e2e runs carry the lever so its conservation is
# validated at scale in the same pass.
set -u
cd /root/repo
LOCK=/tmp/tpu_lock
LOG=/tmp/chain_r5.log
touch "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export ANNEMBED_CHANNEL_DEADLINE_S=${ANNEMBED_CHANNEL_DEADLINE_S:-300}

note() { echo "[chainD] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

wait_channel() {
  while true; do
    local t0=$(date +%s)
    timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); y = (x @ x).block_until_ready()
print(float(y[0, 0]))" >/dev/null 2>&1
    local rc=$?
    note "channel probe rc=$rc ($(($(date +%s)-t0))s)"
    [ $rc -eq 0 ] && return 0
    sleep 120
  done
}

transient() {
  grep -qE "UNAVAILABLE|worker process crashed|response body closed|read body|remote_compile|DEADLINE_EXCEEDED|RESOURCE_EXHAUSTED|Connection reset|Socket closed|length limit exceeded|channel preflight DEADLINE" "$1"
}

run_step() {  # name attempts timeout_s artifact cmd...
  local name=$1 tries=$2 tmo=$3 art=$4; shift 4
  local done_mark=/tmp/step_${name}.done
  [ -f "$done_mark" ] && { note "step $name already done, skip"; return 0; }
  local log=/tmp/step_${name}.log alog=/tmp/step_${name}.attempt
  for i in $(seq 1 "$tries"); do
    note "step $name attempt $i/$tries: $*"
    : > "$alog"
    timeout "$tmo" "$@" >> "$alog" 2>&1
    local rc=$?
    cat "$alog" >> "$log"
    note "step $name rc=$rc"
    if [ $rc -eq 0 ]; then
      if [ -n "$art" ]; then
        grep -h '^{' "$alog" > "artifacts/$art" 2>/dev/null || true
      fi
      touch "$done_mark"
      return 0
    fi
    if [ $rc -eq 17 ] || [ $rc -eq 124 ] || transient "$alog"; then
      note "step $name transient failure (rc=$rc), will retry"
      sleep 45
      continue
    fi
    note "step $name NON-TRANSIENT failure rc=$rc (see $log)"
    touch "$done_mark"
    return $rc
  done
  note "step $name exhausted $tries attempts this pass"
  return 1
}

# stale-gather recipe for the e2e runs; override after reading the
# ablation (S=8 after=0.5 is the 20k-quality-validated arm)
REUSE=${ANNEMBED_REUSE:-8}
AFTER=${ANNEMBED_AFTER:-0.5}

pass_once() {
  # 1. Stale-gather ablation at the 11M shape (s/sweep for S=4/8/12).
  run_step ablatereuse 3 2400 sweep_ablation_r5c.json \
    python tools/with_preflight.py tools/sweep_ablation.py

  # 2. 11M e2e north star (VERDICT item 1): sorted IVF layout
  #    (default), stale-gather lever, certified grid quality.
  run_step higgs11m 3 9000 higgs11m_r5.json \
    python examples/higgs.py --synthetic 11000000 --quality \
      --no-exclusion --gather-reuse "$REUSE" \
      --gather-reuse-after "$AFTER" --json --out none \
      --data-cache /tmp/h11m.npy \
      --graph-cache /tmp/g11m.npz --embed-cache /tmp/e11m.npy

  # 3. Conservable control at reference scale, SAME recipe as the 11M
  #    run so the lever's conservation is pinned at 1.65M too.
  run_step manifold165 3 7200 higgs165_manifold_r5.json \
    python examples/higgs.py --synthetic 1650000 --manifold \
      --no-exclusion --gather-reuse "$REUSE" \
      --gather-reuse-after "$AFTER" \
      --quality --json --out none --data-cache /tmp/h165m.npy \
      --graph-cache /tmp/g165m.npz --embed-cache /tmp/e165m.npy
}

all_done() {
  for s in ablatereuse higgs11m manifold165; do
    [ -f /tmp/step_${s}.done ] || return 1
  done
  return 0
}

note "chainD start"
while ! all_done; do
  wait_channel
  pass_once
  all_done || { note "pass incomplete, waiting for channel"; sleep 120; }
done
note "chainD done — all steps complete"
