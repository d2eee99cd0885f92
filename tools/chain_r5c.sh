#!/bin/bash
# Round-5 chip-job chain, rev C.  Rev B ran dmap66 (landed, 616 s),
# ablate11m (landed: sweep is 65% gather) and bench (landed: 10.32x
# steady, 15.3 s cold).  Rev C reorders the remainder so the
# packed-gather A/B (the ablation's one actionable lever) lands BEFORE
# the long 11M north-star run, and salvages the oracle165 run that
# keeps executing as an orphan across the chain restart.
set -u
cd /root/repo
LOCK=/tmp/tpu_lock
LOG=/tmp/chain_r5.log
touch "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export ANNEMBED_CHANNEL_DEADLINE_S=${ANNEMBED_CHANNEL_DEADLINE_S:-300}

note() { echo "[chainC] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

if [ -n "${WAIT_PID:-}" ]; then
  note "waiting for running TPU pid $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  note "pid $WAIT_PID gone, starting"
fi

# salvage: the rev-B oracle165 subprocess kept running across the
# restart; if it emitted its result line, record artifact + marker
if [ ! -f /tmp/step_oracle165.done ] \
   && grep -q '^{"n": 1650000' /tmp/step_oracle165.attempt 2>/dev/null; then
  grep -h '^{' /tmp/step_oracle165.attempt > artifacts/higgs165_sampling_r5.json
  touch /tmp/step_oracle165.done
  note "salvaged orphaned oracle165 result"
fi

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

pass_once() {
  # 1. Same-data oracle at 1.65M (VERDICT item 2) — usually salvaged.
  run_step oracle165 3 7200 higgs165_sampling_r5.json \
    python examples/higgs.py --synthetic 1650000 --optimizer sampling \
      --quality --json --out none --data-cache /tmp/h165.npy \
      --graph-cache /tmp/g165.npz --embed-cache /tmp/e165s.npy

  # 2. Quality radius A/B retry (VERDICT item 6).
  run_step qradius 3 3600 quality_radius_ab_r5.json \
    python tools/with_preflight.py tools/quality_radius_ab.py

  # 3. Packed-gather A/B at 11M (the round-5 ablation's lever).
  run_step ablatepack 3 2400 sweep_ablation_r5b.json \
    python tools/with_preflight.py tools/sweep_ablation.py

  # 4. Conservable control at reference scale (VERDICT item 2).
  run_step manifold165 3 7200 higgs165_manifold_r5.json \
    python examples/higgs.py --synthetic 1650000 --manifold \
      --quality --json --out none --data-cache /tmp/h165m.npy \
      --graph-cache /tmp/g165m.npz --embed-cache /tmp/e165m.npy

  # 5. 11M e2e north star (VERDICT item 1).  Flags: --no-exclusion is
  #    wall-noise at 11M (ablation) but harmless; packed gather is
  #    injected via ANNEMBED_11M_EXTRA once the A/B lands (empty = off).
  run_step higgs11m 3 7200 higgs11m_r5.json \
    python examples/higgs.py --synthetic 11000000 --quality \
      --no-exclusion ${ANNEMBED_11M_EXTRA:-} --json --out none \
      --data-cache /tmp/h11m.npy \
      --graph-cache /tmp/g11m.npz --embed-cache /tmp/e11m.npy
}

all_done() {
  for s in oracle165 qradius ablatepack manifold165 higgs11m; do
    [ -f /tmp/step_${s}.done ] || return 1
  done
  return 0
}

note "chainC start"
while ! all_done; do
  wait_channel
  pass_once
  all_done || { note "pass incomplete, waiting for channel"; sleep 120; }
done
note "chainC done — all steps complete"
