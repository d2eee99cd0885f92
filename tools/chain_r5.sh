#!/bin/bash
# Round-5 chip-job chain: runs the queued TPU measurements in priority
# order whenever the tunnel data channel works.  ONE TPU process at a
# time (holds /tmp/tpu_lock so the probe loop stands down); each step
# is a fresh subprocess with the channel-preflight watchdog (exit 17
# on a wedged channel -> cheap retry).  Steps are IDEMPOTENT: a step
# whose done-marker exists is skipped, so the outer loop can re-pass
# the whole chain after channel outages without redoing finished work.
# Logs to /tmp/chain_r5.log + /tmp/step_<name>.log; JSON artifacts in
# artifacts/.
set -u
cd /root/repo
LOCK=/tmp/tpu_lock
LOG=/tmp/chain_r5.log
touch "$LOCK"
trap 'rm -f "$LOCK"' EXIT
export ANNEMBED_CHANNEL_DEADLINE_S=${ANNEMBED_CHANNEL_DEADLINE_S:-300}

note() { echo "[chain] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

wait_channel() {
  # block until a fresh-process scalar readback completes
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

run_step() {  # name attempts timeout_s artifact cmd...
  local name=$1 tries=$2 tmo=$3 art=$4; shift 4
  local done_mark=/tmp/step_${name}.done
  [ -f "$done_mark" ] && { note "step $name already done, skip"; return 0; }
  local log=/tmp/step_${name}.log
  for i in $(seq 1 "$tries"); do
    note "step $name attempt $i/$tries: $*"
    timeout "$tmo" "$@" >> "$log" 2>&1
    local rc=$?
    note "step $name rc=$rc"
    if [ $rc -eq 0 ]; then
      if [ -n "$art" ]; then
        grep -h '^{' "$log" > "artifacts/$art" 2>/dev/null || true
      fi
      touch "$done_mark"
      return 0
    fi
    # 17 = wedged channel (preflight), 124 = timeout: retry; anything
    # else is a real error — record and move on to the next step
    if [ $rc -ne 17 ] && [ $rc -ne 124 ]; then
      note "step $name NON-CHANNEL failure rc=$rc (see $log)"
      touch "$done_mark"     # do not loop forever on a code bug
      return $rc
    fi
    sleep 45
  done
  note "step $name exhausted $tries attempts this pass"
  return 1
}

pass_once() {
  # 1. Higgs diffusion-maps 60% baseline row (VERDICT item 3) — the
  #    last BASELINE.md row with no measured counterpart; ~7-10 min.
  run_step dmap66 4 2400 higgs_dmap_r5.json \
    python examples/higgs.py --synthetic 6600000 --dmap --json \
      --data-cache /tmp/higgs66.npy --out none --recall-sample 0

  # 2. Quality radius A/B (VERDICT item 6): grid-vs-brute identity +
  #    walls at 2M, grid wall at 11M.
  run_step qradius 3 3600 quality_radius_ab_r5.json \
    python tools/with_preflight.py tools/quality_radius_ab.py

  # 3. Sweep ablation at the 11M shape (VERDICT item 1: decompose the
  #    0.28 s/sweep wall, decide exclusion/parallel-kick flags).
  run_step ablate11m 3 2400 sweep_ablation_r5.json \
    python tools/with_preflight.py tools/sweep_ablation.py

  # 4. Bench confirm (cold + steady with the persistent compilation
  #    cache; bench has its own soft/hard deadline protocol).
  run_step bench 2 2400 "" python bench.py

  # 5. Same-data oracle at 1.65M (VERDICT item 2): reference-exact
  #    per-sample dynamics on the identical pipeline; compare against
  #    the round-4 dense row (compat 36.7% / 2.091 / 1.322).
  run_step oracle165 3 7200 higgs165_sampling_r5.json \
    python examples/higgs.py --synthetic 1650000 --optimizer sampling \
      --quality --json --out none --data-cache /tmp/h165.npy \
      --graph-cache /tmp/g165.npz --embed-cache /tmp/e165s.npy

  # 6. 11M e2e with the sorted-layout build + exclusion-off lever +
  #    fast quality (VERDICT item 1 north star).  Caches make retries
  #    resume mid-pipeline.
  run_step higgs11m 3 7200 higgs11m_r5.json \
    python examples/higgs.py --synthetic 11000000 --quality \
      --no-exclusion --json --out none --data-cache /tmp/h11m.npy \
      --graph-cache /tmp/g11m.npz --embed-cache /tmp/e11m.npy
}

all_done() {
  for s in dmap66 qradius ablate11m bench oracle165 higgs11m; do
    [ -f /tmp/step_${s}.done ] || return 1
  done
  return 0
}

note "chain start"
while ! all_done; do
  wait_channel
  pass_once
  all_done || { note "pass incomplete, waiting for channel"; sleep 120; }
done
note "chain done — all steps complete"
