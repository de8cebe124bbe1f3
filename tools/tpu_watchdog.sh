#!/bin/bash
# Run pipeline legs under a tunnel watchdog.
#
# Usage: tools/tpu_watchdog.sh "front" "stage2 3600" ...
#
# The axon TPU tunnel in this rig drops for ~tens of minutes at a time
# (observed twice on 2026-08-20).  A leg caught mid-run then hangs forever in
# a device wait.  This wrapper (1) waits for the tunnel before starting a
# leg, (2) probes the tunnel every minute while the leg runs, (3) after 3
# consecutive failed probes kills the leg's exact process group and restarts
# it once the tunnel answers — training legs resume from their last
# checkpoint (save_interval), so at most ~2000 steps are repeated.
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,8))@jnp.ones((8,8))).sum().block_until_ready()" >/dev/null 2>&1
}

wait_up() {
  until probe; do echo "$(date) tunnel down; waiting"; sleep 20; done
  echo "$(date) tunnel up"
}

run_leg() {
  local leg="$1" tries=0
  # execute a PRIVATE COPY of the pipeline script: bash reads scripts
  # incrementally, so editing the original while a leg runs would make the
  # running shell re-execute from a shifted byte offset (observed round 5:
  # a mid-run edit made a finished leg re-invoke itself)
  # (inside tools/ so the script's own `cd $(dirname $0)/..` still lands
  # at the repo root; .gitignored)
  local snap="tools/.leg_snapshot_$$_${tries}_$RANDOM.sh"
  cp tools/run_nested_pipeline.sh "$snap"
  while [ $tries -lt 8 ]; do
    tries=$((tries + 1))
    wait_up
    setsid bash "$snap" $leg &
    local pid=$!
    local fails=0 killed=0
    # stall detector: a leg that hung mid-RPC during a *transient* drop never
    # recovers even after the tunnel returns (observed round 4: trainer idle
    # 20+ min at step 19600 with probes green).  Track the leg process
    # group's accumulated CPU seconds; no growth for STALL_MAX consecutive
    # probes while the tunnel answers => hung => restart from checkpoint.
    # Threshold is generous (15 min) because remote-AOT compiles keep the
    # host near-idle legitimately for up to ~10 min.
    local STALL_MAX=15 stall=0 last_cpu=-1
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      if probe; then
        fails=0
        local cpu
        cpu=$(ps -o cputimes= -g $pid 2>/dev/null | awk 'NF {s+=$1; n=1} END {if (n) print s; else print "unknown"}')
        if [ "$cpu" = "unknown" ]; then
          # ps produced no usable rows (procps without cputimes, or a racy
          # empty session query): treat as UNKNOWN and reset the stall
          # counter rather than reading it as "no CPU progress" and killing
          # a healthy leg (advisor r4)
          stall=0
        elif [ "$cpu" = "$last_cpu" ]; then
          stall=$((stall + 1))
          [ $stall -ge 3 ] && echo "$(date) leg idle ($stall/$STALL_MAX, cpu=${cpu}s)"
        else
          stall=0
          last_cpu=$cpu
        fi
        if [ $stall -ge $STALL_MAX ]; then
          echo "$(date) leg hung (no CPU progress ${STALL_MAX}m, tunnel up); killing pgid $pid (try $tries)"
          kill -- -$pid 2>/dev/null
          sleep 5
          kill -9 -- -$pid 2>/dev/null
          killed=1
          break
        fi
      else
        fails=$((fails + 1))
        echo "$(date) probe failed ($fails/3)"
        if [ $fails -ge 3 ]; then
          echo "$(date) tunnel dead; killing leg pgid $pid (try $tries)"
          kill -- -$pid 2>/dev/null
          sleep 5
          kill -9 -- -$pid 2>/dev/null
          killed=1
          break
        fi
      fi
    done
    if [ $killed -eq 1 ]; then continue; fi
    wait $pid
    local rc=$?
    echo "$(date) leg [$leg] exited rc=$rc (try $tries)"
    return $rc
  done
  echo "$(date) leg [$leg] gave up after $tries tries"
  return 1
}

for leg in "$@"; do
  echo "=== WATCHDOG leg [$leg] ==="
  run_leg "$leg"
done
echo "WATCHDOG DONE"
