#!/bin/bash
# TPU tunnel watcher: fire bench.py the moment the chip's DATA PLANE
# answers. `jax.devices()` is not a liveness signal here — the control
# plane can answer while compile/execute RPCs block forever, and the
# channel FLAPS (observed round 4: tiny compiles succeed one minute and
# wedge the next), so the probe compiles and RUNS a tiny jitted program
# under a hard timeout, and a wedged bench attempt is retried on the
# next good probe instead of aborting the watch.
#
# Usage: tools/tpu_watch.sh [interval_s] [max_loops]
# Writes: /tmp/tpu_watch.log; on success BENCH_QUICK.json (small-shape
# battery, ~minutes) then BENCH_WATCH.json (full battery) in the repo
# root. Exits once the full battery lands (or max_loops probes fail).
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-240}
MAX=${2:-50}
LOG=/tmp/tpu_watch.log

probe() {
  timeout 180 python -c \
    "import jax, jax.numpy as jnp; \
     print(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(8)))[0])" \
    >/dev/null 2>&1
}

for i in $(seq 1 "$MAX"); do
  # never probe while another bench/probe holds the chip client
  # (any chip-holding job writes its pid to /tmp/rmm_chip.pid)
  if [ -f /tmp/rmm_chip.pid ] && kill -0 "$(cat /tmp/rmm_chip.pid)" 2>/dev/null; then
    echo "$(date +%H:%M:%S) loop $i: bench attempt still running, waiting" >>"$LOG"
    sleep "$INTERVAL"
    continue
  fi
  if probe; then
    if [ ! -s BENCH_QUICK.json ]; then
      # small shapes first: a short up-window should still yield numbers
      echo "$(date +%H:%M:%S) loop $i: data plane UP — quick battery" >>"$LOG"
      BENCH_ROWS=16384 timeout 1500 python bench.py >/tmp/bench_quick.json 2>>"$LOG"
      rc=$?
      # a CPU-fallback record (tunnel flapped between probe and bench
      # start) must NOT be accepted as on-chip evidence — keep looping
      [ $rc -eq 0 ] && grep -q '"value"' /tmp/bench_quick.json \
        && ! grep -q 'cpu-FALLBACK' /tmp/bench_quick.json \
        && cp /tmp/bench_quick.json BENCH_QUICK.json
      echo "$(date +%H:%M:%S) quick battery rc=$rc" >>"$LOG"
      continue   # re-probe before committing to the long run
    fi
    echo "$(date +%H:%M:%S) loop $i: firing FULL bench.py" >>"$LOG"
    timeout 2700 python bench.py >/tmp/bench_watch.json 2>>"$LOG" &
    bpid=$!
    echo $bpid > /tmp/rmm_chip.pid   # hold the chip lock for the queue
    wait $bpid
    rc=$?
    rm -f /tmp/rmm_chip.pid
    if [ $rc -eq 0 ] && grep -q '"value"' /tmp/bench_watch.json \
        && ! grep -q 'cpu-FALLBACK' /tmp/bench_watch.json; then
      cp /tmp/bench_watch.json BENCH_WATCH.json
      echo "$(date +%H:%M:%S) full bench rc=0 -> BENCH_WATCH.json" >>"$LOG"
      exit 0
    fi
    echo "$(date +%H:%M:%S) full bench rc=$rc (wedged/failed/cpu-fallback) — will retry" >>"$LOG"
  else
    echo "$(date +%H:%M:%S) loop $i: compile channel still wedged" >>"$LOG"
  fi
  sleep "$INTERVAL"
done
echo "$(date +%H:%M:%S) giving up after $MAX probes" >>"$LOG"
exit 1
