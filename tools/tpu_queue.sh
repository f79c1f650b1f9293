#!/bin/bash
# Chip-job queue for the perf round: waits for the watcher to land the
# full battery (BENCH_WATCH.json), then runs the remaining on-chip jobs
# in priority order, re-probing between jobs (the tunnel flaps).  Each
# job writes its pid to /tmp/rmm_chip.pid so tools/tpu_watch.sh never
# fires a concurrent bench (the round-4 lesson: two batteries ran at
# once and contaminated each other).
#
# Usage: tools/tpu_queue.sh [probe_interval_s]
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-240}
LOG=/tmp/tpu_queue.log

probe() {
  timeout 180 python -c \
    "import jax, jax.numpy as jnp; \
     print(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(8)))[0])" \
    >/dev/null 2>&1
}

run_job() {  # run_job <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "$(date +%H:%M:%S) job $name: starting" >>"$LOG"
  ( "$@" ) >>"$LOG" 2>&1 &
  local pid=$!
  echo $pid > /tmp/rmm_chip.pid
  local waited=0
  while kill -0 $pid 2>/dev/null; do
    sleep 20; waited=$((waited + 20))
    if [ $waited -ge "$tmo" ]; then
      kill $pid 2>/dev/null; sleep 3; kill -9 $pid 2>/dev/null
      echo "$(date +%H:%M:%S) job $name: TIMEOUT after ${tmo}s" >>"$LOG"
      rm -f /tmp/rmm_chip.pid
      return 1
    fi
  done
  wait $pid; local rc=$?
  rm -f /tmp/rmm_chip.pid
  echo "$(date +%H:%M:%S) job $name: rc=$rc" >>"$LOG"
  return $rc
}

wait_probe() {
  # battery first: the watcher owns the chip until the full bench lands
  while [ ! -s BENCH_WATCH.json ]; do
    echo "$(date +%H:%M:%S) waiting for watcher's full battery" >>"$LOG"
    sleep "$INTERVAL"
  done
  # never start while another job holds the chip client
  while [ -f /tmp/rmm_chip.pid ] && kill -0 "$(cat /tmp/rmm_chip.pid)" 2>/dev/null; do
    sleep 60
  done
  while ! probe; do
    echo "$(date +%H:%M:%S) tunnel down — waiting" >>"$LOG"
    sleep "$INTERVAL"
  done
}

# jobs marked done by sentinel files so the queue is resumable; failed
# jobs RETRY on the next pass (the tunnel flaps — a refusal because the
# probe raced a flap must not permanently skip the job)
J=/tmp/tpu_queue_done
mkdir -p "$J"

for pass in $(seq 1 40); do
  if [ ! -f "$J/sslbisect" ]; then
    wait_probe
    run_job sslbisect 12000 python tools/ssl_compile_bisect.py \
      && touch "$J/sslbisect"
  fi
  if [ ! -f "$J/profile" ]; then
    wait_probe
    run_job profile 4500 python tools/device_e2e_profile.py --trace \
      && touch "$J/profile"
  fi
  if [ ! -f "$J/ab" ]; then
    wait_probe
    run_job ab 9000 python tools/tpu_ab_run.py && touch "$J/ab"
  fi
  if [ ! -f "$J/sslq" ]; then
    # C=64: the C=128 compile kills the terminal-side helper (see
    # ssl_compile_bisect); 64 is the largest known-compiling SSL width
    # until the bisect says otherwise
    wait_probe
    run_job sslq 7200 env RMM_QUALITY_CPU=0 python tools/ssl_quality_run.py \
      --rows 16384 --accounts 1024 --epochs 20 --lr 1e-3 --moo moco \
      --num_neg_samples 64 --channels 64 --num_layers 3 \
      --out outputs/quality/ssl_tpu && touch "$J/sslq"
  fi
  if [ ! -f "$J/supq" ]; then
    wait_probe
    run_job supq 10800 env RMM_QUALITY_CPU=0 python tools/quality_run.py \
      --rows 131072 --accounts 8192 --epochs 30 --models tabgnn \
      --out outputs/quality/tpu_record && touch "$J/supq"
  fi
  if [ -f "$J/sslbisect" ] && [ -f "$J/profile" ] && [ -f "$J/ab" ] \
      && [ -f "$J/sslq" ] && [ -f "$J/supq" ]; then
    echo "$(date +%H:%M:%S) queue complete" >>"$LOG"
    exit 0
  fi
  sleep "$INTERVAL"
done
echo "$(date +%H:%M:%S) queue gave up after 40 passes" >>"$LOG"
