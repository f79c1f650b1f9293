#!/usr/bin/env bash
# Profiling harness run (reference slurm/benchmark)
source "$(dirname "$0")/../common.sh"
run python -m rmm_tpu.cli.benchmark \
  --data "${DATA:?set DATA=<csv>}" --model "${MODEL:-tabgnn}" \
  --iters "${ITERS:-100}" --profile --trace_dir "${TRACE_DIR:-/tmp/rmm_trace}" "$@"
