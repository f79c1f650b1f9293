#!/usr/bin/env bash
# Shared launcher environment (the reference's slurm/*/*.sh conda+nvidia-smi
# preamble, rebuilt for TPU hosts: one process per host, jax discovers the
# local TPU; accounting via the metrics JSONL each run writes).
set -euo pipefail
export REPO="${REPO:-$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)}"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
# Multi-host pods: set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
# JAX_PROCESS_ID before sourcing this file; jax.distributed picks them up.
run() { echo "+ $*"; "$@"; }
