#!/usr/bin/env bash
# Masking-objective comparison (reference slurm/mask_analysis/
# mask_analysis.sh drove mask_strategy_comparison.py variants that are
# absent from the reference repo; the realizable comparison its fused
# workflow supports is MCM vs MCM+MV). Runs the tabular SSL trainer twice
# on the same data/seed: plain MCM, then MCM + VIME mask-vector head.
source "$(dirname "$0")/../common.sh"
run python -m rmm_tpu.cli.fttransformer \
  --dataset "${DATA:?set DATA=<aml csv>}" --epochs "${EPOCHS:-20}" "$@"
run python -m rmm_tpu.cli.fttransformer \
  --dataset "$DATA" --epochs "${EPOCHS:-20}" --mask_vector "$@"
