#!/usr/bin/env bash
# Joint MCM+LP pretraining of TABGNNFused (reference slurm/fused/*.sh)
source "$(dirname "$0")/../common.sh"
# DP=N adds data parallelism over N chips; scan_layers keeps the C=128
# program small for memory-bounded AOT compile services
run python -m rmm_tpu.cli.fused \
  --dataset "${DATA:?set DATA=<aml csv>}" --mode "${MODE:-mcm-lp}" \
  --batch_size 200 --lr 2e-4 --channels 128 --num_layers 3 \
  --dropout 0.5 --num_neg_samples 64 --epochs "${EPOCHS:-50}" \
  --scan_layers ${DP:+--dp "$DP"} "$@"
