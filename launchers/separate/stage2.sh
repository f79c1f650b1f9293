#!/usr/bin/env bash
# Separate two-stage workflow, stage 2: downstream tabular training over
# FROZEN embeddings from the stage-1 finetuned LM (reference
# slurm/separate/stage2_roberta.sh → downstream_model_LLM.py without
# --finetune, text_model pointed at the stage-1 export).
source "$(dirname "$0")/../common.sh"
run python -m rmm_tpu.cli.downstream_llm \
  --dataset "${DATA:?set DATA=<amazon fashion csv>}" \
  --text_path frozen \
  --text_model "${TEXT_MODEL:?set TEXT_MODEL=<stage-1 export dir>}" \
  --batch_size "${BATCH:-256}" --epochs "${EPOCHS:-50}" "$@"
