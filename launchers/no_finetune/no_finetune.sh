#!/usr/bin/env bash
# Frozen-LM text+tabular downstream training (reference
# slurm/no_finetune/no_finetune_{e5,roberta}.sh → downstream_model_LLM.py
# WITHOUT --finetune: the LM only embeds, batch 256). TEXT_MODEL must be in
# the local HF cache; "hashing" runs the zero-dependency fallback embedder.
source "$(dirname "$0")/../common.sh"
run python -m rmm_tpu.cli.downstream_llm \
  --dataset "${DATA:?set DATA=<amazon fashion csv>}" \
  --text_path frozen \
  --text_model "${TEXT_MODEL:-intfloat/e5-mistral-7b-instruct}" \
  --batch_size "${BATCH:-256}" --epochs "${EPOCHS:-50}" "$@"
