#!/usr/bin/env bash
# Separate two-stage workflow, stage 1: pure-LM LoRA finetune on the text
# column alone (reference slurm/separate/stage1_{e5,roberta}.sh →
# finetune_LLM.py: SEQ_CLS-style finetune, exports the adapted LM).
source "$(dirname "$0")/../common.sh"
run python -m rmm_tpu.cli.finetune_llm \
  --dataset "${DATA:?set DATA=<amazon fashion csv>}" \
  --text_model "${TEXT_MODEL:-sentence-transformers/all-roberta-large-v1}" \
  --lora_rank "${LORA_R:-16}" \
  --batch_size "${BATCH:-128}" --epochs "${EPOCHS:-5}" \
  --save_model "${EXPORT:-outputs/lm_export}" "$@"
