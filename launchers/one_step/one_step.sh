#!/usr/bin/env bash
# One-step joint finetune: in-LM LoRA trains INSIDE the tabular forward
# pass (reference slurm/one_step/one_step_{e5,roberta}.sh →
# downstream_model_LLM.py --finetune, lora_r=16; small batch — the LM
# backward dominates memory).
source "$(dirname "$0")/../common.sh"
run python -m rmm_tpu.cli.downstream_llm \
  --dataset "${DATA:?set DATA=<amazon fashion csv>}" \
  --text_path finetune \
  --text_model "${TEXT_MODEL:-intfloat/e5-mistral-7b-instruct}" \
  --lora_rank "${LORA_R:-16}" \
  --batch_size "${BATCH:-4}" --epochs "${EPOCHS:-50}" "$@"
