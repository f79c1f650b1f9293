#!/usr/bin/env bash
# Two-step workflow, stage 2 with CONTINUED finetuning: start from the
# stage-1 LoRA-finetuned LM and keep training it inside the tabular model
# (reference slurm/two_step/stage2_roberta_finetune.sh →
# downstream_model_LLM.py --finetune with the stage-1 checkpoint).
source "$(dirname "$0")/../common.sh"
run python -m rmm_tpu.cli.downstream_llm \
  --dataset "${DATA:?set DATA=<amazon fashion csv>}" \
  --text_path finetune \
  --text_model "${TEXT_MODEL:?set TEXT_MODEL=<stage-1 export dir>}" \
  --lora_rank "${LORA_R:-16}" \
  --batch_size "${BATCH:-4}" --epochs "${EPOCHS:-50}" "$@"
