"""Text+tabular downstream CLI — the ``downstream_model_LLM.py`` entry
point: AmazonFashion reviews → rating regression with either frozen text
embeddings or a finetuned text encoder (LoRA).

Usage:
    python -m rmm_tpu.cli.downstream_llm --dataset <reviews.csv> \
        --text_path frozen|finetune --epochs 5 --testing
"""
from __future__ import annotations

import argparse
import logging
import os

from ..datasets.amazon_fashion import AmazonFashionDataset
from ..frame.stype import Stype
from ..utils.config import Config
from ..utils.logging import RunLogger, logger_setup
from ..train.downstream_text import TextTabularRegressionTrainer


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, type=str)
    p.add_argument("--text_path", default="frozen",
                   choices=["frozen", "finetune"])
    p.add_argument("--text_model", default="hashing", type=str,
                   help="'hashing' or an HF model id present in the local "
                        "cache (e.g. sentence-transformers/all-roberta-"
                        "large-v1, intfloat/e5-mistral-7b-instruct)")
    p.add_argument("--lora_rank", default=8, type=int)
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--channels", default=64, type=int)
    p.add_argument("--num_layers", default=2, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--testing", action="store_true")
    p.add_argument("--wandb_dir", default="wandb/", type=str)
    args = p.parse_args(argv)
    logger_setup()

    cfg = Config(model="fttransformer", data=args.dataset,
                 batch_size=args.batch_size, epochs=args.epochs,
                 n_hidden=args.channels, n_gnn_layers=args.num_layers,
                 lr=args.lr, dropout=args.dropout, testing=args.testing,
                 wandb_dir=args.wandb_dir)
    logging.info(cfg.to_json())

    finetune = args.text_path == "finetune"
    embedder = None
    text_module, tokenizer, text_dim = None, None, 0
    if args.text_model != "hashing":
        if finetune:
            # real pretrained-LM finetune (downstream_model_LLM.py:70-83):
            # cache-gated; falls back to the from-scratch flax LM
            from ..nn.text import pretrained_text_model
            try:
                text_module, tokenizer, text_dim = pretrained_text_model(
                    args.text_model, lora_rank=args.lora_rank)
                logging.info("finetuning cached LM '%s' (hidden=%d, frozen "
                             "base + LoRA)", args.text_model, text_dim)
            except RuntimeError as e:
                logging.warning("%s — falling back to the flax LM", e)
        else:
            from ..nn.text import get_text_embedder
            embedder = get_text_embedder(args.text_model)
    dataset = AmazonFashionDataset(
        root=cfg.data,
        text_stype=(Stype.text_tokenized if finetune
                    else Stype.text_embedded),
        text_embedder=embedder, tokenizer=tokenizer, channels=cfg.n_hidden)
    trainer = TextTabularRegressionTrainer(cfg, dataset,
                                           finetune_text=finetune,
                                           lora_rank=args.lora_rank,
                                           text_module=text_module,
                                           text_model_dim=text_dim)
    rl = RunLogger(os.path.join(cfg.wandb_dir, "run_downstream_llm"),
                   config=__import__("json").loads(cfg.to_json()),
                   use_wandb=not cfg.testing)
    history, best = trainer.fit(rl)
    rl.close()
    logging.info(f"best val rmse: {best:.4f}")
    return history, best


if __name__ == "__main__":
    main()
