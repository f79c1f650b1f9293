"""Pure-LLM finetuning CLI — the ``finetune_LLM.py`` entry point: review
text → rating regression with a (LoRA-adapted) text encoder and MSE eval
(``finetune_LLM.py:15-90``; the reference's HF Trainer + peft SEQ_CLS loop
becomes one jitted step).
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..nn.text import TextToEmbeddingFinetune
from ..utils.logging import RunLogger, logger_setup

logger = logging.getLogger(__name__)


def read_dataset(csv_path: str, text_col: str = "reviewText",
                 target_col: str = "overall", max_length: int = 64,
                 tokenizer=None):
    """csv → (token_ids [N, L], ratings [N]) (``finetune_LLM.py:15-27``)."""
    df = pd.read_csv(csv_path)
    texts = df[text_col].fillna("").tolist()
    if tokenizer is None:
        ids = TextToEmbeddingFinetune.tokenize(texts,
                                               max_length=max_length)
    else:
        ids = tokenizer(texts)
    y = df[target_col].to_numpy(dtype=np.float32)
    return ids, y


def finetune_llm(csv_path: str, epochs: int = 5, batch_size: int = 128,
                 lr: float = 1e-3, hidden: int = 128, num_layers: int = 2,
                 lora_rank: int = 8, max_length: int = 64, seed: int = 0,
                 text_model: str = "hashing", run_logger=None,
                 save_model: str | None = None):
    # pretrained path first (the reference finetunes an actual HF LM,
    # finetune_LLM.py:29-90): cache-gated, clear fallback
    encoder, tokenizer, enc_hidden = None, None, hidden
    if text_model and text_model != "hashing":
        from ..nn.text import pretrained_text_model
        try:
            encoder, tokenizer, enc_hidden = pretrained_text_model(
                text_model, lora_rank=lora_rank, max_length=max_length)
            logger.info("finetuning cached LM '%s' (hidden=%d, frozen base "
                        "+ LoRA)", text_model, enc_hidden)
        except RuntimeError as e:
            logger.warning("%s — falling back to the flax LM", e)
    if encoder is None:
        encoder = TextToEmbeddingFinetune(hidden=hidden,
                                          num_layers=num_layers,
                                          lora_rank=lora_rank,
                                          max_length=max_length)
        enc_hidden = hidden

    ids, y = read_dataset(csv_path, max_length=max_length,
                          tokenizer=tokenizer)
    n = len(y)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_train = int(n * 0.8)
    tr_idx, te_idx = perm[:n_train], perm[n_train:]

    key = jax.random.PRNGKey(seed)
    key, k1 = jax.random.split(key)
    params = {"encoder": encoder.init(k1, jnp.zeros((2, max_length),
                                                    jnp.int32))}
    params["head"] = {
        "w": jnp.zeros((enc_hidden, 1)), "b": jnp.zeros((1,))}
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    def forward(p, tok, train, dk):
        h = encoder.apply(p["encoder"], tok, not train,
                          rngs={"dropout": dk} if train else {})
        return (h @ p["head"]["w"])[:, 0] + p["head"]["b"][0]

    @jax.jit
    def step(p, os_, tok, yy, dk):
        def loss_fn(p):
            pred = forward(p, tok, True, dk)
            return jnp.mean((pred - yy) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, os_ = tx.update(grads, os_, p)
        return optax.apply_updates(p, updates), os_, loss

    @jax.jit
    def predict(p, tok):
        return forward(p, tok, False, None)

    history = []
    for epoch in range(epochs):
        t0 = time.time()
        rng.shuffle(tr_idx)
        tot = cnt = 0.0
        for s in range(0, len(tr_idx) - batch_size + 1, batch_size):
            sel = tr_idx[s : s + batch_size]
            key, dk = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, ids[sel],
                                           y[sel], dk)
            tot += float(loss)
            cnt += 1
        # MSE eval (finetune_LLM.py compute_metrics)
        preds = []
        for s in range(0, len(te_idx), batch_size):
            sel = te_idx[s : s + batch_size]
            tok = ids[sel]
            if len(sel) < batch_size:
                tok = np.pad(tok, [(0, batch_size - len(sel)), (0, 0)])
            preds.append(np.asarray(predict(params, tok))[: len(sel)])
        mse = float(np.mean((np.concatenate(preds) - y[te_idx]) ** 2))
        rec = {"epoch": epoch, "train_mse": tot / max(cnt, 1),
               "eval_mse": mse, "sec": time.time() - t0}
        logger.info(str(rec))
        if run_logger is not None:
            run_logger.log(rec, step=epoch)
        history.append(rec)
    if save_model:
        from ..nn.text.pretrained import PretrainedTextEncoder
        if isinstance(encoder, PretrainedTextEncoder):
            # stage-1 export of the two-stage workflow: merge LoRA into
            # the base kernels, save an HF checkpoint stage 2 loads via
            # --text_model <dir> (ref slurm/separate/stage1→stage2)
            from ..nn.text.pretrained import export_finetuned_lm

            export_finetuned_lm(encoder, params["encoder"], tokenizer,
                                save_model)
            logger.info("exported LoRA-merged LM to %s", save_model)
        else:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(save_model, "final",
                            {"params": {"encoder": params["encoder"],
                                        "head": params["head"]}})
            logger.info("saved flax encoder+head to %s", save_model)
    return history, params


def main(argv=None):
    from ..utils.jaxenv import setup as _jax_setup
    _jax_setup()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, type=str)
    p.add_argument("--epochs", default=5, type=int)
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--hidden", default=128, type=int)
    p.add_argument("--num_layers", default=2, type=int)
    p.add_argument("--lora_rank", default=8, type=int)
    p.add_argument("--max_length", default=64, type=int)
    p.add_argument("--text_model", default="hashing", type=str,
                   help="'hashing' (from-scratch flax LM) or an HF model id "
                        "/ path present in the local cache")
    p.add_argument("--testing", action="store_true")
    p.add_argument("--wandb_dir", default="wandb/", type=str)
    p.add_argument("--save_model", default=None, type=str,
                   help="export dir: LoRA-merged HF checkpoint (pretrained "
                        "path) or flax encoder+head pytrees — stage-2 CLIs "
                        "load it via --text_model <dir>")
    args = p.parse_args(argv)
    logger_setup()
    rl = RunLogger(os.path.join(args.wandb_dir, "run_finetune_llm"),
                   config=vars(args), use_wandb=not args.testing)
    history, _ = finetune_llm(
        args.dataset, epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr, hidden=args.hidden, num_layers=args.num_layers,
        lora_rank=args.lora_rank, max_length=args.max_length,
        text_model=args.text_model, run_logger=rl,
        save_model=args.save_model)
    rl.close()
    return history


if __name__ == "__main__":
    main()
