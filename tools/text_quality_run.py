"""Text-stack quality table: frozen embeddings vs in-LM LoRA finetune.

Produces the reference's ``downstream_model_LLM.py`` comparison — rating
regression (RMSE) on AmazonFashion with (a) FROZEN precomputed text
embeddings and (b) a finetuned text encoder (frozen cached LM + trainable
LoRA on the attention q/v kernels, peft target modules at
``downstream_model_LLM.py:59-83``) — as a checked-in artifact
(VERDICT r3 next-step #7). Both paths load the COMMITTED tiny HF
checkpoint ``tests/fixtures/tiny_lm`` (made by ``tools/make_tiny_lm.py``),
so the cached-LM machinery (from_pretrained, tokenizer, LoRA injection)
is what actually runs, in every environment.

Writes ``outputs/quality/text/summary.json`` (+ per-variant
``metrics.jsonl``). Usage: python tools/text_quality_run.py [--rows 2000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("RMM_QUALITY_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path = [p for p in sys.path if "axon_site" not in p]
    for _v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
               "AXON_LOOPBACK_RELAY"):
        os.environ.pop(_v, None)

import jax  # noqa: E402

if os.environ.get("RMM_QUALITY_CPU", "1") == "1":
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
jax.config.update("jax_compilation_cache_dir", "/tmp/rmm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TINY_LM = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "tiny_lm")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--lora_rank", type=int, default=4)
    ap.add_argument("--out", default="outputs/quality/text")
    args = ap.parse_args()

    from rmm_tpu.cli.downstream_llm import main as cli_main
    from rmm_tpu.datasets.amazon_fashion import synthetic_amazon_fashion

    os.makedirs(args.out, exist_ok=True)
    csv = os.path.join(args.out, "reviews.csv")
    synthetic_amazon_fashion(csv, num_rows=args.rows, seed=0)

    summary = {"rows": args.rows, "epochs": args.epochs,
               "channels": args.channels, "lora_rank": args.lora_rank,
               "lm": "tests/fixtures/tiny_lm",
               "platform": jax.default_backend(), "variants": {}}
    for variant in ("frozen", "finetune"):
        t0 = time.time()
        history, best = cli_main([
            "--dataset", csv, "--text_path", variant,
            "--text_model", TINY_LM, "--lora_rank", str(args.lora_rank),
            "--batch_size", str(args.batch_size),
            "--epochs", str(args.epochs),
            "--channels", str(args.channels), "--num_layers", "1",
            "--testing"])
        with open(os.path.join(args.out, f"{variant}.jsonl"), "w") as f:
            for rec in history:
                f.write(json.dumps(rec) + "\n")
        summary["variants"][variant] = {
            "best_val_rmse": round(float(best), 6),
            "final_train_loss": round(float(history[-1]["loss"]), 6),
            "wall_s": round(time.time() - t0, 1),
        }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
