"""Bisect the SSL-step remote-compile failure (VERDICT r5 blocker).

The C=128 mcm-lp train step reproducibly kills the axon terminal-side
``tpu_compile_helper`` (SIGKILL with the Pallas kernel, exit 1 without —
observed rounds 4-5, single-battery runs included), so every bench
battery records ``ssl_* = null``.  The program itself is clean (1.68 MB
StableHLO, zero large dense constants — /tmp/ssl_lower.py round 5), so
the failure is compile-RESOURCE-shaped, not baked-constants-shaped.
This tool compiles one variant per subprocess and records which knob
(channels, mode, scan_layers, precision, grad) crosses the helper's
limit.  Cheapest-first so a wedged tunnel still yields signal.

Usage: python tools/ssl_compile_bisect.py            # full bisect
       python tools/ssl_compile_bisect.py --one C64  # single variant
Writes outputs/tpu/ssl_compile_bisect.json incrementally.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# name -> (config overrides, mode, env)
VARIANTS = {
    # ladders: find the size where the helper dies
    "C32": (dict(n_hidden=32), "mcm-lp", {}),
    "C64": (dict(n_hidden=64), "mcm-lp", {}),
    "C96": (dict(n_hidden=96), "mcm-lp", {}),
    "C128": (dict(n_hidden=128), "mcm-lp", {}),
    # factor isolation at C=128
    "C128-mcm": (dict(n_hidden=128), "mcm", {}),
    "C128-lp": (dict(n_hidden=128), "lp", {}),
    "C128-f32": (dict(n_hidden=128, precision="f32"), "mcm-lp", {}),
    "C128-unrolled": (dict(n_hidden=128, scan_layers=False), "mcm-lp", {}),
    "C128-nopallas": (dict(n_hidden=128), "mcm-lp",
                      {"RMM_DISABLE_PALLAS": "1"}),
    "C128-scatterseg": (dict(n_hidden=128), "mcm-lp",
                        {"RMM_SEGMENT_IMPL": "scatter"}),
}


def build_and_compile(name: str) -> None:
    from rmm_tpu.utils.jaxenv import setup

    setup()
    import tempfile

    import jax

    from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
    from rmm_tpu.datasets.base import PretrainType
    from rmm_tpu.train.pretrain import PretrainTrainer
    from rmm_tpu.utils.config import Config

    over, mode, _env = VARIANTS[name]
    rows = int(os.environ.get("BENCH_ROWS", 16384))
    csv = os.path.join(tempfile.gettempdir(), f"bench_aml_{rows}.csv")
    if not os.path.exists(csv):
        write_synthetic_aml_csv(csv, num_rows=rows,
                                num_accounts=max(rows // 16, 64), seed=0)
    kw = dict(model="tabgnnfused", data=csv, batch_size=200,
              n_hidden=128, n_gnn_layers=3, dropout=0.5,
              num_neighs=(100, 100), num_neg_samples=64, lr=2e-4,
              epochs=1, testing=True, precision="bf16", scan_layers=True)
    kw.update(over)
    cfg = Config(**kw)
    pre = {PretrainType.LINK_PRED}
    if "mcm" in mode:
        pre.add(PretrainType.MASK)
    if mode == "mcm":
        pre = {PretrainType.MASK}
    ds = IBMTransactionsAML(root=csv, pretrain=pre,
                            khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden)
    tr = PretrainTrainer(cfg, ds, mode=mode)
    view = ds.edges.split()[0]
    gb = next(iter(tr._batches(view, "train", epoch=0)))
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    lowered = tr._train_step.lower(tr.params, tr.batch_stats, tr.opt_state,
                                   tr.moco_state, gb, rng, tr.edge_table)
    nbytes = len(lowered.as_text())
    lowered.compile()
    print(json.dumps({"variant": name, "ok": True,
                      "stablehlo_bytes": nbytes,
                      "compile_sec": round(time.time() - t0, 1)}))


def main() -> None:
    if "--one" in sys.argv:
        build_and_compile(sys.argv[sys.argv.index("--one") + 1])
        return

    # no up-front device probe: the queue gates on one, and the tunnel
    # flaps fast enough that back-to-back probes disagree — each variant
    # subprocess carries its own timeout and failure record instead.
    path = os.path.join(REPO, "outputs", "tpu", "ssl_compile_bisect.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # resume: keep succeeded variants from a previous (flap-interrupted)
    # run; only failed/missing ones re-run
    done: dict[str, dict] = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                done = {r["variant"]: r for r in json.load(f)
                        if r.get("ok")}
        except Exception:
            done = {}
    results = list(done.values())
    for name, (_, _, env) in VARIANTS.items():
        if name in done:
            continue
        # APPEND to PYTHONPATH — replacing it drops /root/.axon_site and
        # the subprocess cannot register the axon platform at all
        pp = os.pathsep.join(
            p for p in (REPO, os.environ.get("PYTHONPATH", "")) if p)
        e = dict(os.environ, PYTHONPATH=pp, **env)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                env=e, capture_output=True, text=True, timeout=2400)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {"variant": name, "ok": False,
                       "error": r.stderr[-400:]}
            if not rec.get("variant"):
                rec = {"variant": name, "ok": False, "error":
                       (r.stderr[-400:] or f"empty output, rc={r.returncode}")}
        except subprocess.TimeoutExpired:
            rec = {"variant": name, "ok": False, "error": "timeout 2400s"}
        print(rec, file=sys.stderr)
        results.append(rec)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
