"""On-chip A/B battery: the two trace-time knobs bench.py can't flip.

Runs each variant in its OWN subprocess (both knobs — RMM_SEGMENT_IMPL and
RMM_DISABLE_PALLAS — are read at trace time; a compiled+cached program does
not retrace when the env var changes, ops/segment.py:98-101) and collects
one JSON artifact under ``outputs/tpu/``:

  * supervised train step (config of record), segment backend sort vs
    scatter — the round-2/3 "sort is ~2.5x faster on TPU" claim;
  * SSL train step (C=128, bf16, scan_layers), Pallas column-attention
    kernel vs the XLA einsum path — the round-3 "Pallas in training" claim.

Usage:  python tools/tpu_ab_run.py            # full battery -> artifact
        python tools/tpu_ab_run.py --one seg=sort   # single variant (JSON
                                                    # line on stdout)

Reference for the measured step: /root/reference/benchmark.py:869-951
(the reference's profiling harness measures the same phases on CUDA).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    # name -> (env overrides, measurement)
    "seg=sort": ({}, "sup"),
    "seg=scatter": ({"RMM_SEGMENT_IMPL": "scatter"}, "sup"),
    # precision + batch-size ladders: the two roofline levers. The step is
    # memory-bound by capacity (sol_frac ~0.1 at B=200) — bf16 halves the
    # activation bytes; B=400/800 amortize the fixed capacity-shaped work
    # over more seed rows (caps are graph-bounded at the 131k config, so
    # rows/s should scale if and only if capacity dominates latency).
    "sup=bf16": ({"BENCH_PRECISION": "bf16"}, "sup"),
    "sup=B400": ({"BENCH_BATCH": "400"}, "sup"),
    "sup=B800": ({"BENCH_BATCH": "800"}, "sup"),
    # round-5 trace finding: at 131k-lane batches the hd<16 head-expanded
    # einsum attention dominates the step (its [B,S,H,C] HBM intermediates,
    # fwd muls + bwd dot_generals/reduce_sums ~52%); this row measures the
    # VMEM-resident Pallas kernel there instead (transformer.py gate).
    # MEASURED 2026-08-19 on-chip: 430 rows/s (465 ms/step) vs 1,055 for
    # the einsum path — the kernel's 1024-tile sequential grid of
    # batched tiny (M=N=7, K=32) dots loses far more to MXU/VPU
    # underutilization than it saves in HBM traffic. The hd>=16 gate
    # stands on round-5 data; the row stays so future batteries keep the
    # regression record (cache-warm re-measure is cheap).
    "sup=pallas-hd4": ({"RMM_FORCE_PALLAS": "1"}, "sup"),
    "ssl=C64-pallas": ({"BENCH_SSL_C": "64", "RMM_FORCE_PALLAS": "1"},
                       "ssl"),
    # chip-proven SSL width (the C=128 program kills the terminal-side
    # remote compile helper — see ssl_compile_bisect). At C=64 head_dim=8
    # so the Pallas kernel does not engage (transformer.py kernel_ok gate);
    # this row is the SSL perf datum, the two C=128 rows below are the
    # Pallas-vs-XLA A/B and double as the helper-limit record when they
    # fail to compile.
    "ssl=C64": ({"BENCH_SSL_C": "64"}, "ssl"),
    "ssl=pallas": ({}, "ssl"),
    "ssl=xla": ({"RMM_DISABLE_PALLAS": "1"}, "ssl"),
}


def run_one(name: str) -> None:
    import bench

    env, kind = VARIANTS[name]
    if kind == "sup":
        dev_rps, _, _, perf = bench.measure_train(e2e=False)
        batch = int(os.environ.get("BENCH_BATCH", 200))
        out = {"variant": name, "rows_per_sec": round(dev_rps, 1),
               "step_ms": round(1e3 * batch / dev_rps, 2)}
    else:
        c = int(os.environ.get("BENCH_SSL_C", 128))
        ssl_rps, perf = bench.measure_ssl_train(channels=c)
        out = {"variant": name, "channels": c,
               "rows_per_sec": round(ssl_rps, 1),
               "step_ms": round(1e3 * 200 / ssl_rps, 2)}
    if perf:
        out["mfu"] = round(perf["mfu"], 5)
        if perf.get("sol_frac"):
            out["sol_frac"] = round(perf["sol_frac"], 4)
    # capture the device string HERE (inside the measured subprocess,
    # where jax is already live) — jax.devices() in the parent after the
    # battery can hang indefinitely if the tunnel flaps mid-run, losing
    # the whole artifact
    out["device"] = str(__import__("jax").devices()[0])
    print(json.dumps(out))


def main() -> None:
    if "--one" in sys.argv:
        run_one(sys.argv[sys.argv.index("--one") + 1])
        return
    import jax  # noqa: F401  (probe via bench's subprocess guard instead)
    import bench

    if not bench._probe_device():
        print("accelerator unreachable — refusing to record CPU numbers "
              "as an on-chip A/B", file=sys.stderr)
        sys.exit(1)

    os.makedirs(os.path.join(REPO, "outputs", "tpu"), exist_ok=True)
    path = os.path.join(REPO, "outputs", "tpu", "ab.json")
    results, t0 = [], time.time()

    def flush():
        # incremental: a wedge on variant 3 must not discard variants 1-2
        dev = next((r["device"] for r in results if "device" in r), None)
        art = {"battery_sec": round(time.time() - t0, 1),
               "device": dev, "results": results}
        with open(path, "w") as f:
            json.dump(art, f, indent=1)
        return art

    # RMM_AB_ONLY=name1,name2 runs a subset — for flap-constrained windows
    # where the fresh-compile variants must be prioritized
    only = os.environ.get("RMM_AB_ONLY")
    selected = {n: v for n, v in VARIANTS.items()
                if not only or n in only.split(",")}
    for name, (env, _) in selected.items():
        # APPEND to PYTHONPATH — replacing it drops /root/.axon_site and
        # the subprocess cannot register the axon platform at all
        pp = os.pathsep.join(
            p for p in (REPO, os.environ.get("PYTHONPATH", "")) if p)
        e = dict(os.environ, PYTHONPATH=pp, **env)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                env=e, capture_output=True, text=True, timeout=3600)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {"variant": name, "error": r.stderr[-500:]}
            if not rec.get("variant"):  # empty stdout masks a crash
                rec = {"variant": name, "error":
                       (r.stderr[-500:] or f"empty output, rc={r.returncode}")}
        except subprocess.TimeoutExpired:
            rec = {"variant": name, "error": "timeout (3600s, tunnel wedge?)"}
        print(rec, file=sys.stderr)
        results.append(rec)
        flush()

    art = flush()
    print(json.dumps(art))
    # rc gates the chip-queue's done-sentinel: a battery where the
    # supervised ladder produced no numbers (tunnel flap mid-run, env
    # breakage) must NOT be marked done — require the baseline sort row
    # and at least 3 more measured variants (the two C=128 SSL rows may
    # legitimately record compile-helper errors).
    measured = {r["variant"] for r in results if "rows_per_sec" in r}
    if "seg=sort" not in measured or len(measured) < 4:
        print(f"battery incomplete: measured={sorted(measured)}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
