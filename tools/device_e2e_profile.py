"""Phase-attributed e2e breakdown: host-sampler vs device-sampler paths.

VERDICT r4 weak #1 / next-step #2: the in-jit device sampler WINS the
train step (5,040 vs 4,647 rows/s) but LOSES the overlapped epoch (1,889
vs 2,284 rows/s), and next-step #4: the supervised step runs at
sol_frac ≈ 0.12 with 88% of step time unattributed.  This script runs on
the real chip and attributes both gaps:

  * host path:   sampler-only pass | stack+transfer | scan dispatch | e2e
  * device path: seed-iter pass | sample_group dispatch | scan dispatch | e2e
  * one jax.profiler trace of a K-step group on each path (committed under
    outputs/tpu/trace/ — the artifact VERDICT asks for)

Method: each phase is measured in isolation over the SAME epoch's groups
(same seeds → same batches), forcing completion with jax.device_get of a
small output (block_until_ready can return early through the tunnel —
CLAUDE.md gotcha).  Phases don't sum to e2e (e2e overlaps them); the
deltas say where the non-overlapped time goes.

Usage: python tools/device_e2e_profile.py [--rows 131072] [--k 8]
Writes outputs/tpu/e2e_breakdown.json (+ trace dirs) unless --dry.
Ref: /root/reference/benchmark.py:684-744 (the reference's phase-
accounting philosophy, applied on-chip).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rmm_tpu.utils.jaxenv import setup as _jax_setup  # noqa: E402

_jax_setup()


def build(rows: int, sampler: str, k: int):
    import bench

    os.environ["BENCH_TRAIN_K"] = str(k)
    cfg, ds, tr = bench.build_trainer(rows, sampler=sampler)
    view = ds.edges.split()[0]
    return cfg, ds, tr, view


def _groups(tr, view, k, use_dev, epoch=0, limit=None):
    """Materialize the epoch's dispatch groups on host (pre-sampling)."""
    import numpy as np

    it = (tr._seed_batches(view, "train", epoch) if use_dev
          else tr._batches(view, "train", epoch))
    groups, cur = [], []
    for gb in it:
        cur.append(gb)
        if len(cur) == k:
            groups.append(cur)
            cur = []
            if limit and len(groups) >= limit:
                break
    if cur and not (limit and len(groups) >= limit):
        while len(cur) < k:
            cur.append(cur[-1])
        groups.append(cur)
    return groups


def _stack(batches):
    import jax
    import numpy as np

    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs) if xs[0] is not None else None, *batches)


def profile_path(rows: int, sampler: str, k: int, trace_dir: str | None):
    import jax
    import numpy as np

    cfg, ds, tr, view = build(rows, sampler, k)
    use_dev = tr._use_device_sampler()
    out = {"sampler": sampler, "resolved_device": bool(use_dev),
           "batch_size": cfg.batch_size, "k": k}
    B = cfg.batch_size

    # --- phase 1: host iterator alone (C++ sampling / seed building) ----
    t0 = time.perf_counter()
    groups = _groups(tr, view, k, use_dev, epoch=0)
    out["host_iter_sec"] = round(time.perf_counter() - t0, 3)
    n_rows = sum(len(g) for g in groups) * B
    out["rows"] = n_rows

    dgraph = tr._dgraph("train") if use_dev else None
    rngs = jax.random.split(jax.random.PRNGKey(0), k)
    real = np.ones(k, bool)

    # compile both programs off the clock
    s0 = _stack(groups[0])
    if use_dev:
        sampled0, d0, k0 = tr._sample_group(s0, dgraph)
        jax.device_get(d0)
        first = sampled0
    else:
        first = jax.device_put(s0)
    jax.device_get(tr._scan_step(tr.variables, tr.opt_state, first, rngs,
                                 real, tr.edge_table, tr.node_table)[2])

    # --- phase 2 (device path): sample_group dispatches alone -----------
    if use_dev:
        t0 = time.perf_counter()
        last = None
        for g in groups:
            st, d, _ = tr._sample_group(_stack(g), dgraph)
            last = d
        jax.device_get(last)
        out["sample_dispatch_sec"] = round(time.perf_counter() - t0, 3)

    # --- phase 3: stack+transfer+scan dispatches alone (pre-sampled) ----
    pre = []
    for g in groups:
        st = _stack(g)
        if use_dev:
            st, _, _ = tr._sample_group(st, dgraph)
        pre.append(st)
    # force all sampling to finish before timing the scan phase
    jax.device_get(jax.tree_util.tree_leaves(pre[-1])[0])
    t0 = time.perf_counter()
    lastloss = None
    v, o = tr.variables, tr.opt_state
    for st in pre:
        v, o, ls, _ = tr._scan_step(v, o, st, rngs, real, tr.edge_table,
                                    tr.node_table)
        lastloss = ls
    jax.device_get(lastloss)
    out["scan_only_sec"] = round(time.perf_counter() - t0, 3)

    # --- phase 4: the real overlapped epoch ------------------------------
    t0 = time.perf_counter()
    rec = tr.train_epoch(view, epoch=1)
    out["e2e_sec"] = round(time.perf_counter() - t0, 3)
    out["e2e_rows_per_sec"] = round(n_rows / rec["sec"], 1)
    out["epoch_rec_sec"] = round(rec["sec"], 3)

    # --- optional: one traced group --------------------------------------
    if trace_dir:
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            st = pre[0]
            if use_dev:
                st2, d, _ = tr._sample_group(_stack(groups[0]), dgraph)
                jax.device_get(d)
                st = st2
            _, _, ls, _ = tr._scan_step(tr.variables, tr.opt_state, st,
                                        rngs, real, tr.edge_table,
                                        tr.node_table)
            jax.device_get(ls)
        out["trace_dir"] = trace_dir
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int,
                    default=int(os.environ.get("BENCH_ROWS", 1 << 17)))
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--trace", action="store_true",
                    help="capture jax.profiler traces (large artifacts)")
    ap.add_argument("--ssl-channels", type=int, default=64,
                    help="also time+trace one SSL step at this width "
                         "(0 disables)")
    ap.add_argument("--out", default="outputs/tpu/e2e_breakdown.json")
    args = ap.parse_args()

    import bench

    # 300 s: on a contended 1-core box the probe subprocess's jax import
    # + relay round-trip alone can exceed the default 180 s
    if not bench._probe_device(timeout_s=300):
        print("accelerator unreachable — refusing to profile on CPU",
              file=sys.stderr)
        sys.exit(1)

    results = []

    def flush():
        os.makedirs(os.path.dirname(os.path.join(REPO, args.out)),
                    exist_ok=True)
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump({"rows": args.rows, "k": args.k,
                       "results": results}, f, indent=1)

    for sampler in ("host", "device"):
        td = (os.path.join(REPO, "outputs", "tpu", "trace", sampler)
              if args.trace else None)
        r = profile_path(args.rows, sampler, args.k, td)
        print(json.dumps(r), file=sys.stderr)
        results.append(r)
        flush()  # a tunnel wedge on path 2 must not lose path 1

    # SSL step trace at the largest chip-compiling width (C=64 today —
    # the C=128 config of record kills the remote compile helper, see
    # ssl_compile_bisect): op-level attribution for the scanned fused
    # stack, where per-layer sorts cannot CSE across lax.scan iterations.
    if args.ssl_channels:
        try:
            import bench
            td = (os.path.join(REPO, "outputs", "tpu", "trace",
                               f"ssl_c{args.ssl_channels}")
                  if args.trace else None)
            rps, perf = bench.measure_ssl_train(
                channels=args.ssl_channels, trace_dir=td)
            r = {"sampler": f"ssl_c{args.ssl_channels}",
                 "rows_per_sec": round(rps, 1)}
            if perf:
                r["mfu"] = round(perf["mfu"], 5)
                if perf.get("sol_frac"):
                    r["sol_frac"] = round(perf["sol_frac"], 4)
            if td:
                r["trace_dir"] = td
            print(json.dumps(r), file=sys.stderr)
            results.append(r)
            flush()
        except Exception as e:  # the supervised artifact must survive
            print(f"ssl profile failed: {e}", file=sys.stderr)

    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
