"""Op-level report from a jax.profiler trace directory.

Parses the ``*.xplane.pb`` written by ``jax.profiler.trace`` (via xprof's
converter, no TensorBoard UI needed) and prints the top operations by
total self time, split host vs device — the attribution artifact for the
roofline gap (docs/PERF.md: the supervised step runs at sol_frac ≈ 0.10;
this names where the other 90% goes).

Usage: python tools/trace_report.py outputs/tpu/trace/host [--top 25]
       python tools/trace_report.py <dir> --json out.json
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def find_xplanes(trace_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))


def op_stats(xplane_paths: list[str]) -> list[dict]:
    """Rows: rank / host_or_device / type / operation / occurrences /
    total_time (us) / avg_time / total_self_time / ... via xprof's
    framework_op_stats tool."""
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplane_paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    rows: list[dict] = []
    for table in tables:
        cols = [c["id"] for c in table.get("cols", [])]
        for r in table.get("rows", []):
            vals = [c.get("v") for c in r["c"]]
            rows.append(dict(zip(cols, vals)))
        if rows:
            break  # first table is the per-op ranking
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None,
                    help="also write the full rows to this path")
    args = ap.parse_args()

    paths = find_xplanes(args.trace_dir)
    if not paths:
        print(f"no *.xplane.pb under {args.trace_dir}", file=sys.stderr)
        sys.exit(1)
    rows = op_stats(paths)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)

    for side in ("Device", "Host"):
        sided = [r for r in rows
                 if str(r.get("host_or_device", "")).lower() == side.lower()]
        sided.sort(key=lambda r: -float(r.get("total_self_time", 0) or 0))
        total = sum(float(r.get("total_self_time", 0) or 0) for r in sided)
        print(f"\n== {side} ops by total self time "
              f"(total {total / 1e3:.1f} ms) ==")
        for r in sided[: args.top]:
            t = float(r.get("total_self_time", 0) or 0)
            pct = 100.0 * t / total if total else 0.0
            print(f"{pct:5.1f}%  {t / 1e3:9.2f} ms  x{r.get('occurrences')}"
                  f"  {str(r.get('type')):24s} {str(r.get('operation'))[:70]}")


if __name__ == "__main__":
    main()
