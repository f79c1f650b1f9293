"""Benchmark: TensorFrame encode + FTTransformer forward, rows/sec/chip.

The north-star metric of BASELINE.json: the reference's hot path is
per-batch stype encoding + column-transformer forward; the rebuild streams
device-resident column tensors through a single jitted encode+forward
program. ``value`` is steady-state rows/sec on the current accelerator;
``vs_baseline`` is the speedup over the same jitted program on one CPU host
(the reference's CPU baseline; the north star is ≥10×).

Prints exactly ONE JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

try:  # persistent compile cache (cold compiles cost minutes via the relay)
    from rmm_tpu.utils.jaxenv import setup as _jax_setup

    _jax_setup()
except Exception:
    pass

ROWS = 1 << 17          # 131072 rows in the table
BATCH = 8192            # rows per forward
CHANNELS = 128          # SSL config of record (fused.py:626-630)
LAYERS = 3
WARMUP = 10
ITERS = 200


def build(rows: int):
    import jax
    import numpy as np

    from rmm_tpu.datasets.synthetic import synthetic_aml_frame
    from rmm_tpu.frame import Dataset, Stype
    from rmm_tpu.nn.encoders import make_stypewise_encoder
    from rmm_tpu.nn.models import FTTransformer

    df = synthetic_aml_frame(num_rows=rows, num_accounts=rows // 16, seed=0)
    ds = Dataset(
        df,
        {"Payment Currency": Stype.categorical,
         "Receiving Currency": Stype.categorical,
         "Payment Format": Stype.categorical,
         "Timestamp": Stype.timestamp,
         "Amount Paid": Stype.numerical,
         "Is Laundering": Stype.categorical},
        target_col="Is Laundering",
    ).materialize()

    enc = make_stypewise_encoder(ds, CHANNELS)
    model = FTTransformer(CHANNELS, LAYERS)
    table = jax.device_put(ds.tensor_frame)
    key = jax.random.PRNGKey(0)

    import jax.numpy as jnp

    def fwd(params, table, idx):
        sub = table[idx]
        tokens, _ = enc.apply(params["enc"], sub)
        x, x_cls = model.apply(params["model"], tokens)
        return x_cls.sum()

    idx0 = jnp.arange(BATCH)
    sub0 = ds.tensor_frame[np.arange(BATCH)]
    params = {
        "enc": enc.init(key, jax.device_put(sub0)),
        "model": model.init(key, jnp.zeros((BATCH, 6, CHANNELS))),
    }
    return jax.jit(fwd), params, table, idx0


def measure(iters: int = ITERS, rows: int = ROWS) -> float:
    import jax
    import jax.numpy as jnp

    fwd, params, table, idx0 = build(rows)
    if os.environ.get("BENCH_BF16"):
        # serving precision: bf16 params/tables, f32 accumulation in matmuls
        from rmm_tpu.utils.precision import cast_floats

        params = cast_floats(params, jnp.bfloat16)
        table = cast_floats(table, jnp.bfloat16)
    n = table.num_rows

    # time the whole loop ON DEVICE (lax.fori_loop → ONE dispatch + ONE
    # sync); host-side per-call dispatch/sync latency would otherwise
    # dominate and make the number noise, especially through a TPU tunnel
    def run_n(params, table, n_iters):
        def body(i, acc):
            idx = (idx0 + i * BATCH) % n
            return acc + fwd(params, table, idx)

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    run_n = jax.jit(run_n, static_argnames=("n_iters",))
    # slope method: (t[iters] - t[1]) removes the dispatch+sync intercept
    jax.block_until_ready(run_n(params, table, 1))
    jax.block_until_ready(run_n(params, table, iters))
    t0 = time.perf_counter()
    jax.block_until_ready(run_n(params, table, 1))
    t1 = time.perf_counter()
    jax.block_until_ready(run_n(params, table, iters))
    t2 = time.perf_counter()
    dt = max((t2 - t1) - (t1 - t0), 1e-9)
    return BATCH * (iters - 1) / dt


def main():
    if "--cpu-baseline" in sys.argv:
        # clean process: no axon .pth in PYTHONPATH, CPU platform
        print(json.dumps({"rows_per_sec": measure(iters=6, rows=ROWS)}))
        return

    import numpy as np  # noqa: F401

    value = measure()
    print(f"accelerator rows/sec: {value:,.0f}", file=sys.stderr)

    cpu_rps = None
    try:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            env=env, capture_output=True, text=True, timeout=1200)
        cpu_rps = json.loads(res.stdout.strip().splitlines()[-1])[
            "rows_per_sec"]
        print(f"cpu-baseline rows/sec: {cpu_rps:,.0f}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"cpu baseline failed: {e}", file=sys.stderr)

    vs = (value / cpu_rps) if cpu_rps else 1.0
    print(json.dumps({
        "metric": "encode+fttransformer_fwd rows/sec/chip",
        "value": round(value, 1),
        "unit": "rows/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    import numpy as np  # noqa: F401
    main()
