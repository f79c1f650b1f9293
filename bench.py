"""Benchmark: end-to-end supervised encode+TRAIN throughput, rows/sec/chip.

The north-star metric of BASELINE.json ("end-to-end encode+train"): one
fully-jitted supervised train step on the config-of-record supervised model
(TABGNN: stype encode → column transformer → PNA message passing → head →
loss → grads → adam update), k-hop sampler in the loop.

Three measurements (all reported in the single JSON line):
  * ``value``        — device train-step throughput: seed rows/s through
                       the jitted multi-step scan, slope method (t[K]−t[1]
                       removes the dispatch+sync intercept, which through a
                       TPU tunnel would otherwise dominate);
  * ``sampler_rows_per_sec`` — host C++ k-hop sampler throughput;
  * ``e2e_rows_per_sec``     — one real overlapped epoch (threaded sampler
                       + prefetch + scan dispatch), wall clock;
  * ``fwd_rows_per_sec``     — the round-1 encode+forward metric, kept for
                       continuity;
  * ``mfu``          — model FLOPs (XLA cost analysis) / step time / peak;
  * ``sol_frac``     — speed-of-light fraction: max(flops/peak_flops,
                       bytes/hbm_bw) / measured step time (docs/PERF.md);
  * ``ssl_*``        — the same at the MXU-bound SSL config of record
                       (C=128, bf16, scan_layers, Pallas attention);
  * ``device_sampler_*`` — the in-jit HBM-CSR sampler A/B recorded by the
                       same invocation (the --sampler auto flip decision).

``vs_baseline`` is the train-step speedup over the same jitted program on
one CPU host (the reference's CPU baseline; north star ≥10×).

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

ROWS = int(os.environ.get("BENCH_ROWS", 1 << 17))  # synthetic AML rows
FWD_BATCH = min(8192, ROWS)   # clamp for small BENCH_ROWS smoke runs
FWD_CHANNELS = 128      # SSL config of record (fused.py:626-630)
FWD_LAYERS = 3
# scan steps per dispatch (the sort segment backend is the default on all
# platforms since round 3 — the associative_scan construct that hung the
# TPU compiler was bisected and replaced, see rmm_tpu/ops/segment.py)
TRAIN_K = int(os.environ.get("BENCH_TRAIN_K", 8))
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16
HBM_BW = float(os.environ.get("BENCH_HBM_BW", 819e9))           # v5e B/s


def _perf_from_cost(cost, step_time: float):
    """Roofline context from XLA cost analysis: MFU plus the speed-of-light
    step time max(flops/peak, bytes/bw) as a fraction of the measured step
    (1.0 = at the roofline; small = overhead/latency-bound)."""
    if not cost or "flops" not in cost:
        return None
    flops = float(cost["flops"])
    bytes_ = float(cost.get("bytes accessed", 0.0))
    sol = max(flops / PEAK_FLOPS, bytes_ / HBM_BW)
    return {"mfu": flops / step_time / PEAK_FLOPS,
            "sol_frac": (sol / step_time) if sol > 0 else None,
            "flops_per_step": flops, "bytes_per_step": bytes_}


def time_of(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# ---------------------------------------------------------------------------
# encode+forward (round-1 metric, kept for continuity)
# ---------------------------------------------------------------------------

def build_fwd(rows: int):
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

    enc = make_stypewise_encoder(ds, FWD_CHANNELS)
    model = FTTransformer(FWD_CHANNELS, FWD_LAYERS)
    table = jax.device_put(ds.tensor_frame)
    key = jax.random.PRNGKey(0)

    import jax.numpy as jnp

    def fwd(params, table, idx):
        sub = table[idx]
        tokens, _ = enc.apply(params["enc"], sub)
        x, x_cls = model.apply(params["model"], tokens)
        return x_cls.sum()

    idx0 = jnp.arange(FWD_BATCH)
    sub0 = ds.tensor_frame[np.arange(FWD_BATCH)]
    params = {
        "enc": enc.init(key, jax.device_put(sub0)),
        "model": model.init(key, jnp.zeros((FWD_BATCH, 6, FWD_CHANNELS))),
    }
    return jax.jit(fwd), params, table, idx0


def measure_fwd(iters: int = 200, rows: int = ROWS) -> float:
    import jax
    import jax.numpy as jnp

    fwd, params, table, idx0 = build_fwd(rows)
    if os.environ.get("BENCH_BF16"):
        from rmm_tpu.utils.precision import cast_floats

        params = cast_floats(params, jnp.bfloat16)
        table = cast_floats(table, jnp.bfloat16)
    n = table.num_rows

    def run_n(params, table, n_iters):
        def body(i, acc):
            idx = (idx0 + i * FWD_BATCH) % n
            return acc + fwd(params, table, idx)

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    run_n = jax.jit(run_n, static_argnames=("n_iters",))
    jax.block_until_ready(run_n(params, table, 1))
    jax.block_until_ready(run_n(params, table, iters))
    t0 = time.perf_counter()
    jax.block_until_ready(run_n(params, table, 1))
    t1 = time.perf_counter()
    jax.block_until_ready(run_n(params, table, iters))
    t2 = time.perf_counter()
    dt = max((t2 - t1) - (t1 - t0), 1e-9)
    return FWD_BATCH * (iters - 1) / dt


# ---------------------------------------------------------------------------
# encode+train (the north-star metric)
# ---------------------------------------------------------------------------

def build_trainer(rows: int, sampler: str | None = None):
    import tempfile

    from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
    from rmm_tpu.train.trainer import Trainer
    from rmm_tpu.utils.config import Config

    csv = os.path.join(tempfile.gettempdir(), f"bench_aml_{rows}.csv")
    if not os.path.exists(csv):
        write_synthetic_aml_csv(csv, num_rows=rows,
                                num_accounts=max(rows // 16, 64), seed=0)
    # supervised config of record (main.py:161-190, utils.py:40-44)
    cfg = Config(model="tabgnn", data=csv, task="edge_classification",
                 batch_size=int(os.environ.get("BENCH_BATCH", 200)),
                 n_hidden=32, n_gnn_layers=2,
                 num_neighs=(100, 100), steps_per_dispatch=TRAIN_K,
                 sampler_threads=4, epochs=1, testing=True,
                 precision=os.environ.get("BENCH_PRECISION", "f32"),
                 sampler=sampler
                 or os.environ.get("BENCH_SAMPLER", "auto"))
    ds = IBMTransactionsAML(root=csv, khop_neighbors=cfg.num_neighs,
                            channels=cfg.n_hidden)
    return cfg, ds, Trainer(cfg, ds)


def measure_train(rows: int = ROWS, k: int = TRAIN_K, e2e: bool = True,
                  sampler: str | None = None):
    """Returns (device_rows_per_sec, sampler_rows_per_sec, e2e_rows_per_sec,
    perf_dict_or_None) — perf_dict per :func:`_perf_from_cost`."""
    import jax
    import numpy as np

    cfg, ds, tr = build_trainer(rows, sampler=sampler)
    view = ds.edges.split()[0]

    # --- host sampler throughput (kept as its own metric) -----------------
    t0 = time.perf_counter()
    host_batches = []
    for gb in tr._batches(view, "train", epoch=0):
        host_batches.append(gb)
        if len(host_batches) >= k:
            break
    t1 = time.perf_counter()
    sampler_rps = len(host_batches) * cfg.batch_size / (t1 - t0)

    # --- device train-step time (slope method over the scan dispatch) ----
    # time the step the e2e path actually runs: with in-jit device-side
    # sampling when active (two-program: sampler feeds the scan a device-
    # resident stacked batch), host-fed batches otherwise
    use_dev = tr._use_device_sampler()
    if use_dev:
        batches = []
        for sb in tr._seed_batches(view, "train", epoch=0):
            batches.append(sb)
            if len(batches) >= k:
                break
        dgraph = tr._dgraph("train")
    else:
        batches = host_batches
        dgraph = None
    while len(batches) < k:
        batches.append(batches[-1])

    def stack(n):
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs) if xs[0] is not None else None,
            *batches[:n])
        if use_dev:
            stacked, _, _ = tr._sample_group(stacked, dgraph)
            jax.block_until_ready(stacked.edge_gather)
        return stacked

    perf = None
    if k == 1:
        # single-step program (no scan): time N pipelined dispatches,
        # force only the LAST output — device-queue ordering guarantees
        # all N executed. (device_get, not block_until_ready: the tunnel's
        # block can return before work completes.)
        b0 = batches[0]
        if use_dev:
            b0, _, _ = tr._sample_one(b0, dgraph)
            jax.block_until_ready(b0.edge_gather)
        rng = jax.random.PRNGKey(0)

        def dispatch1():
            return tr._train_step(tr.variables, tr.opt_state, b0, rng,
                                  tr.edge_table, tr.node_table)

        jax.device_get(dispatch1()[2])   # compile
        reps = 10
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [dispatch1() for _ in range(reps)]
            jax.device_get(outs[-1][2])
            best = min(best, time.perf_counter() - t0)
        step_time = best / reps
        device_rps = cfg.batch_size / step_time
        try:
            cost = tr._train_step.lower(
                tr.variables, tr.opt_state, b0, rng, tr.edge_table,
                tr.node_table).compile().cost_analysis()
            perf = _perf_from_cost(cost, step_time)
        except Exception:
            pass
    else:
        def dispatch(stacked, n):
            rngs = jax.random.split(jax.random.PRNGKey(0), n)
            real = np.ones(n, bool)
            out = tr._scan_step(tr.variables, tr.opt_state, stacked, rngs,
                                real, tr.edge_table, tr.node_table)
            jax.device_get(out[2])
            return out

        s1, sk = stack(1), stack(k)
        dispatch(s1, 1)          # compile
        dispatch(sk, k)          # compile
        t1 = min(time_of(lambda: dispatch(s1, 1)) for _ in range(3))
        tk = min(time_of(lambda: dispatch(sk, k)) for _ in range(3))
        dt = max(tk - t1, 1e-9)
        step_time = dt / (k - 1)
        device_rps = cfg.batch_size / step_time
        try:
            rngs = jax.random.split(jax.random.PRNGKey(0), k)
            real = np.ones(k, bool)
            cost = tr._scan_step.lower(
                tr.variables, tr.opt_state, sk, rngs, real, tr.edge_table,
                tr.node_table).compile().cost_analysis()
            if cost and "flops" in cost:
                cost = dict(cost)
                cost["flops"] = float(cost["flops"]) / k
                if "bytes accessed" in cost:
                    cost["bytes accessed"] = (
                        float(cost["bytes accessed"]) / k)
                perf = _perf_from_cost(cost, step_time)
        except Exception:
            pass

    # --- end-to-end epoch (sampler + prefetch + dispatch overlapped) ------
    e2e_rps = None
    if e2e:
        rec = tr.train_epoch(view, epoch=1)
        n_rows = view.tensor_frame.num_rows
        e2e_rps = n_rows / rec["sec"]
    return device_rps, sampler_rps, e2e_rps, perf


# ---------------------------------------------------------------------------
# SSL-config train step (C=128, 3 layers, bf16) — the MXU-bound shape
# ---------------------------------------------------------------------------

def measure_ssl_train(rows: int = ROWS, channels: int = 128,
                      trace_dir: str | None = None):
    """Joint mcm-lp pretrain step at the SSL config of record
    (``fused.py:626-630``: batch 200, channels 128, 3 layers, 64 negative
    samples) under --precision bf16. Returns (rows_per_sec, perf_dict) — the
    shape where the Pallas column-attention kernel runs (head_dim=16) and
    the MXU actually gets fed, unlike the 74k-param supervised config.

    ``channels`` lets the caller walk DOWN from the config of record: the
    axon terminal's remote ``tpu_compile_helper`` is reproducibly killed
    (resource limit on the FAR end of the tunnel, not this host) by the
    C=128 program even though it is constant-free 1.7 MB StableHLO —
    C=64 is chip-proven (outputs/quality/ssl_tpu). Recording SSL perf at
    a smaller annotated width beats recording null."""
    import tempfile

    import jax
    import numpy as np

    from rmm_tpu.datasets import IBMTransactionsAML, write_synthetic_aml_csv
    from rmm_tpu.datasets.base import PretrainType
    from rmm_tpu.train.pretrain import PretrainTrainer
    from rmm_tpu.utils.config import Config

    csv = os.path.join(tempfile.gettempdir(), f"bench_aml_{rows}.csv")
    if not os.path.exists(csv):
        write_synthetic_aml_csv(csv, num_rows=rows,
                                num_accounts=max(rows // 16, 64), seed=0)
    cfg = Config(model="tabgnnfused", data=csv, batch_size=200,
                 n_hidden=channels, n_gnn_layers=3, dropout=0.5,
                 num_neighs=(100, 100), num_neg_samples=64, lr=2e-4,
                 epochs=1, testing=True, precision="bf16",
                 scan_layers=True)
    ds = IBMTransactionsAML(
        root=csv, pretrain={PretrainType.MASK, PretrainType.LINK_PRED},
        khop_neighbors=cfg.num_neighs, channels=cfg.n_hidden)
    tr = PretrainTrainer(cfg, ds, mode="mcm-lp")
    view = ds.edges.split()[0]
    gb = next(iter(tr._batches(view, "train", epoch=0)))
    rng = jax.random.PRNGKey(0)

    def dispatch1():
        return tr._train_step(tr.params, tr.batch_stats, tr.opt_state,
                              tr.moco_state, gb, rng, tr.edge_table)

    jax.device_get(dispatch1()[4])   # compile + run
    reps = 10
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [dispatch1() for _ in range(reps)]
        jax.device_get(outs[-1][4])
        best = min(best, time.perf_counter() - t0)
    step_time = best / reps
    perf = None
    try:
        cost = tr._train_step.lower(
            tr.params, tr.batch_stats, tr.opt_state, tr.moco_state, gb,
            rng, tr.edge_table).compile().cost_analysis()
        perf = _perf_from_cost(cost, step_time)
    except Exception:
        pass
    if trace_dir:  # one traced dispatch for op-level attribution
        os.makedirs(trace_dir, exist_ok=True)
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            jax.device_get(dispatch1()[4])
    return cfg.batch_size / step_time, perf


def _probe_device(timeout_s: int = 180) -> bool:
    """Check the accelerator is actually USABLE from a SUBPROCESS —
    through the TPU tunnel ``jax.devices()`` HANGS (not errors) when the
    far end is down, which would wedge the whole benchmark run. Listing
    devices is not enough: the control plane can answer while the
    compile/execute channel is wedged (observed round 4 — devices() fine,
    every compile RPC blocked forever with zero socket traffic), so the
    probe compiles and RUNS a tiny jitted program and forces the result
    with device_get."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(8))))"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


FELL_BACK_TO_CPU = False


def main():
    global FELL_BACK_TO_CPU
    if "--cpu-baseline" in sys.argv:
        # clean process: CPU platform, reduced iters, no e2e epoch
        dev, _, _, _ = measure_train(rows=ROWS, k=5, e2e=False)
        print(json.dumps({"train_rows_per_sec": dev}))
        return
    if (os.environ.get("JAX_PLATFORMS", "") not in ("cpu", "")
            and not _probe_device()):
        # dead tunnel: report honest CPU numbers instead of hanging
        print("accelerator unreachable (tunnel down?) — falling back to "
              "CPU; numbers below are NOT TPU numbers", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path[:] = [p for p in sys.path if "axon_site" not in p]
        for v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
                  "AXON_LOOPBACK_RELAY"):
            os.environ.pop(v, None)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        FELL_BACK_TO_CPU = True
        # tiny honest CPU run: the full benchmark at TPU shapes would take
        # hours on one core and time the driver out
        dev, sampler_rps, _, _ = measure_train(rows=1 << 14, k=3, e2e=False)
        print(json.dumps({
            "metric": "supervised encode+train rows/sec/chip "
                      "(tabgnn, config of record)",
            "value": round(dev, 1), "unit": "rows/s", "vs_baseline": None,
            "sampler_rows_per_sec": round(sampler_rps, 1),
            "platform": "cpu-FALLBACK-tunnel-down",
        }))
        return

    device_rps, sampler_rps, e2e_rps, perf = measure_train()
    print(f"train-step rows/sec: {device_rps:,.0f}  sampler: "
          f"{sampler_rps:,.0f}  e2e: {e2e_rps:,.0f}  perf: {perf}",
          file=sys.stderr)
    fwd_rps = measure_fwd()
    print(f"encode+forward rows/sec: {fwd_rps:,.0f}", file=sys.stderr)

    # --- device-sampler A/B (the --sampler auto flip decision) -----------
    # The default run above resolves `auto` (host path today); measure the
    # in-jit HBM-CSR sampler end-to-end as well so a single driver
    # invocation records the A/B that decides the auto default
    # (graph/device_sampler.py:113-123). Skipped when BENCH_SAMPLER pins a
    # path explicitly (the watcher's dedicated A/B runs).
    dev_train_rps = dev_e2e_rps = None
    if not os.environ.get("BENCH_SAMPLER"):
        try:
            dev_train_rps, _, dev_e2e_rps, _ = measure_train(
                sampler="device")
            print(f"device-sampler path: train-step rows/sec "
                  f"{dev_train_rps:,.0f}  e2e {dev_e2e_rps:,.0f}",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"device-sampler A/B failed: {e}", file=sys.stderr)

    # SSL step: walk DOWN from the config-of-record width. The axon
    # terminal's remote tpu_compile_helper is reproducibly killed by the
    # C=128 program (far-end resource limit — see ssl_compile_bisect /
    # RESULTS.md); C=64 runs on-chip (outputs/quality/ssl_tpu). Each
    # width gets one Pallas attempt and one XLA-attention retry (Mosaic
    # is a second independent failure mode at head_dim>=16). The JSON
    # records the width that actually measured so a downgraded number is
    # never mistaken for the config of record.
    ssl_rps = ssl_perf = ssl_channels = None
    ssl_widths = [int(w) for w in os.environ.get(
        "BENCH_SSL_CHANNELS", "128,96,64").split(",")]
    for width in ssl_widths:
        # below C=128 head_dim < 16 already routes around the kernel
        # (transformer.py gate) — a no-pallas retry would recompile the
        # IDENTICAL program, wasting a remote-compile attempt
        retries = (False, True) if width // 8 >= 16 else (False,)
        for disable_pallas in retries:
            try:
                if disable_pallas:
                    os.environ["RMM_DISABLE_PALLAS"] = "1"
                ssl_rps, ssl_perf = measure_ssl_train(channels=width)
                ssl_channels = width
                print(f"ssl (C={width}, bf16, scan"
                      f"{', NO-pallas' if disable_pallas else ''}) train "
                      f"rows/sec: {ssl_rps:,.0f} perf: {ssl_perf}",
                      file=sys.stderr)
            except Exception as e:  # pragma: no cover
                print(f"ssl bench failed (C={width}, "
                      f"pallas={not disable_pallas}): {e}", file=sys.stderr)
            finally:
                os.environ.pop("RMM_DISABLE_PALLAS", None)
            if ssl_rps is not None:
                break
        if ssl_rps is not None:
            break

    cpu_rps = None
    try:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            env=env, capture_output=True, text=True, timeout=2400)
        cpu_rps = json.loads(res.stdout.strip().splitlines()[-1])[
            "train_rows_per_sec"]
        print(f"cpu-baseline train rows/sec: {cpu_rps:,.0f}",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"cpu baseline failed: {e}", file=sys.stderr)

    # None (not 1.0) when the CPU baseline failed/timed out — a fake
    # "1.0x" would misreport the speedup as parity
    vs = (device_rps / cpu_rps) if cpu_rps else None
    print(json.dumps({
        "metric": "supervised encode+train rows/sec/chip (tabgnn, config "
                  "of record)",
        "value": round(device_rps, 1),
        "unit": "rows/s",
        "vs_baseline": (round(vs, 2) if vs is not None else None),
        "sampler_rows_per_sec": round(sampler_rps, 1),
        "e2e_rows_per_sec": round(e2e_rps, 1),
        "fwd_rows_per_sec": round(fwd_rps, 1),
        "mfu": (round(perf["mfu"], 4) if perf else None),
        "sol_frac": (round(perf["sol_frac"], 4)
                     if perf and perf.get("sol_frac") else None),
        "ssl_train_rows_per_sec": (round(ssl_rps, 1)
                                   if ssl_rps is not None else None),
        "ssl_channels": ssl_channels,
        "ssl_mfu": (round(ssl_perf["mfu"], 4) if ssl_perf else None),
        "ssl_sol_frac": (round(ssl_perf["sol_frac"], 4)
                         if ssl_perf and ssl_perf.get("sol_frac") else None),
        "device_sampler_train_rows_per_sec": (
            round(dev_train_rps, 1) if dev_train_rps is not None else None),
        "device_sampler_e2e_rows_per_sec": (
            round(dev_e2e_rps, 1) if dev_e2e_rps is not None else None),
        "platform": ("cpu-FALLBACK-tunnel-down" if FELL_BACK_TO_CPU else None),
    }))


if __name__ == "__main__":
    main()
