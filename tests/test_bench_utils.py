"""Unit coverage for bench.py's pure helpers (the measurement harness
itself runs on the driver/watcher; these pin the roofline arithmetic)."""
import bench


def test_perf_from_cost_roofline_fields():
    # 1e9 flops, 1e8 bytes, 10 ms step on v5e peaks (197 TF, 819 GB/s):
    # bandwidth term dominates the speed-of-light time
    p = bench._perf_from_cost({"flops": 1e9, "bytes accessed": 1e8}, 0.01)
    assert abs(p["mfu"] - 1e9 / 0.01 / bench.PEAK_FLOPS) < 1e-12
    sol = max(1e9 / bench.PEAK_FLOPS, 1e8 / bench.HBM_BW)
    assert abs(p["sol_frac"] - sol / 0.01) < 1e-12
    assert p["bytes_per_step"] == 1e8


def test_perf_from_cost_degenerate_inputs():
    assert bench._perf_from_cost(None, 0.01) is None
    assert bench._perf_from_cost({}, 0.01) is None
    p = bench._perf_from_cost({"flops": 0.0}, 0.01)
    assert p["mfu"] == 0.0 and p["sol_frac"] is None


def test_fwd_batch_clamped_to_rows():
    """BENCH_ROWS smaller than the serving batch must clamp FWD_BATCH
    (else build_fwd indexes OOB) — checked in a subprocess so the env var
    is read at module import like a real bench run."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, BENCH_ROWS="1024", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", "import bench; print(bench.FWD_BATCH)"],
        env=env, capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-500:]
    assert int(out.stdout.strip().splitlines()[-1]) == 1024
