"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Multi-chip sharding tests run against ``--xla_force_host_platform_device_count=8``
per the TPU-emulation strategy (SURVEY.md §4).
"""
import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel);
# tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU-tunnel plugin (loaded from a .pth hook at interpreter
# startup) imports jax BEFORE conftest runs, capturing JAX_PLATFORMS=axon
# and routing all XLA compilation — including CPU — through a remote relay
# (~10× slower eager dispatch). Env vars are too late; update the live jax
# config before any backend initializes.
sys.path = [p for p in sys.path if "axon_site" not in p]
for var in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
            "AXON_LOOPBACK_RELAY"):
    os.environ.pop(var, None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has ONE cpu core, so XLA compiles
# dominate suite wall time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/rmm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def aml_df():
    """Synthetic IBM-AML-shaped transactions table (dummy.csv stand-in,
    mirroring the reference's downsampled fixture usage, test/ibm.py:6)."""
    rng = np.random.RandomState(0)
    n = 400
    n_accounts = 60
    df = pd.DataFrame({
        "Timestamp": rng.randint(0, 6 * 86400, size=n).astype(np.int64),
        "From Bank": rng.randint(0, 5, size=n),
        "From ID": rng.randint(0, n_accounts, size=n).astype(np.float64),
        "To Bank": rng.randint(0, 5, size=n),
        "To ID": rng.randint(0, n_accounts, size=n).astype(np.float64),
        "Amount Received": rng.lognormal(3, 1, size=n),
        "Receiving Currency": rng.choice(["USD", "EUR", "BTC"], size=n),
        "Amount Paid": rng.lognormal(3, 1, size=n),
        "Payment Currency": rng.choice(["USD", "EUR", "BTC"], size=n),
        "Payment Format": rng.choice(["Wire", "ACH", "Cheque", "Card"], size=n),
        "Is Laundering": (rng.rand(n) < 0.15).astype(int).astype(str),
    })
    return df


@pytest.fixture(scope="session")
def aml_csv(tmp_path_factory, aml_df):
    path = tmp_path_factory.mktemp("data") / "aml_dummy.csv"
    aml_df.to_csv(path, index=False)
    return str(path)
