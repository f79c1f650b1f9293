"""Multi-host initialization.

The reference has no multi-node support (SURVEY §2.3). For TPU pods the
SPMD program is unchanged — each host runs the same code over its local
chips; ``jax.distributed`` wires the hosts together (coordination over DCN,
collectives over ICI). The launchers export the standard env vars
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
"""
from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when pod env vars are present. Returns
    True when running multi-process."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if not addr or not nproc or int(nproc) <= 1:
        return False
    pid = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=int(nproc), process_id=pid)
    logger.info(
        f"jax.distributed: process {pid}/{nproc}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global "
        "devices")
    return True


def global_batch_slice(total: int) -> slice:
    """This host's contiguous shard of a global per-step workload."""
    n = jax.process_count()
    i = jax.process_index()
    per = total // n
    return slice(i * per, (i + 1) * per)


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) single-host."""
    try:
        return jax.process_index(), jax.process_count()
    except RuntimeError:   # backend not initialized yet
        return 0, 1


def is_primary() -> bool:
    """True on the host that owns logging/checkpointing."""
    return process_info()[0] == 0


def shard_stream(enumerated, process_index: int, process_count: int):
    """Round-robin shard an enumerated batch stream across hosts.

    Keeps the GLOBAL batch index attached to each item so per-batch sampler
    seeds stay a function of (seed, epoch, global index) — the data a batch
    sees never depends on how many hosts consumed the stream."""
    if process_count <= 1:
        yield from enumerated
        return
    for item in enumerated:
        if item[0] % process_count == process_index:
            yield item
