"""Mesh data parallelism + host→device prefetch."""
from .mesh import data_sharded, make_mesh, replicated  # noqa: F401
from .data_parallel import (  # noqa: F401
    make_dp_device_pretrain_step,
    make_dp_device_train_step,
    make_dp_eval_step,
    make_dp_pretrain_step,
    make_dp_train_step,
    shard_batch,
    stack_batches,
)
from .tensor_parallel import (  # noqa: F401
    distributed_gather_rows,
    make_dp_tp_device_train_step,
    make_dp_tp_eval_step,
    make_dp_tp_train_step,
    shard_table,
)
from .graph_parallel import make_dp_gp_train_step  # noqa: F401
from .prefetch import Prefetcher  # noqa: F401
from .distributed import maybe_init_distributed, global_batch_slice  # noqa: F401
