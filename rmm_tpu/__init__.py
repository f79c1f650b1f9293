"""rmm_tpu — TPU-native framework for relational multimodal data.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``Atahanak/models-for-relational-multimodal-data``: tabular column frames,
graph neighbor sampling, column-transformer + GNN hybrid models, supervised
and self-supervised (masked-cell + link-prediction) training, all designed
for TPU hardware — static shapes, fully jitted train steps, mesh data
parallelism over ICI.
"""

__version__ = "0.1.0"

from . import frame  # noqa: F401


def __getattr__(name):
    """Lazy subpackage access (keeps `import rmm_tpu` light — the nn/train
    trees pull in jax/flax)."""
    import importlib

    if name in ("datasets", "graph", "nn", "ops", "parallel", "train",
                "utils"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
