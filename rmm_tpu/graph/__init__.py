"""Static-shape graph engine: CSR k-hop sampling, negative sampling, ports."""
from .sampler import NeighborSampler, SampledSubgraph  # noqa: F401
from .store import GraphStore, add_ego_ids  # noqa: F401
from .negative import generate_negative_samples  # noqa: F401
from .build import load_library  # noqa: F401
