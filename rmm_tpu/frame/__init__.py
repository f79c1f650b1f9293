"""ColumnFrame core: stypes, stats, TensorFrame, Dataset, DataLoader."""
from .stype import (  # noqa: F401
    Stype,
    STYPE_ORDER,
    numerical,
    categorical,
    multicategorical,
    timestamp,
    text_embedded,
    text_tokenized,
    embedding,
    relation,
    mask,
)
from .stats import StatType, compute_col_stats  # noqa: F401
from .tensor_frame import TensorFrame  # noqa: F401
from .dataset import Dataset, DatasetView, generate_random_split  # noqa: F401
from .loader import DataLoader  # noqa: F401
