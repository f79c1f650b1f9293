"""Device-side ops: masked segment reductions and Pallas kernels."""
from .segment import (  # noqa: F401
    degree,
    pna_aggregate,
    pna_scalers_from_histogram,
    scatter_mean_update,
    segment_count,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_std,
    segment_sum,
)
