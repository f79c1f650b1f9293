from .conv import (  # noqa: F401
    EdgeUpdateMLP,
    GINEConv,
    GINEConvHetero,
    PNAConv,
    PNAConvHetero,
    TGINEConv,
)
from .models import CPNA, CPNATAB, GINe, PNA, PNAS  # noqa: F401
