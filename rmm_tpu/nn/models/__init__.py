from .ft_transformer import FTTransformer  # noqa: F401
from .tabgnn import TABGNN, PNALayer  # noqa: F401
from .fused import (TABGNNFused, FTTransformerPNAFusedLayer,  # noqa: F401
                    stack_fused_layers, unstack_fused_layers)
from .interleaved import (  # noqa: F401
    TABGNNInterleaved,
    FTTransformerPNAInterleavedLayer,
)
from .rowcol import RCTransformer  # noqa: F401
