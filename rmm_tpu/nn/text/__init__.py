from .embedder import (  # noqa: F401
    HashingTextEmbedder,
    TextToEmbedding,
    get_text_embedder,
)
from .finetune import HashingTokenizer, TextToEmbeddingFinetune  # noqa: F401
from .lora import LoRADense  # noqa: F401
from .pretrained import (  # noqa: F401
    HFTokenizerWrapper,
    PretrainedTextEncoder,
    load_cached_lm,
    pretrained_text_model,
)
