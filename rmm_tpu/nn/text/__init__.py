from .embedder import (  # noqa: F401
    HashingTextEmbedder,
    TextToEmbedding,
    get_text_embedder,
)
from .finetune import HashingTokenizer, TextToEmbeddingFinetune  # noqa: F401
from .lora import LoRADense  # noqa: F401
