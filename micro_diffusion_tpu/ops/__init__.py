from .attention import dot_product_attention
from .masking import make_token_mask, gather_tokens, scatter_tokens

__all__ = [
    "dot_product_attention",
    "make_token_mask",
    "gather_tokens",
    "scatter_tokens",
]
