from . import layers
from .dit import DiT, DiTBlock, MicroDiT_Tiny_2, MicroDiT_XL_2

__all__ = ["layers", "DiT", "DiTBlock", "MicroDiT_Tiny_2", "MicroDiT_XL_2"]
