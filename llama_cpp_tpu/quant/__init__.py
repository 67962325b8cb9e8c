from .dequant import dequantize, dequantize_tensor  # noqa: F401
from .quantize import quantize  # noqa: F401
