"""Multimodal (vision) support — the mtmd analog (reference tools/mtmd/):
CLIP-family vision encoders producing embedding chunks spliced into decode
batches, mmproj GGUF files, and image preprocessing."""

from .clip import VisionConfig, clip_forward  # noqa: F401
from .mmproj import convert_hf_vision_to_mmproj, load_mmproj  # noqa: F401
from .mtmd import MtmdModel  # noqa: F401
