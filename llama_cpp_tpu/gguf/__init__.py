from .constants import GGMLType, GGUFValueType, Keys, TokenType, FileType  # noqa: F401
from .reader import GGUFFile, read_gguf  # noqa: F401
from .writer import GGUFWriter  # noqa: F401
