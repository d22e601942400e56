"""LZ77 module: from-scratch DEFLATE/zlib/gzip engine (host tier).

Product counterpart of the reference's standalone ``LZ77`` library
(``Package.swift:8``).
"""

from . import checksums, constants, errors, huffman  # noqa: F401
from .errors import (  # noqa: F401
    DecompressionError,
    GzipStreamHeaderError,
    LZ77Error,
    StreamHeaderError,
)
from .deflate import Deflator, RawDeflator  # noqa: F401
from .inflate import GzipInflator, Inflator  # noqa: F401
from . import gzip  # noqa: F401
