"""PNG module: container framing, chunk models, image decode/encode.

Product counterpart of the reference's ``PNG`` library (``Package.swift:9``).
"""

from . import chunk, errors, format, metadata, parsing  # noqa: F401
from .chunk import SIGNATURE, ByteDestination, ByteSource  # noqa: F401
from .context import Context  # noqa: F401
from .decoder import ADAM7, Decoder, adam7_subimage, defilter  # noqa: F401
from .encoder import Encoder, filter_select  # noqa: F401
from .errors import (  # noqa: F401
    DecodingError,
    FormattingError,
    LexingError,
    ParsingError,
    PNGError,
)
from .format import (  # noqa: F401
    COMMON,
    IOS,
    Format,
    Layout,
    Pixel,
    recognize,
    recognize_pixel,
)
from .image import Image  # noqa: F401
from .metadata import Metadata  # noqa: F401
from .system import FileDestination, FileSource  # noqa: F401
