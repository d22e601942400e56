"""swift_png_tpu — a TPU-native PNG/DEFLATE codec framework.

A from-scratch re-design of the capabilities of tayloraswift/swift-png
(reference: /root/reference) for TPU hardware:

* host layer (Python + C++): container framing, chunk parsing, metadata,
  streaming drivers — mirrors the reference's ``Lexing``/``Parsing``/
  ``Decoding``/``Encoding`` layers behaviorally.
* device layer (JAX/XLA/Pallas): batched inflate back-reference expansion,
  scanline unfilter, convolve/deconvolve color kernels, filter selection,
  and combinable Adler-32/CRC-32 checksums, sharded over a
  ``jax.sharding.Mesh`` for multi-chip scale-out.

Public API parity map (reference file:line cited per symbol in docstrings):

* ``png.Image``            ↔ ``PNG.Image``        (Sources/PNG/PNG.Image.swift:17)
* ``png.Context``          ↔ ``PNG.Context``      (Sources/PNG/Decoding/PNG.Context.swift:9)
* ``lz77.Inflator``        ↔ ``LZ77.Inflator``    (Sources/LZ77/Inflator/LZ77.Inflator.swift:8)
* ``lz77.Deflator``        ↔ ``LZ77.Deflator``    (Sources/LZ77/Deflator/LZ77.Deflator.swift:8)
* ``lz77.gzip.extract/archive`` ↔ ``Gzip.extract/archive`` (Sources/LZ77/Gzip/Gzip.swift:6,34)
"""

__version__ = "0.1.0"

from . import lz77, png  # noqa: F401
