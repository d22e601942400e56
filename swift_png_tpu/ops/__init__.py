"""Device (TPU) kernels: the hot stages of the PNG/DEFLATE pipeline.

Each module here is a JAX/XLA (and, where profitable, Pallas) reformulation
of one of the reference's hot loops (SURVEY.md §3 call stacks):

* :mod:`.unfilter` — scanline defilter (``PNG.Decoder.defilter``,
  ``Sources/PNG/Decoding/PNG.Decoder.swift:152-196``) as a wavefront scan;
* :mod:`.filter`   — encode-side filter select (``PNG.Encoder.filter``,
  ``Sources/PNG/Encoding/PNG.Encoder.swift:132-234``), all candidates in
  parallel;
* :mod:`.convolve` — pixel pack/unpack (``Sources/PNG/PNG.swift:149-1284``);
* :mod:`.inflate`  — parallel DEFLATE token decode + LZ77 expansion;
* :mod:`.deflate`  — parallel match search, token emit, and bit packing;
* :mod:`.checksum` — Adler-32 / CRC-32 as combinable device reductions.
"""

from . import unfilter  # noqa: F401
