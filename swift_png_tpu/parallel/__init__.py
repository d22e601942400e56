"""Multi-chip scale-out: mesh-sharded batch codec.

The reference is single-threaded (SURVEY.md §2.4); the parallel axes here are
the ones the TPU build adds:

* **images** — data parallelism: independent images sharded across devices;
* **rows**   — intra-image parallelism for the row-parallel stages
  (filter-select), with a one-row halo exchanged over ``ppermute``;
* checksum combination via the affine/GF(2)-linear combine operators in
  :mod:`swift_png_tpu.lz77.checksums` replaces sequential
  ``StreamIntegral.update``.
"""

from .batch import BatchCodec, decode_stage, encode_stage, filter_select_sharded

__all__ = ["BatchCodec", "decode_stage", "encode_stage",
           "filter_select_sharded"]
