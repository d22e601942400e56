"""Indexed (checkpoint-parallel) batch decoding.

Writes PNGs with the `spIx` checkpoint chunk — still 100 % standard files —
then decodes the whole batch through the lockstep device pipeline:
checkpoint-parallel token decode, back-reference expansion, wavefront
defilter, and RGBA convolve, all on the accelerator.

Run: ``python examples/indexed_decode.py``
"""

import numpy as np

from swift_png_tpu import png
from swift_png_tpu.parallel.batch import decode_indexed
from swift_png_tpu.png.format import Format, Layout


def make_image(seed: int, H: int = 64, W: int = 64) -> png.Image:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    px = np.empty((H, W, 4), np.uint8)
    px[..., 0] = (x * 4 + seed * 16) % 256
    px[..., 1] = (y * 4) % 256
    px[..., 2] = rng.integers(0, 256, (H, W))
    px[..., 3] = 255
    return png.Image.pack(px, Layout(Format("rgba8", ()), False))


def main() -> None:
    images = [make_image(i) for i in range(4)]
    files = [im.compress_bytes(level=6, index=True) for im in images]
    print(f"encoded {len(files)} indexed PNGs "
          f"({sum(map(len, files))} bytes total)")

    # any standard decoder still works (the index chunk is ancillary):
    check = png.Image.decompress_bytes(files[0])
    assert np.array_equal(check.unpack_rgba8(), images[0].unpack_rgba8())

    # the batched device fast path:
    pixels = decode_indexed(files)
    assert pixels is not None, "fast path refused (missing index?)"
    got = np.asarray(pixels)
    for i, im in enumerate(images):
        assert np.array_equal(got[i], im.unpack_rgba8()), i
    print(f"decoded batch on {got.shape=} — bit-exact")


if __name__ == "__main__":
    main()
