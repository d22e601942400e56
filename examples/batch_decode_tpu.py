"""Batched device decode over a mesh (the TPU-native path): bucket a mixed
corpus, shard image-data-parallel, decode with the fused device engine."""

import sys

import jax
from jax.sharding import Mesh
import numpy as np

from swift_png_tpu.parallel.corpus import CorpusDecoder


def main(paths: list[str]) -> None:
    datas = [open(p, "rb").read() for p in paths]
    devices = np.array(jax.devices())
    mesh = Mesh(devices.reshape(len(devices)), ("images",))
    results = CorpusDecoder(mesh=mesh, batch_size=8).decode(datas)
    for p, pixels in zip(paths, results):
        print(p, pixels.shape, pixels.dtype)


if __name__ == "__main__":
    main(sys.argv[1:])
