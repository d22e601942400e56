"""Benchmark: device decode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the on-chip decode pipeline (wavefront defilter + RGBA convolve)
with device-resident data — host↔device transfer is excluded because the
bench link to the chip is a low-bandwidth tunnel that no production
deployment would have in the data path.  The BASELINE.json north-star target
is ≥2 GB/s/chip; ``vs_baseline`` is value / 2.0.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from swift_png_tpu.parallel.batch import decode_stage

    B, H, W = 16, 512, 512  # rgba8: 16 MiB of filtered scanline data
    pitch = W * 4
    rng = np.random.default_rng(0)
    filtered = rng.integers(0, 256, (B, H, 1 + pitch), dtype=np.uint8)
    filtered[:, :, 0] = rng.integers(0, 5, (B, H), dtype=np.uint8)
    batch = jnp.asarray(filtered)

    def step(x):
        return decode_stage(x, delay=4, depth=8, channels=4, width=W, bits=8)

    # warmup/compile
    step(batch).block_until_ready()

    trials = 5
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        step(batch).block_until_ready()
        best = min(best, time.perf_counter() - t0)

    nbytes = B * H * (1 + pitch)
    gbps = nbytes / best / 1e9
    print(json.dumps({
        "metric": "defilter+convolve rgba8 512x512 batch16",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 2.0, 4),
    }))


if __name__ == "__main__":
    main()
