"""Benchmark: full on-chip decode — fused inflate + defilter + convolve.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the BASELINE.json headline (inflate+unfilter throughput per chip):
rgba8 512×512 PNG streams, encoded by our native deflate with one dynamic
block per image (the TPU-friendly shape our encoder emits — fewer
sequential block rounds on device), decoded by the single-call fused device
engine and the batched wavefront defilter + convolve.  Compressed buffers
are pre-staged; the timed region is pure device work (the bench link to the
chip is a low-bandwidth tunnel no deployment would have in the data path).
``vs_baseline`` is value / 2.0 GB/s (the north-star target).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _filtered_image(seed: int, H: int, W: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    base = (
        128 + 60 * np.sin(x / 37.0 + seed) + 50 * np.cos(y / 23.0)
    )[..., None] + np.array([0, 30, -20, 0])[None, None, :]
    noise = rng.normal(0, 12, (H, W, 4))
    pixels = np.clip(base + noise, 0, 255).astype(np.uint8)
    pixels[..., 3] = 255
    from swift_png_tpu import native

    if native.available():
        return native.filter_select(pixels.reshape(H, W * 4), 4)
    from swift_png_tpu.png.encoder import filter_select

    rows = pixels.reshape(H, W * 4)
    out = np.empty((H, 1 + W * 4), np.uint8)
    prev = np.zeros(W * 4, np.uint8)
    for r in range(H):
        out[r] = filter_select(rows[r], prev, 4)
        prev = rows[r]
    return out


def main() -> None:
    import jax.numpy as jnp

    from swift_png_tpu import native
    from swift_png_tpu.ops.inflate_fused import inflate_fused
    from swift_png_tpu.parallel.batch import decode_stage

    B, H, W = 4, 512, 512
    pitch1 = 1 + W * 4
    out_size = H * pitch1
    win = 1 << 20
    t_max = 1 << 20

    if native.available():
        compress = lambda b: native.deflate(b, 6, "zlib",
                                            block_terms=1 << 22)[2:]
    else:
        import zlib

        compress = lambda b: zlib.compress(b, 6)[2:-4]

    streams = []
    for i in range(B):
        body = compress(_filtered_image(i, H, W).tobytes())
        bucket = 1 << max(12, (len(body) + win + 8 - 1).bit_length())
        D = np.zeros(bucket, np.uint8)
        D[:len(body)] = np.frombuffer(body, np.uint8)
        streams.append(jnp.asarray(D))

    def decode_all():
        filtered = []
        statuses = []
        for D in streams:
            out, status, _, _ = inflate_fused(
                D, out_size=out_size, win_words=win, t_max=t_max,
                max_blocks=1 << 14, tok_cap=out_size + 1)
            filtered.append(out[:out_size].reshape(H, pitch1))
            statuses.append(status)
        batch = jnp.stack(filtered)
        pixels = decode_stage(batch, delay=4, depth=8, channels=4, width=W,
                              bits=8)
        return pixels, jnp.stack(statuses)

    pixels, statuses = decode_all()
    pixels.block_until_ready()
    assert int(np.asarray(statuses).max()) == 0, "decode failed"

    trials = 3
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        pixels, statuses = decode_all()
        pixels.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    nbytes = B * out_size
    gbps = nbytes / best / 1e9
    print(json.dumps({
        "metric": "decode rgba8 512x512 batch4 (fused inflate+defilter+convolve)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 2.0, 4),
    }))


if __name__ == "__main__":
    main()
