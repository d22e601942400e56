"""Split decode_stage cost: defilter_batch vs convolve, plus skew probes.

Usage: python tools/profile_defilter.py [B] [trials]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from swift_png_tpu.ops.unfilter import defilter_batch
    from swift_png_tpu.ops import convolve

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 512, 512
    pitch1 = 1 + W * 4

    from bench import _filtered, _image

    filt = jnp.asarray(np.stack(
        [np.frombuffer(_filtered(_image(i, H, W)).tobytes(), np.uint8)
         .reshape(H, pitch1) for i in range(B)]))
    nbytes = B * H * pitch1
    sc = lambda x: float(np.asarray(x.reshape(-1)[:1])[0])

    def tmin(fn, sync, k=trials):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    # 1. defilter alone
    f1 = jax.jit(lambda x: defilter_batch(x, 4))
    rows = f1(filt)
    t = tmin(lambda: f1(filt), sc)
    print(f"defilter_batch  {t*1e3:8.1f} ms  {nbytes/t/1e9:6.3f} GB/s",
          flush=True)

    # 2. convolve alone
    f2 = jax.jit(lambda r: jax.vmap(lambda x: convolve.unpack_rgba(
        x, depth=8, channels=4, width=W, bits=8))(r))
    px = f2(rows)
    t = tmin(lambda: f2(rows), sc)
    print(f"convolve        {t*1e3:8.1f} ms  {nbytes/t/1e9:6.3f} GB/s",
          flush=True)

    # 3. skew gather alone (the defilter's input relayout)
    delay = 4
    pitch = pitch1 - 1
    G = pitch // delay
    Dn = H + G - 1
    K = 8
    Dn_pad = -(-Dn // K) * K

    @jax.jit
    def skew_gather(filtered):
        def one(f):
            data = f[:, 1:].reshape(H, G, delay)
            y_idx = jnp.arange(H)
            d_idx = jnp.arange(Dn_pad)
            g = d_idx[:, None] - y_idx[None, :]
            valid = (g >= 0) & (g < G)
            S = jnp.take_along_axis(
                data.transpose(1, 0, 2)[None],
                jnp.clip(g, 0, G - 1)[:, None, :, None], axis=1)[:, 0]
            return jnp.where(valid[:, :, None], S, 0)
        return jax.vmap(one)(filtered)

    S1 = skew_gather(filt)
    t = tmin(lambda: skew_gather(filt), sc)
    print(f"skew[gather]    {t*1e3:8.1f} ms  {nbytes/t/1e9:6.3f} GB/s",
          flush=True)

    # 4. skew via pad+reshape (rows of length W2-1 shift row y right by y)
    @jax.jit
    def skew_reshape(filtered):
        def one(f):
            data = f[:, 1:].reshape(H, G, delay)
            W2 = Dn_pad + 1
            pad = jnp.zeros((H, W2 - G, delay), jnp.uint8)
            flat = jnp.concatenate([data, pad], axis=1).reshape(-1, delay)
            sk = flat[: H * Dn_pad].reshape(H, Dn_pad, delay)
            return jnp.transpose(sk, (1, 0, 2))
        return jax.vmap(one)(filtered)

    S2 = skew_reshape(filt)
    assert np.array_equal(np.asarray(S1), np.asarray(S2)), "skew mismatch"
    t = tmin(lambda: skew_reshape(filt), sc)
    print(f"skew[reshape]   {t*1e3:8.1f} ms  {nbytes/t/1e9:6.3f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
