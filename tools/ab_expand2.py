"""A/B: legacy scatter-compaction _expand vs the scan-fill rewrite.

Times both on the bench content's real ptr/litv at B=32, with both the
round-3 pow2 caps and tight (8K-rounded) caps.

Usage: python tools/ab_expand2.py [B] [trials]
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

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, _expand, _expand_legacy)
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1

    from bench import _filtered, _image

    compress = lambda b: native.deflate(b, 6, "zlib", block_terms=1 << 22)
    bodies, indexes = [], []
    for i in range(B):
        data = _filtered(_image(i, H, W)).tobytes()
        s = compress(data)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    eng = CheckpointInflator(ob=OB)
    match_total = sum(int(ix.match_bytes) for ix in indexes)
    seg_total = sum(int(ix.match_segs) for ix in indexes)
    Ui = (out_size + OB - 1) // OB
    Opad = Ui * OB

    prep = eng.prepare(bodies, indexes)
    attr4, kflag, s1k, s2k = decode_stamp_pallas(
        prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
        prep["symtab"], S=prep["S"], ob=OB)
    U_pad = attr4.shape[0] * attr4.shape[1] * 128
    U_live = B * Ui
    attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U_pad, OB)
    b = jnp.arange(OB, dtype=jnp.int32)[None, :]
    u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
    j = u * OB + b
    live = (u < U_live) & ((j % Opad) < out_size)
    ism_b = attr >= 0
    is_lit = (attr < 0) & (attr != SENTINEL)
    a32 = attr.astype(jnp.int32)
    litv = jnp.asarray(np.asarray(
        jnp.where(live & is_lit, -a32 - 1, 0).astype(jnp.uint8)).reshape(-1))
    ptr = jnp.asarray(np.asarray(
        jnp.where(live & ism_b, j - (a32 + 1), j)).reshape(-1))
    N = int(ptr.shape[0])

    r8 = lambda n: max(1024, -(-n // 8192) * 8192)
    pow2 = eng._pow2
    print(f"B={B} N={N} match={match_total} segs={seg_total}", flush=True)

    sc = lambda x: float(np.asarray(
        jax.tree.leaves(x)[0].reshape(-1)[:1])[0])

    ref = None
    for name, fn, cap, scap in [
        ("legacy pow2", _expand_legacy, pow2(match_total + 64, 1 << 10),
         pow2(seg_total + 64, 1 << 10)),
        ("new    pow2", _expand, pow2(match_total + 64, 1 << 10),
         pow2(seg_total + 64, 1 << 10)),
        ("new   tight", _expand, r8(match_total + 64),
         r8(seg_total + 64)),
    ]:
        f = jax.jit(lambda p, l, fn=fn, cap=cap, scap=scap: fn(
            p, l, cap, scap, None))
        r = f(ptr, litv)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            r = f(ptr, litv)
            sc(r)
            best = min(best, time.perf_counter() - t0)
        out = np.asarray(r[0])
        if ref is None:
            ref = out
        ok = "OK " if np.array_equal(out, ref) else "MISMATCH"
        print(f"{name}: cap={cap} scap={scap}  {best*1e3:8.1f} ms  {ok}",
              flush=True)


if __name__ == "__main__":
    main()
