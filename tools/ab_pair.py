"""A/B the paired-literal decode on chip: plain loop vs pairing loop.

Builds one bench-style batch, preps once, then times the kernel with
(a) mode-0 kbound (plain loop, token bounds) and (b) the production
kbound from prepare() (lit/pair modes, paired bounds).  Both runs are
checked bit-exact + Adler against the host bytes.

timeout 3600 python tools/ab_pair.py [B] [trials]
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
    import zlib

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (CheckpointInflator,
                                                      inflate_indexed_pallas)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1

    from bench import _filtered, _image

    on_tpu = jax.default_backend() not in ("cpu",)
    datas, bodies, indexes = [], [], []
    for i in range(B):
        data = _filtered(_image(i, H, W)).tobytes()
        datas.append(data)
        s = native.deflate(data, 6, "zlib", block_terms=1 << 22)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    eng = CheckpointInflator(ob=OB, backend="pallas")
    prep = eng.prepare(bodies, indexes)
    expand_cap = eng._pow2(sum(ix.match_bytes for ix in indexes) + 64,
                           1 << 10)

    from swift_png_tpu.ops.inflate_pallas import TUB

    kb_prod = np.asarray(prep["kbound"])
    # plain variant: mode 0 everywhere, full token bounds
    n_tok = np.stack([ix.n_tokens for ix in indexes]).reshape(-1)
    T = kb_prod.shape[0]
    pad = np.zeros(T * TUB, np.int64)
    pad[: len(n_tok)] = n_tok
    kb_plain = np.stack(
        [pad.reshape(T, TUB).max(axis=1),
         np.zeros(T, np.int64)], axis=1).astype(np.int32)
    print(f"B={B} tiles={T} plain-bound={kb_plain[:,0].sum()} "
          f"prod-bound={kb_prod[:,0].sum()} "
          f"modes={np.bincount(kb_prod[:,1], minlength=3)}", flush=True)

    def run(kb):
        return inflate_indexed_pallas(
            jnp.asarray(kb), prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"], ob=OB, n_streams=B, out_size=out_size,
            expand_cap=expand_cap, S=prep["S"], interpret=not on_tpu)

    nbytes = B * out_size
    for label, kb in (("plain", kb_plain), ("paired", kb_prod)):
        out, flag, adler, ovf = run(kb)
        assert int(np.asarray(flag).max()) == 0, label
        for i in range(B):
            assert int(np.asarray(adler)[i]) == zlib.adler32(datas[i])
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _o, _f, adler, _v = run(kb)
            _ = float(np.asarray(adler)[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:8s} {best*1e3:8.1f} ms  {nbytes/best/1e9:6.3f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
