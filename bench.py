"""Benchmark: full on-chip decode — indexed lockstep inflate (Pallas) +
wavefront defilter + convolve.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", …extras}.

Measures the BASELINE.json headline (inflate+unfilter throughput per chip):
rgba8 512×512 PNG streams encoded by our native deflate (one dynamic block
per image — both smaller and the shape the indexed decoder serves), decoded
end-to-end on device: checkpoint-parallel lockstep token decode + byte
stamping in a Pallas kernel, MXU-compacted back-reference expansion,
device Adler-32, anti-diagonal wavefront defilter, and convolve to RGBA.

Timing discipline (this matters on the tunneled dev chip): a result scalar
is fetched after every run — ``block_until_ready`` alone does NOT drain the
remote queue here, and async dispatch times are meaningless.  Compressed
buffers, indexes, and device inputs are pre-staged; the timed region is
pure device work.  ``vs_baseline`` is value / 2.0 GB/s (north-star target).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")


def _image(seed: int, H: int, W: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    base = (
        128 + 60 * np.sin(x / 37.0 + seed) + 50 * np.cos(y / 23.0)
    )[..., None] + np.array([0, 30, -20, 0])[None, None, :]
    noise = rng.normal(0, 12, (H, W, 4))
    pixels = np.clip(base + noise, 0, 255).astype(np.uint8)
    pixels[..., 3] = 255
    return pixels


def _filtered(pixels: np.ndarray) -> np.ndarray:
    H, W, C = pixels.shape
    from swift_png_tpu import native

    if native.available():
        return native.filter_select(pixels.reshape(H, W * C), C)
    from swift_png_tpu.png.encoder import filter_select

    rows = pixels.reshape(H, W * C)
    out = np.empty((H, 1 + W * C), np.uint8)
    prev = np.zeros(W * C, np.uint8)
    for r in range(H):
        out[r] = filter_select(rows[r], prev, C)
        prev = rows[r]
    return out


def _accelerator_alive(timeout: float = 900.0) -> bool:
    """Probe backend init AND one tiny computation in a subprocess: when
    the TPU tunnel is down, ``jax.devices()`` hangs indefinitely
    (observed round 2), and a half-down tunnel initializes fine but
    hangs on the first dispatched op (observed round 5).  The child is
    killed on timeout and the bench falls back to CPU so the driver
    always gets a JSON line."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, numpy as np;"
             "jax.devices();"
             "x = jnp.arange(1 << 16);"
             "print(int(np.asarray((x * 3).sum())) & 1)"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    tpu_unavailable = False
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not _accelerator_alive(
            float(os.environ.get("SPT_TPU_PROBE_S", "900"))):
        tpu_unavailable = True

    import jax

    if tpu_unavailable:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (CheckpointInflator,
                                                      inflate_indexed_pallas)
    from swift_png_tpu.parallel.batch import decode_stage

    B = int(os.environ.get("SPT_BENCH_B", "4" if tpu_unavailable else "32"))
    H, W = 512, 512
    OB = int(os.environ.get("SPT_BENCH_OB", "256"))
    pitch1 = 1 + W * 4
    out_size = H * pitch1

    if native.available():
        compress = lambda b: native.deflate(b, 6, "zlib",
                                            block_terms=1 << 22)
    else:
        from swift_png_tpu.lz77.deflate import Deflator

        def compress(b):
            d = Deflator(level=6)
            d.push(b, last=True)
            return d.pull()

    datas, bodies, indexes, streams = [], [], [], []
    for i in range(B):
        data = _filtered(_image(i, H, W)).tobytes()
        datas.append(data)
        s = compress(data)
        streams.append(s)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    # CPU yardsticks on the SAME streams (single host core) — the honest
    # context the reference's libpng-relative tables provide
    # (Benchmarks/README.md): stdlib zlib and our native C++ engine
    import zlib as _zy

    t0 = time.perf_counter()
    for s in streams:
        _zy.decompress(s)
    yard_zlib = B * out_size / (time.perf_counter() - t0) / 1e9
    yard_native = None
    if native.available():
        t0 = time.perf_counter()
        for s in streams:
            native.inflate(s, out_size, "zlib")
        yard_native = B * out_size / (time.perf_counter() - t0) / 1e9

    on_tpu = jax.default_backend() not in ("cpu",)
    eng = CheckpointInflator(ob=OB, backend="pallas" if on_tpu else "xla")
    prep = eng.prepare(bodies, indexes)
    r8k = lambda n: max(1 << 10, -(-n // 8192) * 8192)
    expand_cap = r8k(sum(ix.match_bytes for ix in indexes) + 64)
    seg_cap = r8k(sum(ix.match_segs for ix in indexes) + 64)

    def inflate():
        if eng.backend == "pallas":
            return inflate_indexed_pallas(
                prep["kbound"], prep["spans3"], prep["meta"],
                prep["tabs"], prep["symtab"], ob=OB, n_streams=B,
                out_size=out_size, expand_cap=expand_cap,
                S=prep["S"], interpret=not on_tpu, seg_cap=seg_cap)
        from swift_png_tpu.ops.inflate_checkpoint import inflate_indexed

        return inflate_indexed(
            prep["spans"], prep["sub0"], prep["n_tokens"], prep["skip"],
            prep["lit"], prep["dist"], ob=OB, n_streams=B,
            out_size=out_size, expand_cap=expand_cap, k_max=prep["k_max"])

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def _decode_fused(kbound, spans3, meta, tabs, symtab):
        # the WHOLE batch decode as one dispatch: composing inflate,
        # decode_stage, and the probe at the Python level costs this
        # tunnel ~1-3 ms per top-level call
        if eng.backend == "pallas":
            out, flag, adler, ovf = inflate_indexed_pallas(
                kbound, spans3, meta, tabs, symtab, ob=OB, n_streams=B,
                out_size=out_size, expand_cap=expand_cap,
                S=prep["S"], interpret=not on_tpu, seg_cap=seg_cap)
        else:
            from swift_png_tpu.ops.inflate_checkpoint import \
                inflate_indexed

            out, flag, adler, ovf = inflate_indexed(
                prep["spans"], prep["sub0"], prep["n_tokens"],
                prep["skip"], prep["lit"], prep["dist"], ob=OB,
                n_streams=B, out_size=out_size, expand_cap=expand_cap,
                k_max=prep["k_max"])
        filtered = out.reshape(B, H, pitch1)
        pixels = decode_stage(filtered, delay=4, depth=8, channels=4,
                              width=W, bits=8)
        # one probe scalar depending on every output, computed ON
        # DEVICE: each host fetch costs a full ~30 ms tunnel round trip
        probe = (adler[0].astype(jnp.int32)
                 + pixels[0, 0, 0, 0].astype(jnp.int32)
                 + flag.max())
        return pixels, flag, adler, probe

    def decode_all():
        if eng.backend == "pallas":
            return _decode_fused(prep["kbound"], prep["spans3"],
                                 prep["meta"], prep["tabs"],
                                 prep["symtab"])
        return _decode_fused(None, None, None, None, None)

    # warmup + correctness
    pixels, flag, adler, _probe = decode_all()
    px0 = np.asarray(pixels)
    assert int(np.asarray(flag).max()) == 0, "decode flagged"
    import zlib as _z

    for i in range(B):
        assert int(np.asarray(adler)[i]) == _z.adler32(datas[i]), i

    trials = 5
    best = float("inf")
    t_inf = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out, flag, adler, ovf = inflate()
        _ = float(np.asarray(adler)[0])
        t_inf = min(t_inf, time.perf_counter() - t0)
    for _ in range(trials):
        t0 = time.perf_counter()
        pixels, flag, adler, probe = decode_all()
        _ = float(np.asarray(probe))
        best = min(best, time.perf_counter() - t0)

    # steady-state throughput: P batch decodes enqueued back-to-back,
    # one sync at the end — the device queue is FIFO, so the last probe
    # completing proves all P completed.  This is the per-chip number a
    # continuously-fed decode service sees; `total_ms` above remains the
    # single-batch latency including the round trip.
    P = int(os.environ.get("SPT_BENCH_PIPE", "8"))
    t_pipe = float("inf")
    for _ in range(max(2, trials - 2)):
        t0 = time.perf_counter()
        last = None
        for _ in range(P):
            _px, _fl, _ad, last = decode_all()
        _ = float(np.asarray(last))
        t_pipe = min(t_pipe, time.perf_counter() - t0)

    # ---- encode side: level-9 deflate (batched device DP parse) ---------
    # timed region = per-image menus/warm starts (native sampler), the
    # device pipeline (per-image-menu candidates → iterated DP with
    # per-image cost tables → compact → packed atoms), the single
    # histogram round trip, and a final scalar sync; stream assembly is
    # verified, untimed host IO
    from swift_png_tpu.ops.deflate_optimal import (
        batch_layout, deflate_device_optimal_batch, optimal_pipeline_batch)

    Benc = int(os.environ.get("SPT_BENCH_ENC_B",
                              "2" if tpu_unavailable else "16"))
    enc_datas = datas[:Benc]
    t9 = float("inf")
    size9 = None
    try:
        # pre-stage the filtered rows (IO, untimed — the device filter
        # stage produces them on device in the full pipeline)
        stride, Ntot, _ = batch_layout([len(d) for d in enc_datas])
        ebuf = np.zeros(Ntot, np.uint8)
        for i, d in enumerate(enc_datas):
            ebuf[i * stride: i * stride + len(d)] = np.frombuffer(
                d, np.uint8)
        edev = jnp.asarray(ebuf)
        s9s = deflate_device_optimal_batch(
            enc_datas, level=9, pitch=W * 4 + 1, bpp=4,
            interpret=not on_tpu, dbuf=edev)
        size9 = len(s9s[0])
        import zlib as _z9

        for d, s in zip(enc_datas, s9s):
            assert _z9.decompress(s) == d
        for _ in range(3):
            t0 = time.perf_counter()
            _al, totals, _tr, _ct = optimal_pipeline_batch(
                enc_datas, level=9, pitch=W * 4 + 1, bpp=4,
                interpret=not on_tpu, dbuf=edev)
            _ = float(np.asarray(totals[-1]))
            t9 = min(t9, time.perf_counter() - t0)
    except Exception:
        pass

    # ---- worst-case content: smooth gradients (match-heavy, deep
    # back-reference chains through the expansion's doubling path);
    # skipped on the CPU fallback (interpret-mode Pallas is unboundedly
    # slow) -----------------------------------------------------------
    smooth_gbps = None
    smooth_lat_gbps = None
    try:
        if tpu_unavailable:
            raise RuntimeError("skip smooth extra on CPU fallback")
        Bs = 8
        y, x = np.mgrid[0:H, 0:W]
        sdatas, sbodies, sixs = [], [], []
        for i in range(Bs):
            pix = np.stack([(x // 8 + y // 8 + i) % 256, x // 4 % 256,
                            y // 4 % 256, np.full_like(x, 255)],
                           axis=-1).astype(np.uint8)
            d = _filtered(pix).tobytes()
            sdatas.append(d)
            s = compress(d)
            sbodies.append(s[2:-4])
            sixs.append(build_index(s[2:-4], out_size, OB))
        sprep = eng.prepare(sbodies, sixs)
        smatch = sum(ix.match_bytes for ix in sixs)
        scap = min(r8k(smatch + 64),
                   eng._pow2(Bs * sprep["Ui_pad"] * OB))
        sseg = r8k(sum(ix.match_segs for ix in sixs) + 64)
        scol = CheckpointInflator.auto_collapse(
            smatch, Bs, out_size, sprep["Ui_pad"], OB)
        from swift_png_tpu.ops.inflate_seqcopy import RECORDS_SMEM_CAP

        sreccap = (min(RECORDS_SMEM_CAP, r8k(max(4096, smatch // 16)))
                   if scol and (sprep["Ui_pad"] * OB) % 128 == 0
                   else None)

        def sinflate():
            return inflate_indexed_pallas(
                sprep["kbound"], sprep["spans3"], sprep["meta"],
                sprep["tabs"], sprep["symtab"], ob=OB, n_streams=Bs,
                out_size=out_size, expand_cap=scap, S=sprep["S"],
                interpret=not on_tpu, collapse=scol, seg_cap=sseg,
                records_cap=sreccap)

        sout, sflag, sadler, _ = sinflate()
        assert int(np.asarray(sflag).max()) == 0
        import zlib as _zs

        for i in range(Bs):
            assert int(np.asarray(sadler)[i]) == _zs.adler32(sdatas[i])
        ts = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _o, _f, sadler, _v = sinflate()
            _ = float(np.asarray(sadler)[0])
            ts = min(ts, time.perf_counter() - t0)
        smooth_lat_gbps = round(Bs * out_size / ts / 1e9, 4)
        # steady-state smooth throughput, same discipline as the
        # headline: P enqueued batches, one sync (FIFO queue)
        tsp = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(P):
                _o, _f, sadler, _v = sinflate()
            _ = float(np.asarray(sadler)[0])
            tsp = min(tsp, time.perf_counter() - t0)
        smooth_gbps = round(P * Bs * out_size / tsp / 1e9, 4)
    except Exception as e:
        import sys as _sys

        print(f"smooth bench skipped: {e!r}", file=_sys.stderr)

    # ---- foreign-shaped streams: stdlib zlib-9 output (multi-block
    # dynamic Huffman, ~41 blocks/image — the content shape of the
    # reference's benchmark corpus, which measures libpng-produced
    # files: Benchmarks/README.md:57) through the table-switching
    # multiblock kernel + host-built indexes -----------------------------
    foreign_gbps = None
    foreign_tier = None
    try:
        if tpu_unavailable:
            raise RuntimeError("skip foreign extra on CPU fallback")
        import zlib as _zf

        fstreams = [_zf.compress(d, 9) for d in datas]
        fbodies = [s[2:-4] for s in fstreams]
        fixs = [build_index(b, out_size, OB) for b in fbodies]
        if any(ix is None for ix in fixs):
            raise RuntimeError("foreign stream outside the fast path")
        # one validated run() resolves the launch plan (cap retries,
        # collapse/records policy); the timed loop re-dispatches the same
        # compiled program with those parameters
        _out, _ad = eng.run(fbodies, fixs, keep_on_device=False)
        for i in range(B):
            assert int(_ad[i]) == _zf.adler32(datas[i])
        plan = eng.last_plan
        if plan.get("tier") in ("host", "mixed"):
            # heterogeneous dispatch chose the multithreaded native
            # tier for all (or part) of the batch (near-uniform match
            # distances — see _probe_match_profile); time the served
            # path as-is
            tfh = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _o2, _a2 = eng.run(fbodies, fixs, keep_on_device=False)
                tfh = min(tfh, time.perf_counter() - t0)
            foreign_gbps = round(B * out_size / tfh / 1e9, 4)
            foreign_tier = ("native-host" if plan["tier"] == "host"
                            else "mixed")
            raise StopIteration  # skip the device timing below
        foreign_tier = "device"
        fprep = eng.prepare(fbodies, fixs)

        def finflate():
            return inflate_indexed_pallas(
                fprep["kbound"], fprep["spans3"], fprep["meta"],
                fprep["tabs"], fprep["symtab"], ob=OB, n_streams=B,
                out_size=out_size, expand_cap=plan["expand_cap"],
                S=fprep["S"], interpret=not on_tpu,
                seg_cap=plan["seg_cap"],
                multiblock=fprep["multiblock"],
                has_stored=fprep["has_stored"],
                stored_gap=fprep["stored_gap"]
                if fprep["has_stored"] else None,
                collapse=plan["collapse"],
                records_cap=plan["records_cap"],
                sweep_k=plan.get("sweep_k"))

        _fo, ffl, fad, _fv = finflate()
        assert int(np.asarray(ffl).max()) == 0
        for i in range(B):
            assert int(np.asarray(fad)[i]) == _zf.adler32(datas[i])
        tfp = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(P):
                _fo, _ffl, fad, _fv = finflate()
            _ = float(np.asarray(fad)[0])
            tfp = min(tfp, time.perf_counter() - t0)
        foreign_gbps = round(P * B * out_size / tfp / 1e9, 4)
    except StopIteration:
        pass
    except Exception as e:
        import sys as _sys
        import traceback as _tb

        print(f"foreign bench skipped: {e!r}", file=_sys.stderr)
        _tb.print_exc()

    # ---- foreign PNG decode END-TO-END (inflate + defilter + convolve).
    # The tunnel moves ~25 MB/s each way (measured round 5), so host-
    # inflated bytes can never reach the chip at speed — when the
    # heterogeneous dispatch picks the host tier for inflate, defilter
    # and convolve run on the native host tier too (threaded); rgba8
    # convolve is an identity relayout.  On PCIe-attached production
    # hosts the same dispatch would overlap host inflate with device
    # defilter/convolve batches instead.
    foreign_png_gbps = None
    try:
        if tpu_unavailable or not native.available():
            raise RuntimeError("foreign png e2e needs native + chip run")
        import zlib as _zf2

        fstreams2 = [_zf2.compress(d, 9) for d in datas]

        def foreign_png_once():
            raws = native.inflate_batch(fstreams2, out_size, "zlib")
            rows = np.frombuffer(b"".join(raws), np.uint8).reshape(
                B, H, pitch1).copy()
            pix = native.defilter_batch(rows, 4)
            return pix.reshape(B, H, W, 4)

        pixf = foreign_png_once()
        assert np.array_equal(pixf[0], px0[0]), "foreign e2e mismatch"
        tf2 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _p = foreign_png_once()
            tf2 = min(tf2, time.perf_counter() - t0)
        foreign_png_gbps = round(B * out_size / tf2 / 1e9, 4)
    except Exception as e:
        import sys as _sys

        print(f"foreign png e2e skipped: {e!r}", file=_sys.stderr)

    nbytes = B * out_size
    gbps = P * nbytes / t_pipe / 1e9
    result = {
        "metric": f"decode rgba8 512x512 batch{B} pipelined x{P} "
                  "(indexed pallas inflate+defilter+convolve)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 2.0, 4),
        "latency_gbps": round(nbytes / best / 1e9, 4),
        "inflate_ms": round(t_inf * 1e3, 1),
        "total_ms": round(best * 1e3, 1),
        "compressed_ratio": round(
            sum(len(b) for b in bodies) / nbytes, 3),
        "yardstick_zlib_1core_gbps": round(yard_zlib, 4),
    }
    if yard_native is not None:
        result["yardstick_native_1core_gbps"] = round(yard_native, 4)
    if tpu_unavailable:
        result["tpu_unavailable"] = True  # CPU fallback — not a chip number
    if smooth_gbps is not None:
        result["decode_smooth_gbps"] = smooth_gbps
        result["decode_smooth_latency_gbps"] = smooth_lat_gbps
    if foreign_gbps is not None:
        result["decode_foreign_gbps"] = foreign_gbps
        result["decode_foreign_tier"] = foreign_tier
    if foreign_png_gbps is not None:
        result["decode_foreign_png_gbps"] = foreign_png_gbps
    if size9 is not None and t9 < float("inf"):
        result["deflate_l9_mbps"] = round(
            sum(len(d) for d in enc_datas) / t9 / 1e6, 2)
        result["deflate_l9_batch"] = len(enc_datas)
        if native.available():
            result["deflate_l9_ratio_vs_native9"] = round(
                size9 / len(native.deflate(enc_datas[0], 9, "zlib")), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
