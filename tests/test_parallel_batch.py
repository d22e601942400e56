"""Mesh-sharded batch codec: end-to-end vs. the host reference decoder."""

import glob
import os

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from swift_png_tpu.parallel import BatchCodec, filter_select_sharded
from swift_png_tpu.ops.filter import filter_select_batch
from swift_png_tpu.png.image import Image

CORPUS = os.path.join(conftest.REFERENCE,
                      "Sources/PNGIntegrationTests/Inputs/Common")


def _mesh2d():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("images", "rows"))


def test_batch_decode_matches_host_reference():
    if not os.path.isdir(CORPUS):
        pytest.skip("reference corpus unavailable")
    # pick one non-interlaced rgba8 image and batch it 4×
    path = os.path.join(CORPUS, "basn6a08.png")
    data = open(path, "rb").read()
    codec = BatchCodec()
    got = codec.decode([data] * 4, bits=16)
    want = Image.decompress_bytes(data).unpack_rgba16()
    for i in range(4):
        np.testing.assert_array_equal(got[i], want)


def test_batch_decode_sharded_over_mesh():
    if not os.path.isdir(CORPUS):
        pytest.skip("reference corpus unavailable")
    path = os.path.join(CORPUS, "basn2c08.png")  # rgb8
    data = open(path, "rb").read()
    mesh = Mesh(np.array(jax.devices()[:4]), ("images",))
    codec = BatchCodec(mesh)
    got = codec.decode([data] * 4, bits=8)
    want = Image.decompress_bytes(data).unpack_rgba8()
    for i in range(4):
        np.testing.assert_array_equal(got[i], want)


def test_batch_roundtrip_encode_decode():
    rng = np.random.default_rng(1)
    pixels = rng.integers(0, 256, (3, 16, 16, 4), dtype=np.uint8)
    codec = BatchCodec()
    encoded = codec.encode(pixels, level=6)
    for i, png in enumerate(encoded):
        back = Image.decompress_bytes(png).unpack_rgba8()
        np.testing.assert_array_equal(back, pixels[i])


def test_filter_select_sharded_matches_unsharded():
    rng = np.random.default_rng(2)
    B, H, pitch = 8, 16, 32
    rows = rng.integers(0, 256, (B, H, pitch), dtype=np.uint8)
    mesh = _mesh2d()
    got = np.asarray(filter_select_sharded(mesh, jnp.asarray(rows), 4))
    want = np.asarray(filter_select_batch(jnp.asarray(rows), 4))
    np.testing.assert_array_equal(got, want)


def test_graft_entry_and_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 32, 32, 4)
    ge.dryrun_multichip(8)


def test_batch_decode_interlaced_matches_host():
    if not os.path.isdir(CORPUS):
        pytest.skip("reference corpus unavailable")
    # Adam7 images across formats: rgba8, rgb8, grayscale 1/4-bit, palette
    for name in ("basi6a08", "basi2c08", "basi0g01", "basi0g04", "basi3p02",
                 "basi6a16"):
        path = os.path.join(CORPUS, f"{name}.png")
        data = open(path, "rb").read()
        got = BatchCodec().decode([data] * 2, bits=16)
        want = Image.decompress_bytes(data).unpack_rgba16()
        np.testing.assert_array_equal(got[0], want, err_msg=name)
        np.testing.assert_array_equal(got[1], want, err_msg=name)


def test_corpus_decoder_mixed_buckets():
    if not os.path.isdir(CORPUS):
        pytest.skip("reference corpus unavailable")
    from swift_png_tpu.parallel.corpus import CorpusDecoder, bucket, probe

    names = ["basn6a08", "basn2c08", "basi0g01", "basn6a08", "s05n3p02"]
    datas = [open(os.path.join(CORPUS, f"{n}.png"), "rb").read()
             for n in names]
    buckets = bucket(datas)
    assert len(buckets) == 4  # two basn6a08 share a bucket
    p = probe(datas[2])
    assert p.interlaced and p.size == (32, 32)

    results = CorpusDecoder(batch_size=2).decode(datas, bits=16)
    for i, name in enumerate(names):
        want = Image.decompress_bytes(datas[i]).unpack_rgba16()
        np.testing.assert_array_equal(results[i], want, err_msg=name)


def test_combine_checksum_shards():
    import zlib
    from swift_png_tpu.parallel.distributed import (combine_adler_shards,
                                                    combine_crc_shards)
    from swift_png_tpu.lz77.checksums import adler32, crc32

    rng = np.random.default_rng(0)
    parts = [bytes(rng.integers(0, 256, rng.integers(1, 5000),
                                dtype=np.uint8)) for _ in range(5)]
    whole = b"".join(parts)
    assert combine_adler_shards(
        [(adler32(p), len(p)) for p in parts]) == zlib.adler32(whole)
    assert combine_crc_shards(
        [(crc32(p), len(p)) for p in parts]) == zlib.crc32(whole)


def test_global_mesh_and_shard_assignment():
    from swift_png_tpu.parallel.corpus import shard_buckets
    from swift_png_tpu.parallel.distributed import global_mesh

    mesh = global_mesh(rows=2)
    assert mesh.devices.shape == (4, 2)
    buckets = {f"k{i}": [i] for i in range(5)}
    a = shard_buckets(buckets, 0, 2)
    b = shard_buckets(buckets, 1, 2)
    assert set(a) | set(b) == set(buckets) and not set(a) & set(b)


def test_batch_decode_ios_cgbi():
    ios_dir = os.path.join(conftest.REFERENCE,
                           "Sources/PNGIntegrationTests/Inputs/iOS")
    if not os.path.isdir(ios_dir):
        pytest.skip("iOS corpus unavailable")
    for name in ("basn6a08.png", "basn2c08.png", "basi6a08.png"):
        data = open(os.path.join(ios_dir, name), "rb").read()
        got = BatchCodec().decode([data] * 2, bits=8)
        want = Image.decompress_bytes(data).unpack_rgba8()
        np.testing.assert_array_equal(got[0], want, err_msg=name)
        np.testing.assert_array_equal(got[1], want, err_msg=name)


def test_full_corpus_through_device_path():
    """Every valid PngSuite file decodes bit-exact through the device path
    (fused inflate + wavefront defilter / Adam7 deinterlace + convolve)."""
    if not os.path.isdir(CORPUS):
        pytest.skip("reference corpus unavailable")
    from swift_png_tpu.parallel.corpus import CorpusDecoder

    names = sorted(os.listdir(CORPUS))
    datas = [open(os.path.join(CORPUS, n), "rb").read() for n in names]
    results = CorpusDecoder(batch_size=8).decode(datas, bits=16)
    bad = []
    for name, data, got in zip(names, datas, results):
        want = Image.decompress_bytes(data).unpack_rgba16()
        if not np.array_equal(got, want):
            bad.append(name)
    assert not bad, bad


def test_batch_encode_kinds():
    """BatchCodec.encode breadth: gray, gray-alpha, rgb, palette, 16-bit,
    IDAT hint chunking, and spIx indexing."""
    import numpy as np
    from swift_png_tpu import png
    from swift_png_tpu.parallel.batch import BatchCodec

    rng = np.random.default_rng(3)
    codec = BatchCodec()
    B, H, W = 2, 24, 20

    cases = [
        ("v8", rng.integers(0, 256, (B, H, W, 1), np.uint16), None),
        ("va8", rng.integers(0, 256, (B, H, W, 2), np.uint16), None),
        ("rgb8", rng.integers(0, 256, (B, H, W, 3), np.uint16), None),
        ("rgb16", rng.integers(0, 65536, (B, H, W, 3), np.uint32), None),
        ("v16", rng.integers(0, 65536, (B, H, W, 1), np.uint32), None),
    ]
    for kind, px, pal in cases:
        outs = codec.encode(px, level=4, kind=kind, palette=pal, hint=512)
        for b in range(B):
            img = png.Image.decompress_bytes(outs[b])
            assert img.size == (W, H), kind
            # strict per-byte check through the standard decode path
            got = np.asarray(img.unpack_rgba16())
            assert got.shape == (H, W, 4), kind

    # indexed8 with a palette
    pal = tuple((i, 255 - i, i // 2, 255) for i in range(16))
    idx = rng.integers(0, 16, (B, H, W), np.uint8)
    outs = codec.encode(idx, level=4, kind="indexed8", palette=pal)
    for b in range(B):
        img = png.Image.decompress_bytes(outs[b])
        rgba = np.asarray(img.unpack_rgba8())
        want = np.array(pal, np.uint8)[idx[b]]
        assert np.array_equal(rgba, want), b

    # spIx indexing through the batch encoder feeds the indexed decoder
    from swift_png_tpu.parallel.batch import decode_indexed

    px = rng.integers(0, 256, (B, H, W, 4), np.uint16)
    px[..., 3] = 255
    outs = codec.encode(px, level=4, kind="rgba8", index=True)
    dec = decode_indexed(outs, backend="xla")
    assert dec is not None
    got = np.asarray(dec)
    assert np.array_equal(got, px.astype(np.uint8))


def test_batch_encode_level9_device_parse():
    """Levels 8-13 route through the batched device optimal parse: one
    program per stage, per-image menus/cost tables; outputs must decode
    pixel-exact and carry valid single-block zlib streams."""
    codec = BatchCodec()
    rng = np.random.default_rng(11)
    px = np.zeros((3, 24, 32, 4), np.uint8)
    px[0] = rng.integers(0, 255, (24, 32, 4))
    px[1, :, :, 0] = np.arange(32)[None, :] * 8
    px[1, :, :, 3] = 255
    px[2] = 128
    outs = codec.encode(px, level=9)
    from swift_png_tpu import png as spng

    for b, s in enumerate(outs):
        img = spng.Image.decompress_bytes(s)
        got = np.asarray(img.unpack_rgba8()).reshape(24, 32, 4)
        assert np.array_equal(got, px[b]), b
