"""CLI tooling (`python -m swift_png_tpu`): the reference's
PNGInspection/tooling layer as subcommands, driven end-to-end."""

import os
import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu.__main__ import main
from swift_png_tpu.png.image import Image

CORPUS = ("/root/reference/Sources/PNGIntegrationTests/Inputs/Common/"
          "basn2c08.png")


@pytest.fixture
def png_file(tmp_path):
    dst = tmp_path / "t.png"
    dst.write_bytes(open(CORPUS, "rb").read())
    return str(dst)


def test_inspect(png_file, capsys):
    assert main(["inspect", png_file]) == 0
    out = capsys.readouterr().out
    assert "32×32" in out and "rgb8" in out


def test_decode_dump(png_file, tmp_path):
    out = str(tmp_path / "t.rgba")
    assert main(["decode", png_file, out]) == 0
    rgba = np.frombuffer(open(out, "rb").read(), np.uint8)
    assert rgba.size == 32 * 32 * 4
    ref = Image.decompress_path(png_file).unpack_rgba8()
    assert bytes(rgba) == ref.tobytes()


def test_recode_indexed(png_file, tmp_path):
    out = str(tmp_path / "t2.png")
    assert main(["recode", png_file, out, "--level", "9", "--index"]) == 0
    blob = open(out, "rb").read()
    assert b"spIx" in blob
    a = Image.decompress_path(png_file).unpack_rgba8()
    b = Image.decompress_path(out).unpack_rgba8()
    assert (a == b).all()


def test_gzip_roundtrip(png_file, tmp_path):
    gz = str(tmp_path / "t.gz")
    back = str(tmp_path / "t.back")
    assert main(["gzip", png_file, gz, "--level", "7"]) == 0
    assert main(["gunzip", gz, back]) == 0
    assert open(back, "rb").read() == open(png_file, "rb").read()
    # external-decoder validity of the member body
    blob = open(gz, "rb").read()
    assert blob[:2] == b"\x1f\x8b"
    assert zlib.decompress(blob[10:], -15) == open(png_file, "rb").read()


def test_index_existing_png(png_file, tmp_path):
    """`index` adds an spIx chunk to a foreign-encoder PNG without
    recompressing; the result decodes bit-exact on both paths."""
    import numpy as np

    from swift_png_tpu.parallel.batch import decode_indexed

    out = str(tmp_path / "ixd.png")
    rc = main(["index", png_file, out])
    want = Image.decompress_path(png_file).unpack_rgba8()
    if rc != 0:
        return  # stream legitimately outside the index's limits
    blob = open(out, "rb").read()
    assert b"spIx" in blob
    # standard decode unchanged
    assert (Image.decompress_path(out).unpack_rgba8() == want).all()
    # the indexed device path serves it
    got = decode_indexed([blob], backend="xla")
    if got is not None:
        assert np.array_equal(np.asarray(got)[0], want)
    # idempotent
    assert main(["index", out]) == 0
