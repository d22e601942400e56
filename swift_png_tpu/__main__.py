"""Command-line tooling: decode / encode / inspect / gzip.

The reference ships its tooling as ``PNGInspection`` dumps and the
``__Entrypoint`` benchmark harness (``Sources/PNG/__Entrypoint.swift``,
``Sources/PNGInspection/``); this module is the same layer as a CLI:

    python -m swift_png_tpu inspect  file.png
    python -m swift_png_tpu decode   file.png out.rgba   # rgba8 dump
    python -m swift_png_tpu recode   in.png out.png --level 9 [--index]
    python -m swift_png_tpu index    in.png [out.png]    # add spIx only
    python -m swift_png_tpu gzip     in [out.gz] --level 9
    python -m swift_png_tpu gunzip   in.gz [out]

Everything runs on the host tiers (numpy + native C++ when built) — no
device initialization, so it works in any environment.
"""

from __future__ import annotations

import argparse
import sys


def _cmd_inspect(args: argparse.Namespace) -> int:
    from . import inspection
    from .png.image import Image

    img = Image.decompress_path(args.file)
    print(inspection.describe_image(img))
    return 0


def _cmd_decode(args: argparse.Namespace) -> int:
    from .png.image import Image

    img = Image.decompress_path(args.file)
    rgba = img.unpack_rgba8()
    with open(args.out, "wb") as f:
        f.write(rgba.tobytes())
    h, w = rgba.shape[:2]
    print(f"{args.file}: {w}x{h} -> {args.out} "
          f"({rgba.nbytes} bytes rgba8)")
    return 0


def _cmd_recode(args: argparse.Namespace) -> int:
    from .png.image import Image

    img = Image.decompress_path(args.file)
    img.compress_path(args.out, level=args.level, index=args.index)
    import os

    print(f"{args.file} ({os.path.getsize(args.file)} B) -> "
          f"{args.out} ({os.path.getsize(args.out)} B) at level "
          f"{args.level}{' +spIx' if args.index else ''}")
    return 0


def _cmd_index(args: argparse.Namespace) -> int:
    """Add an ``spIx`` checkpoint index to an existing PNG without
    recompressing: one host walk over the IDAT payload, every other
    chunk copied byte-identical."""
    import os

    from .lz77.index import build_index
    from .png import chunk as chunks
    from .png.chunk import ByteDestination, ByteSource

    with open(args.file, "rb") as f:
        raw = f.read()
    src = ByteSource(raw)
    src.signature()
    parts: list[tuple[str, bytes]] = []
    idats: list[bytes] = []
    type_ = None
    while type_ != chunks.IEND:
        type_, payload = src.chunk()
        if type_ == chunks.IDAT:
            idats.append(payload)
        if type_ == chunks.spIx:
            print(f"{args.file}: already indexed")
            return 0
        if type_ == chunks.CgBI:
            print(f"{args.file}: iOS/CgBI stream — not indexable")
            return 1
        parts.append((type_, payload))
    full = b"".join(idats)
    if len(full) < 6:
        print(f"{args.file}: no IDAT payload")
        return 1
    # decompressed size from IHDR geometry (scanline bytes incl. filter)
    from .png import parsing

    header = parsing.Header.parse(dict(parts)[chunks.IHDR], "common")
    if header.interlaced:
        print(f"{args.file}: interlaced — not indexable")
        return 1
    W, H = header.size
    out_size = H * (1 + ((W * header.pixel.volume + 7) >> 3))
    ix = build_index(full[2:-4], out_size, args.ob)
    if ix is None:
        print(f"{args.file}: stream outside the index's structural "
              "limits — left unchanged")
        return 1
    dst = ByteDestination()
    dst.signature()
    for type_, payload in parts:
        if type_ == chunks.IEND:
            dst.format(chunks.spIx, ix.serialize())
        dst.format(type_, payload)
    out = args.out or args.file
    with open(out, "wb") as f:
        f.write(b"".join(dst.chunks))
    print(f"{args.file} -> {out} (+spIx, {len(ix.serialize())} B, "
          f"ob={args.ob}, {os.path.getsize(out)} B total)")
    return 0


def _cmd_gzip(args: argparse.Namespace) -> int:
    from .lz77 import gzip as g

    with open(args.file, "rb") as f:
        data = f.read()
    out = args.out or args.file + ".gz"
    with open(out, "wb") as f:
        f.write(g.archive(data, level=args.level))
    print(f"{args.file} ({len(data)} B) -> {out}")
    return 0


def _cmd_gunzip(args: argparse.Namespace) -> int:
    from .lz77 import gzip as g

    with open(args.file, "rb") as f:
        blob = f.read()
    out = args.out or (args.file[:-3] if args.file.endswith(".gz")
                       else args.file + ".out")
    data = g.extract(blob)
    with open(out, "wb") as f:
        f.write(data)
    print(f"{args.file} ({len(blob)} B) -> {out} ({len(data)} B)")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="swift_png_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("inspect", help="dump metadata (PNGInspection)")
    s.add_argument("file")
    s.set_defaults(fn=_cmd_inspect)

    s = sub.add_parser("decode", help="decode to a raw rgba8 dump")
    s.add_argument("file")
    s.add_argument("out")
    s.set_defaults(fn=_cmd_decode)

    s = sub.add_parser("recode", help="decode + re-encode a PNG")
    s.add_argument("file")
    s.add_argument("out")
    s.add_argument("--level", type=int, default=9)
    s.add_argument("--index", action="store_true",
                   help="embed the spIx checkpoint decode index")
    s.set_defaults(fn=_cmd_recode)

    s = sub.add_parser(
        "index", help="add an spIx decode index without recompressing")
    s.add_argument("file")
    s.add_argument("out", nargs="?")
    s.add_argument("--ob", type=int, default=256,
                   help="output bytes per checkpoint unit")
    s.set_defaults(fn=_cmd_index)

    s = sub.add_parser("gzip", help="compress with the LZ77 product")
    s.add_argument("file")
    s.add_argument("out", nargs="?")
    s.add_argument("--level", type=int, default=9)
    s.set_defaults(fn=_cmd_gzip)

    s = sub.add_parser("gunzip", help="decompress a gzip member")
    s.add_argument("file")
    s.add_argument("out", nargs="?")
    s.set_defaults(fn=_cmd_gunzip)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
