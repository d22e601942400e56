"""Generate device optimal-parse size goldens (VERDICT round-4 #4).

Runs the device DP parse (interpret mode — bit-exact with the chip
path) over all 28 reference baselines' filtered payloads at levels
8/9/13, plus the native level-9 sizes, and writes
tests/data/device_parse_goldens.json.  Slow (~30-40 min on CPU); rerun
only when the parse changes intentionally.

Usage: JAX_PLATFORMS=cpu python tools/gen_device_parse_goldens.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def filtered_payload(path: str) -> tuple[bytes, int, int]:
    from swift_png_tpu.png import chunk as chunks
    from swift_png_tpu.png import parsing
    from swift_png_tpu.png.chunk import ByteSource

    src = ByteSource(open(path, "rb").read())
    src.signature()
    idat = bytearray()
    header = None
    t = None
    while t != chunks.IEND:
        t, pay = src.chunk()
        if t == chunks.IHDR:
            header = parsing.Header.parse(pay, "common")
        elif t == chunks.IDAT:
            idat += pay
    W, H = header.size
    bpp = max(1, (header.pixel.volume + 7) >> 3)
    pitch1 = 1 + ((W * header.pixel.volume + 7) >> 3)
    return zlib.decompress(bytes(idat)), pitch1, bpp


def main() -> None:
    from swift_png_tpu import native
    from swift_png_tpu.ops.deflate_optimal import deflate_device_optimal

    out = {}
    paths = sorted(glob.glob("/root/reference/Tests/Baselines/*.png"),
                   key=os.path.getsize)
    for p in paths:
        name = os.path.basename(p)
        data, pitch1, bpp = filtered_payload(p)
        entry = {"filtered_bytes": len(data)}
        if native.available():
            entry["native9"] = len(native.deflate(data, 9, "zlib"))
        for level in (8, 9, 13):
            t0 = time.time()
            s = deflate_device_optimal(data, level=level, pitch=pitch1,
                                       bpp=bpp, interpret=True)
            assert zlib.decompress(s) == data, (name, level)
            entry[f"l{level}"] = len(s)
            print(f"{name} L{level}: {len(s)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        out[name] = entry
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data",
        "device_parse_goldens.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", dst)


if __name__ == "__main__":
    main()
