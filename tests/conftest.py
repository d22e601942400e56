"""Test configuration.

JAX tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path; benches run on the real chip).
"""

import os

# The environment may pin JAX_PLATFORMS to the real accelerator (e.g. the
# axon TPU tunnel); tests must run on CPU regardless, so override both the
# env var and the jax config (the plugin ignores the env var alone).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the device-kernel tests are compile-heavy
# and their programs are identical across runs
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_cache_swift_png_tpu")
# the zstandard codec in the persistent cache intermittently segfaults in
# this environment (observed in cache read AND write paths); store raw
try:
    jax.config.update("jax_compilation_cache_compression_algorithm", "none")
except Exception:
    pass
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
