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
# NO persistent compilation cache for tests: this environment's zstandard
# cache codec segfaults intermittently under concurrent access (observed
# in both the read and write paths), and CPU compiles are cheap anyway
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
