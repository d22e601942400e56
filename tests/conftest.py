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

import pytest  # noqa: E402

_TESTS_RUN = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    """Work around an XLA:CPU compile-accumulation crash.

    This environment's jaxlib segfaults/aborts inside
    ``backend_compile_and_load`` after a few hundred CPU compilations in
    one process (reproduced 4×; the crash follows TOTAL compile count,
    not any specific test — reordering the files moves it to a different
    test at the same accumulated depth).  Dropping the executable caches
    periodically releases the compiler's accumulated state before the
    threshold; re-compiles are cheap on CPU.
    """
    yield
    _TESTS_RUN["n"] += 1
    if _TESTS_RUN["n"] % 40 == 0:
        jax.clear_caches()


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
