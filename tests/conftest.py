"""Test configuration.

Tests run on a virtual 8-device CPU mesh by default so that every sharded
code path (pjit/shard_map collectives) is exercised hermetically, mirroring
how the driver validates `dryrun_multichip`.  Set VECTORX_TEST_TPU=1 to run
the suite against the real TPU chip instead (single device).

This must run before `jax` is imported anywhere.
"""

import os
import sys

if os.environ.get("VECTORX_TEST_TPU", "0") != "1":
    # Force CPU: the ambient environment pins JAX_PLATFORMS to the remote TPU
    # plugin, which would route every eager op through a remote-compile
    # tunnel.  (The plugin may already be registered by sitecustomize; JAX
    # only *initializes* the platform named here, so forcing cpu is enough.)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache: the suite compiles many small shape-specialized
# kernels; cache them across pytest processes.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
