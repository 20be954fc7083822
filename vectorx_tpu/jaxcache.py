"""Host-keyed persistent XLA compile cache.

XLA:CPU AOT blobs embed target-machine features; loading a blob compiled
on a different microarchitecture triggers loader errors or SIGILL (seen on
the round-2 judge box, and reproduced in round 3 when a cache directory
written by a previous session's host was reused).  Every entry point that
enables the persistent cache must go through here: the cache directory is
suffixed with a fingerprint of the host's CPU flags + jax version, so a
host change simply starts a fresh subdirectory."""

from __future__ import annotations

import hashlib
import os
import platform

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def host_key() -> str:
    import jax

    # XLA:CPU picks compile-target features (e.g. prefer-no-scatter) per
    # process configuration: blobs written under one XLA_FLAGS/platform
    # combination fail to load (cpu_aot_loader errors, wasted recompiles)
    # under another.  Fold the flag environment into the key so each
    # configuration gets its own namespace.
    env = os.environ.get("XLA_FLAGS", "") + "|" + \
        os.environ.get("JAX_PLATFORMS", "") + "|" + \
        os.environ.get("PALLAS_AXON_POOL_IPS", "")
    key = hashlib.sha256(
        (platform.machine() + platform.processor()
         + jax.version.__version__ + env).encode()).hexdigest()[:12]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = hashlib.sha256(
                        (key + line).encode()).hexdigest()[:12]
                    break
    except OSError:
        pass
    return key


def enable_persistent_cache(root: str | None = None) -> str | None:
    """Point jax's compilation cache at <root>/<host_key>.  Returns the
    directory, or None when disabled via VECTORX_JAX_CACHE=0."""
    if os.environ.get("VECTORX_JAX_CACHE", "1") != "1":
        return None
    import jax

    root = root or os.environ.get("VECTORX_JAX_CACHE_ROOT") \
        or os.path.join(_REPO_ROOT, ".jax_cache")
    d = os.path.join(root, host_key())
    # Every evidence driver / bench funnels through here before its first
    # device op.  When the environment pins JAX_PLATFORMS to the remote
    # TPU plugin alone, also register the in-process CPU backend: the
    # host verifier batches Merkle-path hashing through an XLA:CPU-jitted
    # permutation (hash/poseidon_np.py), which would otherwise fall back
    # to the ~300x slower numpy engine.  Priority order keeps the TPU as
    # the default platform; this only ADDS cpu as an addressable backend.
    # (After host_key(): the added platform must not shift the cache
    # namespace — entries are platform-keyed inside the cache anyway.)
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        os.environ["JAX_PLATFORMS"] = plats + ",cpu"
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
