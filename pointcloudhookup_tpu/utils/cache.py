"""Persistent-compilation-cache setup, keyed by host fingerprint.

XLA:CPU caches AOT executables specialized to the compiling machine's
feature set; loading them on a different CPU fails with
machine-feature-mismatch errors (and re-compiles anyway), so a cache
directory that travels with the repo across machines is pure poison.
Key the directory by a fingerprint of the host instead: each machine
gets its own subtree, stale foreign entries are never even looked at.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Stable-per-machine, distinct-across-machines cache key: CPU
    feature flags + architecture (the exact inputs XLA:CPU specializes
    AOT results against)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def setup_compilation_cache(base: str = "/root/repo/.jax_cache") -> str:
    """Point JAX's persistent compilation cache at a host-keyed subdir
    of `base` (override the base with PCH_JAX_CACHE_DIR; set it empty to
    disable caching entirely).  Returns the directory used ('' when
    disabled)."""
    import jax

    base = os.environ.get("PCH_JAX_CACHE_DIR", base)
    if not base:
        return ""
    path = os.path.join(base, host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
