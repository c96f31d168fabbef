"""Process-level JAX setup shared by the CLIs.

Remote TPU compiles through the relay take minutes per program shape; a
persistent compilation cache makes re-runs start in seconds. Env vars are
pre-empted by the platform sitecustomize importing jax first, so the config
API is the only reliable switch (see CLAUDE.md).
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_tag() -> str:
    """Cache dirs are machine-scoped: an XLA AOT cache shared across
    heterogeneous hosts aborts on CPU-feature mismatch (observed live)."""
    try:
        cpu = open("/proc/cpuinfo").read()
        model = "".join(l for l in cpu.splitlines() if "model name" in l)[:200]
    except OSError:
        model = platform.processor()
    key = f"{platform.machine()}-{model}-{os.cpu_count()}"
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on the persistent compilation cache unless one is already
    configured (tests/bench set their own dirs).

    Also honors WSEG_PLATFORM (e.g. "cpu"): env vars like JAX_PLATFORMS are
    pre-empted by the TPU sitecustomize here, so this config-API hook is how
    a parent process (the reproduce driver's smoke test, CI) forces CLI
    subprocesses off the TPU."""
    import jax

    forced = os.environ.get("WSEG_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
    if jax.config.jax_compilation_cache_dir is not None:
        return
    if path is None:
        path = os.environ.get(
            "WSEG_COMPILE_CACHE", f"/tmp/wseg_jax_cache_{_machine_tag()}"
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
