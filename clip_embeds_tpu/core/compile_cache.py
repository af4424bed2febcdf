"""Persistent XLA compilation cache.

Compiles over the axon remote-TPU tunnel are pathologically slow (minutes
for a ViT-L serving graph; ~2 min even for a toy 8-matmul jit), and the
process-local executable cache dies with the process. JAX's persistent
compilation cache serializes compiled executables to disk keyed by
HLO+platform — measured here: 120 s cold -> 2.4 s warm across processes.

Every entry point (bench.py, __graft_entry__.py, the CLIs) calls
enable_persistent_cache() so repeat invocations — including the driver's
end-of-round bench run — hit the warm cache.
"""

from __future__ import annotations

import logging
import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Point jax at an on-disk compilation cache; True if enabled.

    TPU-only: local CPU compiles are fast anyway, and reloading CPU AOT
    executables across differing host-feature flags risks SIGILL (observed
    as a loud cpu_aot_loader warning)."""
    import jax

    cache_dir = (cache_dir or os.environ.get("CLIP_EMBEDS_JAX_CACHE")
                 or _DEFAULT_DIR)
    try:
        if jax.default_backend() != "tpu":
            return False
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception as exc:  # pragma: no cover - best effort
        logging.warning("persistent compile cache unavailable: %s", exc)
        return False
