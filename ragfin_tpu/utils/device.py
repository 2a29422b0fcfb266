"""Device/runtime helpers shared by serving, benches, and probes."""

from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's persistent compilation cache at the repo-local
    ``.jax_cache/`` (TPU only).

    A 10M-fact graph-match or 10M-chunk top-k executable takes minutes to
    compile through the axon tunnel (measured: 383 s first query,
    probe_results.log graph_match_10m) but loads from the cache in seconds —
    a serving process must never pay remote compilation for a shape an
    earlier process already built. CPU is excluded: CPU AOT entries are
    machine-feature-specific and the loader warns/SIGILLs on mismatch.

    Returns True if the cache is active.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return True
    import jax

    try:
        if jax.default_backend() != "tpu":
            return False
        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
            )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_ENABLED = True
        return True
    except Exception:
        return False
