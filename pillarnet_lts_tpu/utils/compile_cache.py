"""Persistent XLA compilation cache for the user-facing CLIs.

Cold compile of the flagship serving graph costs ~2 minutes on the TPU
path; the persistent cache makes repeat invocations of the same CLI with
the same config warm-start (reference has no analog — torch caches
nothing across processes, `tools/dist_test.py` recompiles its CUDA graphs
implicitly via the driver cache).

Caveat recorded from the round-2 experiment (docs/ROADMAP.md,
"Environment characteristics"): on THIS environment's axon relay backend
the TPU-side cache hit path is unreliable — writes land but back-to-back
runs were observed recompiling. CPU-forced runs (tests, CI smoke) hit
reliably. Wiring it in is still correct: it is free when missed and saves
minutes when hit, and any real TPU deployment hits it.
"""

import os


def enable_persistent_cache(cache_dir: str = None):
    """Point JAX at a persistent on-disk compilation cache.

    `cache_dir` defaults to $PILLARNET_COMPILE_CACHE or ~/.jax_cache.
    Safe to call before or after backend init; idempotent."""
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("PILLARNET_COMPILE_CACHE")
        or os.path.expanduser("~/.jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything non-trivial; the big graphs take minutes
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
