"""Persistent XLA compile-cache enablement (round 5).

The axon TPU plugin ignores the ``JAX_COMPILATION_CACHE_DIR``
environment variable — the same initialization-order pathology that
makes it ignore ``JAX_PLATFORMS`` (verify SKILL.md "Critical
environment gotcha"). With only the env var set, jax logs "cache is
disabled/not initialized" and every fresh process re-pays the
multi-minute tunnel compiles for the big train kernels (the round-5
driver-rehearsal bench spent ~115 s recompiling the K=192 north-star
kernels a prior process had already built). Setting the SAME option via
``jax.config.update`` works: measured on the chip, a second process
gets "Persistent compilation cache hit" and executes the cached
program correctly.

Call from every entry point that compiles big kernels (bench.py,
benchmarks/*, the CLI). Deliberately NOT called on library import: a
library must not silently set global jax config for its host process.
"""

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default:
    $JAX_COMPILATION_CACHE_DIR, else <repo>/.jax_cache). Respects a
    cache dir the user already configured — but ALWAYS re-issues
    jax.config.update: the config VALUE being set (e.g. inherited from
    the env var at import) is not sufficient on this backend — the
    update call's hook is what initializes the cache, and without it
    jax logs "cache is disabled/not initialized" despite a non-None
    config value. Re-issuing the same value is harmless and
    idempotent. Returns the effective dir."""
    import jax
    configured = jax.config.jax_compilation_cache_dir
    if configured is not None:
        path = configured  # honor the user's existing choice
    elif path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    return jax.config.jax_compilation_cache_dir
