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
    cache dir the user already configured. Returns the effective dir."""
    import jax
    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", path)
    return jax.config.jax_compilation_cache_dir
