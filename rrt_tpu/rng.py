"""Counter-based, stateless random sampling for the wavefront renderer.

Design (TPU-first, intentionally different from the reference):

The reference threads a mutable xoshiro128+ generator through every thread via
an unsafe thread-local (reference: src/rng.rs:14, src/threadpool.rs:6-24) and
draws vectors by *rejection sampling* loops (src/rng.rs:32-55). Neither
pattern maps to a lockstep vector machine: mutable per-lane state serializes,
and rejection loops have data-dependent trip counts.

Here every random draw is a pure function of (seed, tile_id, bounce,
stream_id): we fold those counters into a threefry key and draw whole batches
at once. Rejection sampling is replaced with closed-form equal-distribution
samplers:

  * unit vector        = gaussian / ||gaussian||
  * in unit sphere     = unit vector * cbrt(U)
  * in unit disc       = sqrt(U) * (cos 2πV, sin 2πV)

All are exactly uniform over their domains (matching the distributions of the
reference's rejection loops, not their draw sequences).
"""

import jax
import jax.numpy as jnp

# Stream ids: every distinct consumer of randomness inside one bounce gets its
# own stream so draws never collide.
STREAM_PIXEL_JITTER = 0
STREAM_LENS = 1
STREAM_TIME = 2
STREAM_SCATTER_A = 3  # lambertian unit vector / metal fuzz / isotropic dir
STREAM_SCATTER_B = 4  # dielectric reflect-vs-refract uniform
STREAM_MEDIUM = 5  # constant-medium distance sampling
STREAM_RR = 6  # (reserved) russian roulette


def batch_key(seed_key: jax.Array, tile_id, pass_id) -> jax.Array:
    """Root key for one (tile, sample-pass) ray batch.

    Tile-addressed keys make any tile re-renderable in isolation from
    (seed, tile_id, pass_id) alone — the recovery/checkpoint story
    (SURVEY.md §5.3/5.4) — and keep results independent of how tiles are
    distributed over the mesh.
    """
    return jax.random.fold_in(jax.random.fold_in(seed_key, tile_id), pass_id)


def draw_key(bkey: jax.Array, bounce, stream: int) -> jax.Array:
    """Key for one batch draw inside one bounce of one batch."""
    return jax.random.fold_in(jax.random.fold_in(bkey, bounce), stream)


def uniform(key: jax.Array, shape) -> jax.Array:
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def unit_vector(key: jax.Array, shape_prefix) -> jax.Array:
    """Uniform direction on S^2, shape (*shape_prefix, 3)."""
    g = jax.random.normal(key, (*shape_prefix, 3), dtype=jnp.float32)
    # Guard the norm so a (measure-zero) all-zero draw cannot produce NaN and
    # so reverse-mode grads through the normalization stay finite.
    n2 = jnp.sum(g * g, axis=-1, keepdims=True)
    return g * jax.lax.rsqrt(jnp.maximum(n2, 1e-20))


def in_unit_sphere(key: jax.Array, shape_prefix) -> jax.Array:
    """Uniform point in the open unit ball, shape (*shape_prefix, 3)."""
    kd, kr = jax.random.split(key)
    d = unit_vector(kd, shape_prefix)
    u = jax.random.uniform(kr, (*shape_prefix, 1), dtype=jnp.float32)
    return d * jnp.cbrt(u)


def in_unit_disc(key: jax.Array, shape_prefix) -> jax.Array:
    """Uniform point in the unit disc; returns (*shape_prefix, 2)."""
    u = jax.random.uniform(key, (*shape_prefix, 2), dtype=jnp.float32)
    r = jnp.sqrt(u[..., 0])
    theta = (2.0 * jnp.pi) * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
