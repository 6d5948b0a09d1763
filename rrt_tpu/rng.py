"""Counter-based, stateless random sampling for the wavefront renderer.

Design (TPU-first, intentionally different from the reference):

The reference threads a mutable xoshiro128+ generator through every thread
via an unsafe thread-local (reference: src/rng.rs:14, src/threadpool.rs:6-24)
and draws vectors by *rejection sampling* loops (src/rng.rs:32-55). Neither
pattern maps to a lockstep vector machine: mutable per-lane state serializes,
and rejection loops have data-dependent trip counts.

Here every draw is a pure function of (seed, pixel_id, sample_id, bounce,
stream): a threefry key is folded per *lane*, so the radiance of any
(pixel, sample) is independent of tile shape, batch size, queue compaction
order, or mesh layout — strictly stronger determinism than the reference,
whose output changes with thread count (SURVEY.md §1). It is also the
recovery/checkpoint story: any subset of samples can be re-rendered
in isolation (SURVEY.md §5.3/5.4).

Rejection sampling is replaced with closed-form equal-distribution samplers:

  * unit vector        = gaussian / ||gaussian||
  * in unit sphere     = unit vector * cbrt(U)
  * in unit disc       = sqrt(U) * (cos 2πV, sin 2πV)
"""

import jax
import jax.numpy as jnp

# Stream ids: every distinct consumer of randomness inside one bounce gets
# its own stream so draws never collide. Bounce/stream are combined as
# bounce * 8 + stream, so at most 8 streams.
STREAM_CAMERA = 0  # pixel jitter (2) + lens disc (2) + shutter time (1)
STREAM_SCATTER = 1  # lambertian/metal/isotropic dirs + dielectric choice
STREAM_MEDIUM = 2  # constant-medium distance sampling
STREAM_RR = 3  # (reserved) russian roulette

_NUM_STREAMS = 8


def sample_keys(seed_key: jax.Array, pixel_gid: jax.Array,
                sample_id: jax.Array) -> jax.Array:
    """Per-lane root keys, shape like pixel_gid.

    pixel_gid: global pixel index py*W+px. sample_id: 0..spp-1 (may be a
    scalar or per-lane array)."""
    sample_id = jnp.broadcast_to(jnp.asarray(sample_id, jnp.uint32),
                                 pixel_gid.shape)
    fold2 = lambda p, s: jax.random.fold_in(
        jax.random.fold_in(seed_key, p), s)
    return jax.vmap(fold2)(pixel_gid.astype(jnp.uint32), sample_id)


def _lane_fold(keys: jax.Array, bounce, stream: int) -> jax.Array:
    c = jnp.asarray(bounce, jnp.uint32) * _NUM_STREAMS + stream
    c = jnp.broadcast_to(c, keys.shape)
    return jax.vmap(jax.random.fold_in)(keys, c)


def camera_draws(keys: jax.Array):
    """(jitter (N,2), lens_disc (N,2), time_u (N,)) for the camera ray."""
    k = _lane_fold(keys, 0, STREAM_CAMERA)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (5,)))(k)
    r = jnp.sqrt(u[:, 2])
    theta = (2.0 * jnp.pi) * u[:, 3]
    disc = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return u[:, 0:2], disc, u[:, 4]


def scatter_draws(keys: jax.Array, bounce):
    """(unit_vec (N,3), in_sphere (N,3), choice (N,)) for one bounce."""
    k = _lane_fold(keys, bounce, STREAM_SCATTER)

    def one(kk):
        g = jax.random.normal(kk, (6,))
        u = jax.random.uniform(jax.random.fold_in(kk, 1), (2,))
        return g, u

    g, u = jax.vmap(one)(k)
    unit = _normalize3(g[:, 0:3])
    sphere = _normalize3(g[:, 3:6]) * jnp.cbrt(u[:, 0:1])
    return unit, sphere, u[:, 1]


def medium_draws(keys: jax.Array, bounce, n_media: int):
    """(N, n_media) uniforms for constant-medium distance sampling."""
    k = _lane_fold(keys, bounce, STREAM_MEDIUM)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (n_media,)))(k)


def _normalize3(g):
    n2 = jnp.sum(g * g, axis=-1, keepdims=True)
    return g * jax.lax.rsqrt(jnp.maximum(n2, 1e-20))


# --- batch-level helpers kept for tests/utilities ------------------------


def uniform(key: jax.Array, shape) -> jax.Array:
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def unit_vector(key: jax.Array, shape_prefix) -> jax.Array:
    """Uniform direction on S^2, shape (*shape_prefix, 3)."""
    g = jax.random.normal(key, (*shape_prefix, 3), dtype=jnp.float32)
    return _normalize3(g)


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
