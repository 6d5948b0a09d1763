"""Settle the BVH question with device data (VERDICT r1 #4/#5).

Times, on real TPU, closest-sphere-hit for a 64k-ray batch against S
random spheres, three ways:

  * XLA brute force (geometry.intersect_spheres — the (N,S) broadcast)
  * BVH stack traversal (accel.bvh_intersect_spheres)
  * fused megakernel intersect (ops.megakernel.intersect_only)

at S in {512, 4096, 16384}. The crossover (or absence of one) is
recorded in BASELINE.md; accel.py documents the outcome.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bvh_sweep.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from rrt_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()  # env var alone is IGNORED by the axon plugin
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from rrt_tpu import accel, rng
from rrt_tpu.geometry import INF, intersect_spheres
from rrt_tpu.ops import megakernel as mk
from rrt_tpu.scene import SceneBuilder
from rrt_tpu.vec import V3

N = 65536
ITERS = 5


def random_scene(s: int, seed: int = 0):
    rs = np.random.RandomState(seed)
    b = SceneBuilder()
    mat = b.lambertian((0.5, 0.5, 0.5))
    centers = rs.uniform(-50.0, 50.0, size=(s, 3))
    radii = rs.uniform(0.3, 1.5, size=(s,))
    for c, r in zip(centers, radii):
        b.sphere(tuple(c), float(r), mat)
    return b.build()


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(ITERS):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main():
    key = jax.random.key(0)
    o = V3(jnp.zeros((N,)), jnp.zeros((N,)), jnp.full((N,), -120.0))
    d_arr = rng.unit_vector(key, (N,))
    d = V3(d_arr[:, 0], d_arr[:, 1], jnp.abs(d_arr[:, 2]))
    tm = jnp.zeros((N,))
    t_min = jnp.full((N,), 1e-3)
    t_max = jnp.full((N,), INF)
    keys = rng.sample_keys(key, jnp.arange(N, dtype=jnp.uint32), 0)

    for s in (512, 4096, 16384):
        scene = random_scene(s)
        brute = jax.jit(lambda sc, o, d, tm, lo, hi:
                        intersect_spheres(sc, o, d, tm, lo, hi))
        t_brute = timed(brute, scene, o, d, tm, t_min, t_max)

        bvh = accel.build_sphere_bvh(scene)
        # bvh is closed over (its prim_count/topology feed static shapes
        # inside bvh_intersect_spheres).
        trav = jax.jit(lambda sc, o, d, tm, lo, hi:
                       accel.bvh_intersect_spheres(sc, bvh, o, d, tm, lo,
                                                   hi))
        t_bvh = timed(trav, scene, o, d, tm, t_min, t_max)

        sph24 = mk.pack_spheres_full(scene)
        quad24 = jnp.zeros((24, mk.TS), jnp.float32)
        med24 = mk.pack_media(scene)
        rays8 = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, tm,
                           jnp.zeros((N,))], axis=0)
        kern = jax.jit(lambda r8, k, sp, qd, md: mk.intersect_only(
            r8, k, sp, qd, md, moving=False, has_quads=False, n_media=0,
            t_min=1e-3))
        t_kern = timed(kern, rays8, keys, sph24, quad24, med24)

        mrs = N / 1e6
        print(f"S={s:6d}: brute {t_brute*1e3:8.2f} ms ({mrs/t_brute:7.1f}"
              f" Mray/s) | bvh {t_bvh*1e3:8.2f} ms ({mrs/t_bvh:7.1f}) "
              f"| kernel {t_kern*1e3:8.2f} ms ({mrs/t_kern:7.1f})",
              flush=True)


if __name__ == "__main__":
    main()
