"""Ablate queue-loop components to find per-iteration cost on TPU."""
import time, sys, jax, jax.numpy as jnp
import rrt_tpu
from rrt_tpu import rng
from rrt_tpu.render import RenderConfig, render_image_queue, _shade, pack_scene
from rrt_tpu.camera import generate_rays
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(1200, 800)
Q = 262144
ids = jnp.arange(Q, dtype=jnp.uint32)
keys = rng.sample_keys(jax.random.key(0), ids, 0)
px = (ids % 1200).astype(jnp.int32); py = ((ids // 1200) % 800).astype(jnp.int32)

def timeit(name, f, *args, n=5):
    out = f(*args); jax.block_until_ready(out)
    ts=[]
    for _ in range(n):
        t0=time.time(); out = f(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1000:.2f}ms", flush=True)

timeit("sample_keys(threefry-manual)", jax.jit(lambda i: rng.sample_keys(jax.random.key(0), i, 0)), ids)
timeit("scatter_draws(manual)", jax.jit(lambda k: rng.scatter_draws(k, 3)), keys)
timeit("camera_rays(manual rng)", jax.jit(lambda k: generate_rays(cam, px, py, 1200, 800, k)), keys)

packed = pack_scene(scene)
o = jnp.zeros((Q,3)); d = jnp.ones((Q,3)); tmv = jnp.zeros((Q,))
alive = jnp.ones((Q,), bool)
bounce = jnp.zeros((Q,), jnp.int32)
timeit("full _shade pallas", jax.jit(lambda o,d,t,k,b: _shade(scene, o, d, t, k, b, alive, 1e-3, 50, packed=packed)), o, d, tmv, keys, bounce)
timeit("full _shade XLA", jax.jit(lambda o,d,t,k,b: _shade(scene, o, d, t, k, b, alive, 1e-3, 50, packed=None)), o, d, tmv, keys, bounce)

# scatter-add inside a loop (aliased) vs standalone
acc0 = jnp.zeros((960000, 3))
pix = (ids % 960000).astype(jnp.int32)
contrib = jnp.ones((Q, 3))
@jax.jit
def loop_scatter(acc, pix, contrib):
    def body(i, a):
        return a.at[pix].add(contrib)
    return jax.lax.fori_loop(0, 10, body, acc)
out = loop_scatter(acc0, pix, contrib); jax.block_until_ready(out)
t0=time.time(); out = loop_scatter(acc0, pix, contrib); jax.block_until_ready(out)
print(f"scatter-add in-loop: {(time.time()-t0)*100:.2f}ms/iter", flush=True)

@jax.jit
def loop_cumsum(x):
    def body(i, a):
        return a + jnp.cumsum((x + a[0]).astype(jnp.int32))[-1]
    return jax.lax.fori_loop(0, 10, body, jnp.zeros((), jnp.int32))
xb = (ids % 3 == 0)
out = loop_cumsum(xb); jax.block_until_ready(out)
t0=time.time(); out = loop_cumsum(xb); jax.block_until_ready(out)
print(f"cumsum in-loop: {(time.time()-t0)*100:.2f}ms/iter", flush=True)
