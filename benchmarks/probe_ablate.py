"""Per-iteration costs measured INSIDE device loops (tunnel dispatch
latency makes standalone call timing meaningless)."""
import time, jax, jax.numpy as jnp
import rrt_tpu
from rrt_tpu import rng
from rrt_tpu.render import _shade, pack_scene
from rrt_tpu.camera import generate_rays
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(1200, 800)
Q = 262144
ITERS = 20
ids = jnp.arange(Q, dtype=jnp.uint32)
keys = rng.sample_keys(jax.random.key(0), ids, 0)
px = (ids % 1200).astype(jnp.int32); py = ((ids // 1200) % 800).astype(jnp.int32)
packed = pack_scene(scene)

def loop_time(name, body0, carry0):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, ITERS, body0, c)
    out = run(carry0); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0=time.time(); out = run(carry0); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)/ITERS*1000:.2f}ms/iter", flush=True)

o = jnp.zeros((Q,3)); d = jnp.ones((Q,3)); tmv = jnp.zeros((Q,))
alive = jnp.ones((Q,), bool)

# 1. draws only
def b_draws(i, c):
    u, s, ch = rng.scatter_draws(keys, i)
    return c + u[0,0] + s[0,0] + ch[0]
loop_time("scatter_draws", b_draws, jnp.zeros(()))

# 2. camera gen only
def b_cam(i, c):
    o2, d2, t2 = generate_rays(cam, px, py, 1200, 800, keys)
    return c + o2[0,0] + d2[0,0] + t2[0]
loop_time("camera_rays", b_cam, jnp.zeros(()))

# 3. kernel intersect only
import rrt_tpu.ops.intersect as oi
rays8 = oi.pack_rays(o, d, tmv, jnp.full((Q,), 1e-3))
tmax = jnp.full((Q,), 3e38)
def b_kern(i, c):
    t, idx = oi.sphere_intersect(rays8 + c, tmax, packed["spheres"], moving=False)
    return c + t[0]*0
loop_time("pallas sphere kernel", b_kern, jnp.zeros(()))

# 4. full shade (pallas)
def b_shade(i, c):
    contrib, no, nd, att, sv = _shade(scene, o + c, d, tmv, keys, i, alive, 1e-3, 50, packed=packed)
    return c + contrib[0,0]*0 + no[0,0]*0
loop_time("full _shade (pallas)", b_shade, jnp.zeros(()))

# 5. full shade (XLA)
def b_shade_x(i, c):
    contrib, no, nd, att, sv = _shade(scene, o + c, d, tmv, keys, i, alive, 1e-3, 50, packed=None)
    return c + contrib[0,0]*0
loop_time("full _shade (XLA)", b_shade_x, jnp.zeros(()))

# 6. refill math (cumsum + gathers)
def b_refill(i, c):
    dead = (ids % (i+2)) == 0
    ranks = jnp.cumsum(dead.astype(jnp.int32)) - 1
    sidx = c.astype(jnp.int32) + ranks
    p_new = (jnp.minimum(sidx, 10**6) % 960000)
    return c + p_new[0]*0 + ranks[-1]*0
loop_time("refill cumsum", b_refill, jnp.zeros((), jnp.float32))

# 7. scatter-add
acc0 = jnp.zeros((960000, 3))
pix = (ids % 960000).astype(jnp.int32)
contrib = jnp.ones((Q, 3))
def b_scat(i, a):
    return a.at[pix].add(contrib)
loop_time("scatter-add", b_scat, acc0)
