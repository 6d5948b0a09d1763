import time, jax, jax.numpy as jnp
import rrt_tpu
from rrt_tpu import rng
from rrt_tpu.render import _shade, pack_scene, RenderConfig
from rrt_tpu.camera import generate_rays
from rrt_tpu.scenes import chap12_scene
from rrt_tpu.vec import V3

scene, cam = chap12_scene(1200, 800)
Q = 262144
ITERS = 20
ids = jnp.arange(Q, dtype=jnp.uint32)
keys = jnp.asarray(rng.sample_keys(jax.random.key(0), ids, 0))
px = (ids % 1200).astype(jnp.int32); py = ((ids // 1200) % 800).astype(jnp.int32)
packed = pack_scene(scene)
o = V3.zeros((Q,)); d = V3.ones((Q,)); tmv = jnp.zeros((Q,))
alive = jnp.ones((Q,), bool)
bounce0 = jnp.zeros((Q,), jnp.int32)

def loop_time(name, body0, carry0):
    run = jax.jit(lambda c: jax.lax.fori_loop(0, ITERS, body0, c))
    out = run(carry0); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0=time.time(); out = run(carry0); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)/ITERS*1000:.2f}ms/iter", flush=True)

def b_shade_pallas(i, c):
    contrib, no, nd, att, sv = _shade(scene, o + c, d, tmv, keys, bounce0 + i, alive, 1e-3, 50, packed=packed)
    return c + contrib.x[0]*0 + no.x[0]*0
loop_time("shade pallas scalar-bounce... per-lane bounce", b_shade_pallas, jnp.zeros(()))

def b_shade_xla(i, c):
    contrib, no, nd, att, sv = _shade(scene, o + c, d, tmv, keys, bounce0 + i, alive, 1e-3, 50, packed=None)
    return c + contrib.x[0]*0
loop_time("shade XLA", b_shade_xla, jnp.zeros(()))

def b_cam(i, c):
    o2, d2, t2 = generate_rays(cam, px, py, 1200, 800, keys)
    return c + o2.x[0] + t2[0]
loop_time("camera", b_cam, jnp.zeros(()))

def b_draws(i, c):
    u, s, ch = rng.scatter_draws(keys, bounce0 + i)
    return c + u.x[0] + ch[0]
loop_time("draws(perlane bounce)", b_draws, jnp.zeros(()))

acc = V3.zeros((960000,))
pend = V3.ones((Q,))
pix = (ids % 960000).astype(jnp.int32)
def b_flush(i, a):
    return V3(a.x.at[pix].add(pend.x, mode="drop"),
              a.y.at[pix].add(pend.y, mode="drop"),
              a.z.at[pix].add(pend.z, mode="drop"))
loop_time("3x1D scatter-add", b_flush, acc)
