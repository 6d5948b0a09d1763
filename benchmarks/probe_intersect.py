import time, jax, jax.numpy as jnp
from rrt_tpu.geometry import intersect_spheres
from rrt_tpu.render import _bounce_body
from rrt_tpu.scenes import chap12_scene
from rrt_tpu import rng
from rrt_tpu.camera import generate_rays

scene, cam = chap12_scene(1200, 800)
N = 262144
ids = jnp.arange(N, dtype=jnp.int32)
px, py = ids % 1200, (ids // 1200) % 800
bkey = rng.batch_key(jax.random.key(0), 0, 0)
o, d, tm = generate_rays(cam, px, py, 1200, 800, bkey)
t_min = jnp.full((N,), 1e-3, jnp.float32)
t_max = jnp.full((N,), 3e38, jnp.float32)

f = jax.jit(intersect_spheres)
out = f(scene, o, d, tm, t_min, t_max); jax.block_until_ready(out)
ts = []
for _ in range(5):
    t0=time.time(); out = f(scene, o, d, tm, t_min, t_max); jax.block_until_ready(out); ts.append(time.time()-t0)
print(f"intersect_spheres N={N} S={scene.n_spheres}: {min(ts)*1000:.2f}ms -> {N/min(ts)/1e6:.0f} Mrays/s (intersect only)", flush=True)

def body(scene, o, d, tm, bkey):
    n = o.shape[0]
    carry = (o, d, tm, jnp.ones((n,3)), jnp.zeros((n,3)), jnp.ones((n,),bool), jnp.zeros((),jnp.int32))
    return _bounce_body(scene, 1e-3, bkey, carry, 0, 50)
fb = jax.jit(body)
out = fb(scene, o, d, tm, bkey); jax.block_until_ready(out)
ts=[]
for _ in range(5):
    t0=time.time(); out = fb(scene, o, d, tm, bkey); jax.block_until_ready(out); ts.append(time.time()-t0)
print(f"full bounce body: {min(ts)*1000:.2f}ms -> {N/min(ts)/1e6:.0f} Mrays/s-bounce", flush=True)
