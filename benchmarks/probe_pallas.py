import time, jax, jax.numpy as jnp
import rrt_tpu
import rrt_tpu.ops.intersect as oi
from rrt_tpu.render import render_image_queue, RenderConfig
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(1200, 800)

# raw kernel throughput
N = 262144
rays8 = jnp.ones((8, N), jnp.float32)
t_max = jnp.full((N,), 3e38, jnp.float32)
sph8 = oi.pack_spheres(scene)
f = lambda r, t, s: oi.sphere_intersect(r, t, s, moving=False)
t0=time.time(); out = f(rays8, t_max, sph8); jax.block_until_ready(out)
print(f"kernel compile+run {time.time()-t0:.1f}s", flush=True)
ts=[]
for _ in range(5):
    t0=time.time(); out = f(rays8, t_max, sph8); jax.block_until_ready(out); ts.append(time.time()-t0)
dt=min(ts)
print(f"sphere kernel N={N} S=512: {dt*1000:.2f}ms -> {N/dt/1e6:.0f} Mray-tests/s ({N*512/dt/1e9:.1f} Gpairs/s)", flush=True)

# queue + pallas end to end
cfg = RenderConfig(width=1200, height=800, spp=4, max_depth=50,
                   queue_size=262144, use_pallas=True)
t0=time.time()
img, n = render_image_queue(scene, cam, cfg, 0)
jax.block_until_ready(img)
print(f"queue+pallas compile+run {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0=time.time()
    img, n = render_image_queue(scene, cam, cfg, 0)
    jax.block_until_ready(img)
    dt=time.time()-t0
    print(f"run {dt:.2f}s rays {float(n)/1e6:.1f}M -> {float(n)/dt/1e6:.1f} Mrays/s", flush=True)
