import time, jax, jax.numpy as jnp
import rrt_tpu
from rrt_tpu.render import render_image_queue
from rrt_tpu.scenes import chap12_scene

cfg = rrt_tpu.RenderConfig(width=1200, height=800, spp=4, max_depth=50,
                           queue_size=262144)
scene, cam = chap12_scene(cfg.width, cfg.height)
t0=time.time()
img, n = render_image_queue(scene, cam, cfg, 0)
jax.block_until_ready(img)
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0=time.time()
    img, n = render_image_queue(scene, cam, cfg, 0)
    jax.block_until_ready(img)
    dt=time.time()-t0
    print(f"run {dt:.2f}s rays {float(n)/1e6:.1f}M -> {float(n)/dt/1e6:.1f} Mrays/s", flush=True)
