import time, jax, jax.numpy as jnp
import rrt_tpu
from rrt_tpu.render import render_image_queue, RenderConfig
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(1200, 800)
for Q, K in ((32768, 4), (65536, 4), (65536, 8), (131072, 4)):
    cfg = RenderConfig(width=1200, height=800, spp=4, max_depth=50,
                       queue_size=Q, bounces_per_refill=K, use_pallas=False)
    t0=time.time()
    img, n = render_image_queue(scene, cam, cfg, 0)
    img.block_until_ready()
    c = time.time()-t0
    ts=[]
    for _ in range(2):
        t0=time.time()
        img, n = render_image_queue(scene, cam, cfg, 0)
        img.block_until_ready()
        ts.append(time.time()-t0)
    dt=min(ts)
    print(f"Q={Q} K={K}: compile+run {c:.0f}s run {dt:.2f}s rays {float(n)/1e6:.1f}M -> {float(n)/dt/1e6:.1f} Mrays/s", flush=True)
