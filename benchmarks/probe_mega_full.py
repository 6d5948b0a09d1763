import os, time
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import rrt_tpu
from rrt_tpu.render import render_image_queue, RenderConfig
from rrt_tpu.scenes import chap12_scene

scene, cam = chap12_scene(1200, 800)
for K in (4,):
    cfg = RenderConfig(width=1200, height=800, spp=8, max_depth=50,
                       queue_size=131072, bounces_per_refill=K,
                       use_megakernel=True)
    t0=time.time()
    img, n = render_image_queue(scene, cam, cfg, 0)
    img.block_until_ready()
    print(f"K={K} compile+run {time.time()-t0:.1f}s", flush=True)
    ts=[]
    for _ in range(3):
        t0=time.time()
        img, n = render_image_queue(scene, cam, cfg, 0)
        # force a real sync by pulling a value
        _ = float(img[0,0,0])
        ts.append(time.time()-t0)
    dt=min(ts)
    print(f"K={K} run {dt:.3f}s rays {float(n)/1e6:.1f}M -> {float(n)/dt/1e6:.1f} Mrays/s", flush=True)
    np.save("/tmp/mega_img.npy", np.asarray(img))
