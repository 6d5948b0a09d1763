"""rrt_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/Pallas rebuild of the capabilities of jfroy/rrt (RTIOW +
RTTNW), designed wavefront-first for TPU: matmul-form intersection on the
MXU, branchless material scatter on the VPU, counter-based threefry
randomness, shard_map data/sample parallelism over a device mesh, and
path-replay-style rematerialized gradients.
"""

from .camera import Camera, generate_rays
from .geometry import Hit, intersect_all, make_hit
from .materials import Scatter, scatter
from .render import (RenderConfig, background_color, render_image,
                     render_image_diff, render_image_queue,
                     render_image_tiles, render_tile, tonemap,
                     trace_batch, trace_queue, trace_tiles,
                     trace_tiles_diff)
from .scene import SceneArrays, SceneBuilder
from .vec import V3

__version__ = "0.1.0"
