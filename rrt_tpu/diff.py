"""Differentiable rendering: parameter partitioning + training step.

The north star requires pixel gradients w.r.t. geometry (centers, radii),
materials (albedo/fuzz/ior) and camera parameters. The wavefront loop is
reverse-differentiable by construction (scan + per-bounce checkpoint in
render.trace_batch); this module handles the bookkeeping:

  * `partition` extracts the float leaves of SceneArrays as a grad-able
    params dict (integer id/valid tables stay frozen);
  * `make_train_step` builds a jitted fwd+bwd step: render -> scalar loss
    -> grads -> SGD update, optionally sharded over a ("dp","sp") mesh, in
    which case parameter gradients are implicitly all-reduced by the
    shard_map transpose of the replicated in_specs (the "grad psum
    overlapped with replay" of SURVEY.md §2.2).

Discrete sampling decisions (argmin winners, dielectric branch, material
masks) are integer/boolean selects, so sampling is detached exactly as
path-replay backprop prescribes: gradients flow only through continuous
quantities.
"""

import dataclasses

import jax
import jax.numpy as jnp

from .camera import Camera
from .parallel.mesh import render_image_diff_sharded
from .render import RenderConfig, render_image, render_image_diff
from .scene import SceneArrays

# Scene leaves that make sense to optimize (continuous scene parameters).
DIFFERENTIABLE_FIELDS = (
    "sphere_c0", "sphere_dc", "sphere_radius",
    "quad_q", "quad_u", "quad_v",
    "box_center", "box_half",
    "med_center", "med_radius", "med_half", "med_neg_inv_density",
    "mat_fuzz", "mat_ior",
    "tex_color1", "tex_color2", "tex_scale",
    "bg_bottom", "bg_top",
)


def partition(scene: SceneArrays) -> dict:
    """Extract optimizable float leaves."""
    return {f: getattr(scene, f) for f in DIFFERENTIABLE_FIELDS}


def combine(scene: SceneArrays, params: dict) -> SceneArrays:
    return dataclasses.replace(scene, **params)


def render_loss(params: dict, camera: Camera, scene: SceneArrays,
                target, cfg: RenderConfig, seed, mesh=None):
    """MSE between a differentiable render and a target image."""
    s = combine(scene, params)
    if mesh is None:
        img, _ = render_image_diff(s, camera, cfg, seed)
    else:
        # Sharded fused tile train path when in kernel scope (one
        # spill-forward + one replay-adjoint launch per dp-shard, grads
        # all-reduced by the shard_map transpose); XLA scan otherwise.
        img, _ = render_image_diff_sharded(s, camera, cfg, seed, mesh)
    return jnp.mean((img - target) ** 2)


def make_train_step(cfg: RenderConfig, mesh=None, lr: float = 1e-2):
    """Jitted full training step: fwd render + bwd replay + SGD update.

    Returns step(scene, camera, target, seed) ->
        (scene', camera', loss).
    """

    def step(scene: SceneArrays, camera: Camera, target, seed):
        params = partition(scene)
        loss, (gp, gc) = jax.value_and_grad(render_loss,
                                            argnums=(0, 1))(
            params, camera, scene, target, cfg, seed, mesh)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, gp)
        new_camera = jax.tree.map(lambda p, g: p - lr * g, camera, gc)
        return combine(scene, new_params), new_camera, loss

    return jax.jit(step)
