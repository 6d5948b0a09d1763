"""Batched texture evaluation: solid / checker / perlin-marble / image.

The reference has no textures (gap inventory, SURVEY.md §2.4); semantics
follow RTTNW chs. 4-6. Evaluation is a branchless select over texture type
for a whole ray batch; Perlin noise uses the book's gradient-lattice scheme
with permutation tables stored as device arrays (8 small gathers per bounce
batch — only paid when a scene actually samples noise).
"""

import jax
import jax.numpy as jnp

from .scene import (TEX_CHECKER, TEX_IMAGE, TEX_PERLIN, TEX_SOLID,
                    SceneArrays)


def perlin_noise(scene: SceneArrays, p):
    """Gradient-lattice noise in [-1,1], shape (N,). RTTNW ch. 5 scheme:
    hermite-smoothed trilinear interpolation of corner-gradient dots."""
    pf = jnp.floor(p)
    u = p - pf  # (N,3) in [0,1)
    ijk = pf.astype(jnp.int32)  # (N,3)
    uu = u * u * (3.0 - 2.0 * u)  # hermite smoothing

    perm_x = scene.perlin_perm[0]
    perm_y = scene.perlin_perm[1]
    perm_z = scene.perlin_perm[2]

    acc = jnp.zeros(p.shape[0], jnp.float32)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                hx = perm_x[(ijk[:, 0] + di) & 255]
                hy = perm_y[(ijk[:, 1] + dj) & 255]
                hz = perm_z[(ijk[:, 2] + dk) & 255]
                grad = scene.perlin_randvec[hx ^ hy ^ hz]  # (N,3)
                weight = jnp.stack(
                    [u[:, 0] - di, u[:, 1] - dj, u[:, 2] - dk], axis=-1)
                w = ((uu[:, 0] if di else 1.0 - uu[:, 0])
                     * (uu[:, 1] if dj else 1.0 - uu[:, 1])
                     * (uu[:, 2] if dk else 1.0 - uu[:, 2]))
                acc = acc + w * jnp.sum(grad * weight, axis=-1)
    return acc


def perlin_turb(scene: SceneArrays, p, depth: int = 7):
    """Turbulence: sum of |noise| octaves (RTTNW ch. 5.6)."""
    acc = jnp.zeros(p.shape[0], jnp.float32)
    temp = p
    weight = 1.0
    for _ in range(depth):
        acc = acc + weight * jnp.abs(perlin_noise(scene, temp))
        temp = temp * 2.0
        weight = weight * 0.5
    return acc


def texture_value(scene: SceneArrays, tex_id, u, v, p):
    """Evaluate texture tex_id (N,) at surface uv (N,),(N,) and point p
    (N,3) -> color (N,3)."""
    ttype = scene.tex_type[tex_id]
    c1 = scene.tex_color1[tex_id]
    c2 = scene.tex_color2[tex_id]
    scale = scene.tex_scale[tex_id]

    # Checker (RTTNW ch. 4.3 sine form).
    s = (jnp.sin(scale * p[:, 0]) * jnp.sin(scale * p[:, 1])
         * jnp.sin(scale * p[:, 2]))
    checker = jnp.where((s < 0.0)[:, None], c2, c1)

    # Marble (RTTNW ch. 5.7): modulate phase with turbulence. Only emitted
    # into the graph when the scene statically contains a perlin texture.
    if scene.has_perlin:
        turb = perlin_turb(scene, p)
        marble = (0.5 * (1.0 + jnp.sin(scale * p[:, 2] + 10.0 * turb))
                  )[:, None] * c1
    else:
        marble = c1

    # Image texture: nearest lookup into the shared atlas.
    if scene.has_images:
        img_idx = jnp.maximum(scene.tex_image[tex_id], 0)
        n_img, ah, aw = (scene.images.shape[0], scene.images.shape[1],
                         scene.images.shape[2])
        uc = jnp.clip(u, 0.0, 1.0)
        vc = 1.0 - jnp.clip(v, 0.0, 1.0)
        xi = jnp.clip((uc * aw).astype(jnp.int32), 0, aw - 1)
        yi = jnp.clip((vc * ah).astype(jnp.int32), 0, ah - 1)
        image = scene.images[jnp.clip(img_idx, 0, n_img - 1), yi, xi]
    else:
        image = c1

    out = jnp.where((ttype == TEX_SOLID)[:, None], c1,
                    jnp.where((ttype == TEX_CHECKER)[:, None], checker,
                              jnp.where((ttype == TEX_PERLIN)[:, None],
                                        marble, image)))
    return out
