"""Pinhole ray generation (Blender camera convention, -Z forward).

Parity with /root/reference/renderformer/utils/ray_generator.py:13-50:
pixel centers at 0.5..res-0.5, ``fx = res/2 / tan(fov/2)``, directions
``[(x-cx)/fx, -(y-cy)/fy, -1]`` rotated by the c2w rotation and L2
normalized.  Pure fp32 function.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def generate_rays(
    c2w: jnp.ndarray, fov: jnp.ndarray, img_res: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Args:
        c2w: [*B, 4, 4] camera-to-world matrices.
        fov: [*B, 1] field of view in **radians**.
        img_res: image resolution (square).

    Returns:
        rays_o: [*B, 3] camera origins.
        rays_d: [*B, H, W, 3] unit ray directions.
    """
    c2w = c2w.astype(jnp.float32)
    fov = fov.astype(jnp.float32)
    batch_shape = c2w.shape[:-2]

    lin = np.linspace(0.5, img_res - 0.5, img_res, dtype=np.float32)
    x, y = np.meshgrid(lin, lin, indexing='xy')  # [H, W] each
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    cx = cy = img_res / 2.0
    # fov[..., 0, None, None] -> [*B, 1, 1]
    f = img_res / 2.0 / jnp.tan(0.5 * fov[..., 0, None, None])

    bcast = (1,) * len(batch_shape)
    x = x.reshape(bcast + x.shape)
    y = y.reshape(bcast + y.shape)
    dirs = jnp.stack(
        [(x - cx) / f, -(y - cy) / f, -jnp.ones_like(x * f)], axis=-1
    )  # [*B, H, W, 3]

    R = c2w[..., :3, :3]  # [*B, 3, 3]
    t = c2w[..., :3, 3]   # [*B, 3]

    # world_dir_i = sum_j R[i, j] * dir_j
    rays_d = jnp.einsum('...ij,...hwj->...hwi', R, dirs)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return t, rays_d
