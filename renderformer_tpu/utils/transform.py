"""Rigid camera-space transforms.

Replaces the reference's roma dependency
(/root/reference/renderformer/utils/transform.py:9-27) with a direct
rigid-inverse: for c2w = [R | t], the world->camera map is
``x_cam = R^T (x - t)`` and normals transform as ``n_cam = R^T n``.
Always fp32, gradient-stopped (the reference wraps it in no_grad +
fp32 autocast).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def trans_to_cam_coord(
    c2w: jnp.ndarray,
    triangles: jnp.ndarray,
    vns: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """
    Args:
        c2w:       [B, 4, 4] camera-to-world matrices.
        triangles: [B, N, 3, 3] triangle vertices (world space).
        vns:       optional [B, N, 3, 3] vertex normals.

    Returns:
        (triangles_cam [B, N, 3, 3], identity c2w [B, 4, 4], vns_cam or None)
    """
    c2w = jax.lax.stop_gradient(c2w.astype(jnp.float32))
    triangles = jax.lax.stop_gradient(triangles.astype(jnp.float32))

    R = c2w[..., :3, :3]  # [B, 3, 3]
    t = c2w[..., :3, 3]   # [B, 3]

    # R^T (x - t): row-vector form (x - t) @ R
    tris_cam = jnp.einsum('bnvj,bji->bnvi', triangles - t[:, None, None, :], R)

    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), c2w.shape)

    vns_cam = None
    if vns is not None:
        vns = jax.lax.stop_gradient(vns.astype(jnp.float32))
        vns_cam = jnp.einsum('bnvj,bji->bnvi', vns, R)
    return tris_cam, eye, vns_cam
