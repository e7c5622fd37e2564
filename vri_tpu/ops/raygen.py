"""Primary ray generation from the camera matrices.

The reference rasterizes primary visibility (Shaders/Source/Visibility.hlsl)
so it never generates rays; its debug resolve reconstructs clip-space
positions from pixel + matrix instead (Shaders/Source/Debug.hlsl:94-144).
The TPU build is ray-based for primary visibility too (BASELINE north star),
so ray generation is a first-class op: unproject each pixel center through
``inv(view_proj)``.

Pixel convention: pixel (0,0) top-left; NDC y up (see utils/math3d docstring).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_ndc(height: int, width: int, y0: int = 0,
              proj_height: int | None = None):
    """NDC xy coordinates of pixel centers, shape (H, W, 2).

    ``y0``/``proj_height`` select a row band of a taller framebuffer
    (the per-chip view of the row-sharded multi-chip frame)."""
    ph = proj_height or height
    x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    y = 1.0 - (y0 + jnp.arange(height, dtype=jnp.float32) + 0.5) / ph * 2.0
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx, yy], axis=-1)


def camera_rays(inv_view_proj: jnp.ndarray, eye: jnp.ndarray,
                height: int, width: int, y0: int = 0,
                proj_height: int | None = None):
    """Per-pixel world-space rays.

    Returns (origins (H,W,3), directions (H,W,3) normalized).
    Unprojects NDC points at depth 0 (near) and 1 (far) and takes the
    difference, so it is exact for any projection matrix.
    """
    ndc = pixel_ndc(height, width, y0, proj_height)     # (H, W, 2)

    def unproject(z):
        p = jnp.concatenate(
            [ndc, jnp.full(ndc.shape[:-1] + (1,), z, jnp.float32),
             jnp.ones(ndc.shape[:-1] + (1,), jnp.float32)], axis=-1)
        q = p @ inv_view_proj.T
        return q[..., :3] / q[..., 3:4]

    p_near = unproject(0.02)
    p_far = unproject(0.98)
    d = p_far - p_near
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # perspective rays share the eye; orthographic rays start on the near
    # plane (rays parallel <=> unprojected directions identical everywhere)
    is_persp = jnp.linalg.norm(d[0, 0] - d[-1, -1]) > 1e-6
    origins = jnp.where(is_persp, jnp.broadcast_to(eye, d.shape), p_near)
    return origins, d
