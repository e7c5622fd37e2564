"""Per-frame LOD selection: screen-space-error-driven level choice.

The registry packs discrete decimated levels per mesh (registry.py LOD
tail; native QEM simplifier, native/src/vri_lod.cpp).  Each frame, every
instance picks the COARSEST level whose object-space geometric deviation
projects below ``tau`` pixels at the instance's distance; a per-face
boolean mask then feeds the rasterizer's emission cull, so non-selected
levels never emit (tile, triangle) pairs — the fix for sub-pixel
triangle storms the reference has no answer to either (its visibility
pass walks every draw item full-rate, Source/RenderPass.cpp:642-664).

All of this runs in-jit: one (I, L) elementwise block over the error
table plus one (F,) gather — O(F) integer compares, negligible against
the raster itself.  Only primary visibility consumes the mask; SDF
build / BVH / brute paths keep full-rate geometry via
``scene.num_faces`` (the base count).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vri_tpu.registry import SceneBuffers


def instance_levels(scene: SceneBuffers, eye: jnp.ndarray,
                    focal_px: jnp.ndarray, tau: float = 0.75
                    ) -> jnp.ndarray:
    """Chosen LOD level per instance (I,) i32.

    Projected error of level l for instance i:
        err_px = deviation[i, l] * scale_i * focal_px / dist_i
    where ``scale_i`` is the largest singular-value bound of the
    instance's 3x3 (max row norm — exact for uniform/axis scaling,
    conservative within sqrt(3) for shear), ``dist_i`` the euclidean
    distance from the eye to the instance's world AABB, and ``focal_px``
    pixels per unit tangent (1 / FrameParams.pixel_spread).  Deviations
    grow monotonically with level, so the count of acceptable levels
    minus one IS the coarsest acceptable level.
    """
    errs = scene.instance_lod_error                      # (I, L+1)
    m = scene.instance_transform[:, :3, :3]              # (I, 3, 3)
    scale = jnp.sqrt(jnp.sum(m * m, axis=2).max(axis=1))  # (I,)
    lo, hi = scene.instance_aabb_lo, scene.instance_aabb_hi
    closest = jnp.clip(eye[None, :], lo, hi)
    dist = jnp.linalg.norm(closest - eye[None, :], axis=1)
    # inside/near the AABB: never decimate (dist -> 0 forces level 0)
    px = errs * (scale * focal_px / jnp.maximum(dist, 1e-3))[:, None]
    ok = px <= tau                                       # (I, L+1)
    # deviations are monotone in l but jnp.cumprod makes the prefix
    # property explicit (a level is usable only if every finer one is)
    usable = jnp.cumprod(ok.astype(jnp.int32), axis=1)
    return jnp.maximum(usable.sum(axis=1) - 1, 0).astype(jnp.int32)


def face_mask(scene: SceneBuffers, eye: jnp.ndarray, focal_px: jnp.ndarray,
              tau: float = 0.75) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mask (F,) bool, levels (I,)): True for faces of each instance's
    selected level.  Pass ``scene.num_faces_total`` as the face count to
    the rasterizer alongside this mask."""
    levels = instance_levels(scene, eye, focal_px, tau)
    mask = scene.tri_lod == levels[scene.tri_instance]
    return mask, levels
