"""Scene-level ray tracing entry points (BVH-accelerated)."""

from __future__ import annotations

import jax.numpy as jnp

from vri_tpu.ops import bvh as bvh_mod
from vri_tpu.ops.intersect import INF, HitRecord
from vri_tpu.registry import SceneBuffers


def trace_scene(scene: SceneBuffers, world_verts: jnp.ndarray,
                origins: jnp.ndarray, dirs: jnp.ndarray,
                t_max=INF, leaf_size: int = 8,
                batch: int = 1 << 16) -> HitRecord:
    """Build (or rebuild) the LBVH over current world-space geometry and
    trace.  Build shapes depend only on padded pool sizes, so the whole thing
    stays inside one jit cache entry across animation."""
    accel = bvh_mod.build_bvh(world_verts, scene.tri_vertices,
                              scene.num_faces, leaf_size=leaf_size)
    return bvh_mod.trace_batched(accel, origins, dirs, t_max=t_max,
                                 batch=batch)


def occluded_scene(scene: SceneBuffers, world_verts: jnp.ndarray,
                   origins: jnp.ndarray, dirs: jnp.ndarray,
                   t_max, leaf_size: int = 8,
                   batch: int = 1 << 16) -> jnp.ndarray:
    rec = trace_scene(scene, world_verts, origins, dirs, t_max=t_max,
                      leaf_size=leaf_size, batch=batch)
    return rec.tri >= 0
