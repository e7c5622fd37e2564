"""Ray-triangle intersection (Möller–Trumbore) and a chunked brute-force
tracer.

This is the exactness reference for every accelerated visibility path
(BVH-traversal Pallas kernel, tiled rasterizer): same math, two-sided by
default with optional per-face backface culling (``cull_sign``) carrying
USD doubleSided semantics — the reference sets VK_CULL_MODE_NONE
(Source/Common.cpp:333) and ignores doubleSided; we follow the USD spec.
Brute force scans triangle chunks with ``lax.scan`` so memory stays
bounded and shapes stay static.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)
EPS = jnp.float32(1.0e-9)


@flax.struct.dataclass
class HitRecord:
    """Per-ray nearest hit. ``tri == -1`` is a miss (t == INF)."""

    t: jnp.ndarray      # (N,) f32
    tri: jnp.ndarray    # (N,) i32 global triangle id, -1 = miss
    u: jnp.ndarray      # (N,) f32 barycentric of corner 1
    v: jnp.ndarray      # (N,) f32 barycentric of corner 2
    # () i32 — number of capacity-overflowed raster tiles (bins whose
    # triangle-group list was truncated; geometry may be missing there).
    # None for tracers that cannot overflow (brute/BVH).
    overflow: jnp.ndarray | None = None


def gather_triangles(world_positions: jnp.ndarray, tri_vertices: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(V,3) world verts + (F,3) indices -> (v0, e1, e2) each (F,3)."""
    p = world_positions[tri_vertices]          # (F, 3, 3)
    v0 = p[:, 0]
    return v0, p[:, 1] - v0, p[:, 2] - v0


def moller_trumbore(o, d, v0, e1, e2, t_min=1e-4, t_max=INF):
    """Batched Möller–Trumbore.

    o, d: (..., 1, 3) rays;  v0, e1, e2: (T, 3) triangles.
    Returns t, u, v, hit — each (..., T).
    """
    pvec = jnp.cross(d, e2)                     # (..., T, 3)
    det = jnp.sum(pvec * e1, axis=-1)           # (..., T)
    inv_det = jnp.where(jnp.abs(det) > EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(qvec * d, axis=-1) * inv_det
    t = jnp.sum(qvec * e2, axis=-1) * inv_det
    hit = ((jnp.abs(det) > EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > t_min) & (t < t_max))
    return t, u, v, hit


def trace_brute(origins: jnp.ndarray, dirs: jnp.ndarray,
                v0: jnp.ndarray, e1: jnp.ndarray, e2: jnp.ndarray,
                num_faces: jnp.ndarray, chunk: int = 512,
                t_max=INF, cull_sign=None) -> HitRecord:
    """Nearest-hit over all triangles, chunked.

    origins, dirs: (N, 3); triangle arrays (F, 3) padded — faces at index >=
    ``num_faces`` are ignored.  ``t_max`` may be scalar or per-ray (N,).
    ``cull_sign`` ((F,) f32, optional) applies USD doubleSided semantics:
    0 = two-sided, ±1 = keep only faces whose winding orientation (sign of
    the Möller–Trumbore determinant) matches — the same per-face signs the
    raster paths consume, so brute/raster agree exactly on culled scenes.
    """
    n = origins.shape[0]
    t_max = jnp.asarray(t_max, jnp.float32)
    t_max_row = t_max[:, None] if t_max.ndim == 1 else t_max
    t_max_init = jnp.broadcast_to(t_max, (n,))
    f = v0.shape[0]
    chunk = min(chunk, f)
    pad = (-f) % chunk
    if pad:
        padf = lambda a: jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)])
        v0, e1, e2 = padf(v0), padf(e1), padf(e2)
    num_chunks = (f + pad) // chunk

    o = origins[:, None, :]
    d = dirs[:, None, :]
    init = HitRecord(t=t_max_init,
                     tri=jnp.full((n,), -1, jnp.int32),
                     u=jnp.zeros((n,), jnp.float32),
                     v=jnp.zeros((n,), jnp.float32))

    v0c = v0.reshape(num_chunks, chunk, 3)
    e1c = e1.reshape(num_chunks, chunk, 3)
    e2c = e2.reshape(num_chunks, chunk, 3)
    if cull_sign is not None:
        cs = cull_sign
        if pad:
            cs = jnp.concatenate([cs, jnp.zeros((pad,), cs.dtype)])
        csc = cs.reshape(num_chunks, chunk)
    else:
        csc = jnp.zeros((num_chunks, 1), jnp.float32)

    def body(best, inputs):
        ci, cv0, ce1, ce2, ccs = inputs
        t, u, v, hit = moller_trumbore(o, d, cv0, ce1, ce2, t_max=t_max_row)
        tri_ids = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = hit & (tri_ids[None, :] < num_faces)
        if cull_sign is not None:
            # MT det = dot(cross(d, e2), e1) = -dot(d, n), n = cross(e1, e2):
            # det > 0 iff the CCW front side faces the ray
            det = jnp.sum(jnp.cross(d, ce2) * ce1, axis=-1)
            valid &= (ccs[None, :] == 0.0) | (det * ccs[None, :] > 0.0)
        t = jnp.where(valid, t, INF)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        closer = tk < best.t
        take = lambda a: jnp.take_along_axis(a, k[:, None], axis=-1)[:, 0]
        best = HitRecord(
            t=jnp.where(closer, tk, best.t),
            tri=jnp.where(closer, tri_ids[k], best.tri),
            u=jnp.where(closer, take(u), best.u),
            v=jnp.where(closer, take(v), best.v))
        return best, None

    xs = (jnp.arange(num_chunks, dtype=jnp.int32), v0c, e1c, e2c, csc)
    best, _ = jax.lax.scan(body, init, xs)
    return best


def any_hit_brute(origins: jnp.ndarray, dirs: jnp.ndarray,
                  v0, e1, e2, num_faces, t_max, chunk: int = 512
                  ) -> jnp.ndarray:
    """Shadow-ray occlusion test: True where any triangle blocks within t_max."""
    rec = trace_brute(origins, dirs, v0, e1, e2, num_faces, chunk=chunk,
                      t_max=t_max)
    return rec.tri >= 0
