"""Software texture filtering: mip pyramids + trilinear sampling with
ray-cone LOD.

SURVEY §7 hard part (c): TPU has no hardware samplers, so filtering is
explicit — mip levels are precomputed by 2x2 box reduction and packed into a
single flat per-slot atlas (so a trilinear sample is exactly 8 gathers with
computed flat indices, regardless of level); per-pixel LOD comes from the
ray-cone footprint (hit distance x pixel spread, converted to texel units
via the triangle's UV density).  The reference samples a single level
through a Vulkan combined-image-sampler (Debug.hlsl:53-57,151-161); mips
give the TPU path *better* minification quality than the reference's
debug-resolve sampling.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp


def num_mip_levels(resolution: int) -> int:
    return int(math.log2(resolution)) + 1


@flax.struct.dataclass
class MipAtlas:
    """Mip chain flattened per texture slot: level l occupies
    flat[:, offsets[l] : offsets[l] + sizes[l]**2]."""

    flat: jnp.ndarray      # (S, K, C) — C=3 RGB or 4 RGBA
    offsets: jnp.ndarray   # (L,) i32
    sizes: jnp.ndarray     # (L,) i32


def build_mip_atlas(textures: jnp.ndarray) -> MipAtlas:
    """(S, T, T, C) -> flat mip atlas (2x2 box-filter chain down to 1x1).

    Scene-static: built once at registry.commit (SceneBuffers.mip_atlas),
    never inside a jitted frame."""
    s, t, c = textures.shape[0], textures.shape[1], textures.shape[3]
    levels = [textures]
    cur = textures
    while cur.shape[1] > 1:
        tt = cur.shape[1]
        cur = cur.reshape(s, tt // 2, 2, tt // 2, 2, c).mean(axis=(2, 4))
        levels.append(cur)
    flat = jnp.concatenate(
        [lv.reshape(s, lv.shape[1] * lv.shape[1], c) for lv in levels],
        axis=1)
    sizes = [lv.shape[1] for lv in levels]
    offsets = [0]
    for sz in sizes[:-1]:
        offsets.append(offsets[-1] + sz * sz)
    return MipAtlas(flat=flat,
                    offsets=jnp.asarray(offsets, jnp.int32),
                    sizes=jnp.asarray(sizes, jnp.int32))


def _bilinear_level(atlas: MipAtlas, slot: jnp.ndarray, uv: jnp.ndarray,
                    level: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at a per-pixel integer level (N,)."""
    size = atlas.sizes[level]                       # (N,)
    off = atlas.offsets[level]
    szf = size.astype(jnp.float32)
    s = jnp.clip(slot, 0, atlas.flat.shape[0] - 1)
    u = (uv[:, 0] % 1.0) * szf - 0.5
    v = (1.0 - uv[:, 1] % 1.0) * szf - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]

    def tap(du, dv):
        ui = jnp.clip(u0.astype(jnp.int32) + du, 0, size - 1)
        vi = jnp.clip(v0.astype(jnp.int32) + dv, 0, size - 1)
        return atlas.flat[s, off + vi * size + ui]

    return ((tap(0, 0) * (1 - fu) + tap(1, 0) * fu) * (1 - fv)
            + (tap(0, 1) * (1 - fu) + tap(1, 1) * fu) * fv)


def sample_trilinear(atlas: MipAtlas, slot: jnp.ndarray, uv: jnp.ndarray,
                     lod: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sampling: 8 gathers per pixel, any per-pixel LOD."""
    n_levels = atlas.sizes.shape[0]
    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_levels - 1)
    frac = (lod - lo.astype(jnp.float32))[:, None]
    c0 = _bilinear_level(atlas, slot, uv, lo)
    c1 = _bilinear_level(atlas, slot, uv, hi)
    return c0 * (1.0 - frac) + c1 * frac


def ray_cone_lod(t: jnp.ndarray, cos_incidence: jnp.ndarray,
                 texel_per_world: jnp.ndarray,
                 pixel_spread) -> jnp.ndarray:
    """Continuous LOD from the ray-cone footprint.

    t: hit distance; cos_incidence: |n.d|; texel_per_world: the triangle's
    texel density (texels per world unit); pixel_spread: world units of
    footprint per unit distance (2*tan(fov_y/2)/height for primary rays).
    """
    footprint = t * pixel_spread / jnp.maximum(cos_incidence, 0.25)
    return jnp.log2(jnp.maximum(footprint * texel_per_world, 1e-6))


def triangle_texel_density(p0, p1, p2, uv0, uv1, uv2, tex_res: int
                           ) -> jnp.ndarray:
    """Texels per world unit for a triangle (sqrt of uv-area/world-area)."""
    e1 = p1 - p0
    e2 = p2 - p0
    world_area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    d1 = uv1 - uv0
    d2 = uv2 - uv0
    uv_area = 0.5 * jnp.abs(d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0])
    return jnp.sqrt(uv_area / jnp.maximum(world_area, 1e-12)) * tex_res
