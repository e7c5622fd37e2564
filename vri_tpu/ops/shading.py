"""Attribute reconstruction + shading.

TPU equivalent of the reference's fullscreen "debug" resolve pass
(Shaders/Source/Debug.hlsl): from a visibility sample (triangle id +
barycentrics), fetch the three vertices/uvs "bindlessly" (= jnp gathers into
the packed pools), interpolate attributes, and shade.  Where the reference
re-derives perspective-correct barycentrics from clip-space positions
(Shaders/Source/Barycentric.hlsl:17-56) because its raster pass only stored
ids, the ray tracer already has exact barycentrics; the rasterizer path
computes them the reference's way in ops/rasterize.py.

Includes the direct-light loop plus the debug false-color modes
(Include/RenderPass.h:36-45).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from vri_tpu.config import DebugMode
from vri_tpu.ops.intersect import HitRecord
from vri_tpu.registry import SceneBuffers


@flax.struct.dataclass
class GBuffer:
    """Per-ray reconstructed surface attributes (the G-buffer the reference
    drafted in Shaders/Source/GBuffer.hlsl but never wired up)."""

    position: jnp.ndarray   # (N, 3) world hit position
    normal: jnp.ndarray     # (N, 3) geometric normal (faces the ray)
    albedo: jnp.ndarray     # (N, 3)
    emissive: jnp.ndarray   # (N, 3)
    uv: jnp.ndarray         # (N, 2)
    depth: jnp.ndarray      # (N,) ray t (INF at miss)
    instance: jnp.ndarray   # (N,) i32, -1 = miss
    prim: jnp.ndarray       # (N,) i32 triangle id within instance, -1 = miss
    material: jnp.ndarray   # (N,) i32
    valid: jnp.ndarray      # (N,) bool


def sample_texture_bilinear(textures: jnp.ndarray, slot: jnp.ndarray,
                            uv: jnp.ndarray) -> jnp.ndarray:
    """Software bilinear sampling via gathers (SURVEY §7 hard part (c):
    no hardware samplers on TPU).

    textures: (S, T, T, C); slot: (N,) i32 (invalid slots clamp to 0);
    uv: (N, 2) with wrap addressing. Returns (N, C).
    """
    size = textures.shape[1]
    s = jnp.clip(slot, 0, textures.shape[0] - 1)
    # wrap, then map uv -> texel space. v flips: uv origin bottom-left,
    # texel row 0 is the image top.
    u = (uv[:, 0] % 1.0) * size - 0.5
    v = (1.0 - uv[:, 1] % 1.0) * size - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]

    def tap(du, dv):
        ui = jnp.clip(u0.astype(jnp.int32) + du, 0, size - 1)
        vi = jnp.clip(v0.astype(jnp.int32) + dv, 0, size - 1)
        return textures[s, vi, ui]

    return ((tap(0, 0) * (1 - fu) + tap(1, 0) * fu) * (1 - fv)
            + (tap(0, 1) * (1 - fu) + tap(1, 1) * fu) * fv)


def resolve_gbuffer(scene: SceneBuffers, world_verts: jnp.ndarray,
                    hit: HitRecord, origins: jnp.ndarray,
                    dirs: jnp.ndarray,
                    pixel_spread: jnp.ndarray | float | None = None
                    ) -> GBuffer:
    """Reconstruct surface attributes from visibility samples by indexed
    gathers into the packed pools (the reference's bindless fetch,
    Debug.hlsl:38-57,94-144).

    ``pixel_spread`` (2*tan(fov_y/2)/height) enables mip-mapped trilinear
    texture sampling with ray-cone LOD; None falls back to bilinear level 0.
    """
    tri = jnp.maximum(hit.tri, 0)
    valid = hit.tri >= 0

    # ids ride f32 table rows, exact only to 2^24 — fail loudly at trace
    # time if any pool could outgrow that (ADVICE r2)
    for nm, cap in (("faces", scene.tri_vertices.shape[0]),
                    ("instances", scene.instance_transform.shape[0]),
                    ("materials", scene.mat_base_color.shape[0])):
        assert cap < (1 << 24), \
            f"{nm} cap {cap} exceeds f32-exact id range (2^24)"

    # ONE wide row gather per pixel: per-triangle attributes are packed
    # into a (F, 29) table first (F is small; per-pixel work is what
    # scales), so the per-pixel fetch is a single contiguous-row gather
    # instead of six narrow per-index gathers — the same fix that took the
    # raster resolve from 287 to ~20 ms.  Rows: p0 p1 p2 (9) | uv0 uv1
    # uv2 (6) | geometric n (3) | albedo (3) | emissive (3) | inst mat
    # prim_local tex_slot cutoff (5).
    fverts = world_verts[scene.tri_vertices]           # (F, 3, 3)
    fp0, fp1, fp2 = fverts[:, 0], fverts[:, 1], fverts[:, 2]
    fn = jnp.cross(fp1 - fp0, fp2 - fp0)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True),
                          1e-12)
    finst = scene.tri_instance
    fmat = scene.instance_material[finst]
    fprim = (jnp.arange(scene.tri_vertices.shape[0], dtype=jnp.int32)
             - scene.instance_face_offset[finst])
    fcut = (scene.mat_cutoff[fmat] if scene.mat_cutoff is not None
            else jnp.zeros_like(fmat, jnp.float32))
    # shared-prototype layout: per-corner st lives in the prototype pool
    f_uv = (scene.tri_uv if scene.tri_proto is None
            else scene.tri_uv[scene.tri_proto])
    table = jnp.concatenate(
        [fverts.reshape(-1, 9), f_uv.reshape(-1, 6), fn,
         scene.mat_base_color[fmat], scene.mat_emissive[fmat],
         finst.astype(jnp.float32)[:, None],
         fmat.astype(jnp.float32)[:, None],
         fprim.astype(jnp.float32)[:, None],
         scene.mat_texture[fmat].astype(jnp.float32)[:, None],
         fcut[:, None]],
        axis=1)                                        # (F, 29)

    # block-transposed field extraction: naive column slices of the
    # lane-padded (N, 29) gather cost ~1.4 ms EACH at 1080p (see
    # ops/rowgather.py); table padded to 32 columns for tile-exact
    # transposes
    from vri_tpu.ops.rowgather import gather_rows

    table = jnp.concatenate(
        [table, jnp.zeros((table.shape[0], 3), jnp.float32)], axis=1)
    fld = gather_rows(table, tri)
    w = 1.0 - hit.u - hit.v
    u, v = hit.u, hit.v
    # rows 0:9 = p0 p1 p2 corner positions
    pc = [w * fld(c) + u * fld(3 + c) + v * fld(6 + c) for c in range(3)]
    pos = jnp.stack(pc, axis=-1)

    n = jnp.stack([fld(15), fld(16), fld(17)], axis=-1)
    # two-sided: flip toward the viewer
    n = jnp.where(jnp.sum(n * dirs, axis=-1, keepdims=True) > 0, -n, n)

    # rows 9:15 = (u, v) per corner
    uv = jnp.stack([w * fld(9 + c) + u * fld(11 + c) + v * fld(13 + c)
                    for c in range(2)], axis=-1)

    inst = fld(24).astype(jnp.int32)
    mat = fld(25).astype(jnp.int32)
    prim_tbl = fld(26).astype(jnp.int32)
    albedo = jnp.stack([fld(18), fld(19), fld(20)], axis=-1)
    emissive_tbl = jnp.stack([fld(21), fld(22), fld(23)], axis=-1)
    tex_slot = fld(27).astype(jnp.int32)
    cutoff = fld(28)
    if scene.textures.shape[0] == 0:
        pass   # untextured scene (static shape): skip sampling entirely —
               # the 8 trilinear taps/pixel otherwise dominate the resolve
    else:
        if pixel_spread is None:
            tex = sample_texture_bilinear(scene.textures, tex_slot, uv)
        else:
            from vri_tpu.ops import texture as texture_mod

            # scene-static pyramid precomputed at registry.commit; the
            # (rare) manually-assembled SceneBuffers without one falls back
            # to building it here
            atlas = scene.mip_atlas
            if atlas is None:
                atlas = texture_mod.build_mip_atlas(scene.textures)
            t_hit = jnp.linalg.norm(pos - origins, axis=-1)
            cos_inc = jnp.abs(jnp.sum(n * dirs, axis=-1))
            corner_p = [jnp.stack([fld(3 * k + c) for c in range(3)], -1)
                        for k in range(3)]
            corner_uv = [jnp.stack([fld(9 + 2 * k), fld(10 + 2 * k)], -1)
                         for k in range(3)]
            density = texture_mod.triangle_texel_density(
                corner_p[0], corner_p[1], corner_p[2],
                corner_uv[0], corner_uv[1], corner_uv[2],
                scene.textures.shape[1])
            lod = texture_mod.ray_cone_lod(t_hit, cos_inc, density,
                                           pixel_spread)
            tex = texture_mod.sample_trilinear(atlas, tex_slot, uv, lod)
        has_tex = tex_slot >= 0
        if tex.shape[-1] == 4:
            # alpha cutout: a sampled alpha under the material's
            # opacityThreshold punches a hole (treated as a miss — the
            # reference's visibility pass doesn't alpha-test at all, so
            # resolve-level cutout exceeds it; we do not continue the ray
            # behind the hole)
            cut = has_tex & (cutoff > 0.0) & (tex[:, 3] < cutoff)
            valid = valid & ~cut
            tex = tex[:, :3]
        albedo = jnp.where(has_tex[:, None], albedo * tex, albedo)
    emissive = emissive_tbl
    prim_local = prim_tbl
    neg1 = jnp.int32(-1)
    return GBuffer(
        position=pos,
        normal=n,
        albedo=jnp.where(valid[:, None], albedo, 0.0),
        emissive=jnp.where(valid[:, None], emissive, 0.0),
        uv=uv,
        depth=hit.t,
        instance=jnp.where(valid, inst, neg1),
        prim=jnp.where(valid, prim_local, neg1),
        material=jnp.where(valid, mat, neg1),
        valid=valid)


def shade_direct(gb: GBuffer, scene: SceneBuffers,
                 shadow: jnp.ndarray | None = None,
                 ambient: float = 0.08) -> jnp.ndarray:
    """Lambertian direct lighting over the (padded) light array.

    shadow: optional (N, L) occlusion factors in [0,1] (1 = fully lit).
    This is the "lightloop" stage the reference scaffolds but stubs
    (Source/RenderPass.cpp:1023-1029).
    """
    is_distant = (scene.light_type == 1)[None, :, None]
    to_l = jnp.where(is_distant, scene.light_position[None, :, :],
                     scene.light_position[None, :, :]
                     - gb.position[:, None, :])                    # (N,L,3)
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    wi = to_l / jnp.sqrt(jnp.maximum(dist2, 1e-12))[..., None]
    ndotl = jnp.maximum(jnp.sum(gb.normal[:, None, :] * wi, axis=-1), 0.0)
    nlights = scene.light_position.shape[0]
    live = (jnp.arange(nlights) < scene.num_lights).astype(jnp.float32)
    falloff = jnp.where(is_distant[..., 0], 1.0,
                        1.0 / jnp.maximum(dist2, 1e-6))
    irr = scene.light_intensity[None, :] * ndotl * falloff * live[None, :]
    if shadow is not None:
        irr = irr * shadow
    radiance = (irr[..., None] * scene.light_color[None, :, :]).sum(axis=1)
    color = gb.albedo * (radiance + ambient) + gb.emissive
    return jnp.where(gb.valid[:, None], color, 0.0)


# ---------------------------------------------------------------------------
# Debug visualization (reference DebugMode dropdown, Debug.hlsl:163-181)
# ---------------------------------------------------------------------------

def _id_color(i: jnp.ndarray) -> jnp.ndarray:
    """Deterministic color cycle for integer ids (reference uses a
    hue-cycling palette for MeshID/PrimitiveID, Debug.hlsl:68-90)."""
    i = i.astype(jnp.uint32)
    h = (i * jnp.uint32(2654435761)) & jnp.uint32(0xFFFFFF)
    r = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
    g = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = (h & 0xFF).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b], axis=-1)


def debug_color(mode: int, gb: GBuffer, near: float = 0.05,
                far: float = 100.0) -> jnp.ndarray:
    v = gb.valid[:, None]
    if mode == DebugMode.MESH_ID:
        c = _id_color(gb.instance)
    elif mode == DebugMode.PRIM_ID:
        c = _id_color(gb.prim)
    elif mode == DebugMode.BARYCENTRIC:
        # reconstructable from uv-style weights; show interpolation weights
        c = jnp.concatenate([gb.uv, 1.0 - gb.uv.sum(-1, keepdims=True)], -1)
    elif mode == DebugMode.DEPTH:
        z = jnp.clip((gb.depth - near) / (far - near), 0.0, 1.0)[:, None]
        c = jnp.repeat(1.0 - z, 3, axis=-1)
    elif mode == DebugMode.ALBEDO:
        c = gb.albedo
    elif mode == DebugMode.NORMAL:
        c = gb.normal * 0.5 + 0.5
    else:
        raise ValueError(f"unknown debug mode {mode}")
    return jnp.where(v, c, 0.0)
