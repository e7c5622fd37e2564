"""The frame render graph as pure jitted functions.

TPU re-design of ``RenderPass::_Execute`` (Source/RenderPass.cpp:890-1077).
Where the reference records Vulkan passes (visibility raster -> debug
resolve -> copy-out) into a command buffer, here a frame is one jitted
function over (SceneBuffers, FrameParams) producing an AOV dict; XLA fuses
the stages.  The mutable "render settings" the reference re-sets every frame
(Source/Main.cpp:252-258) become FrameParams fields / static jit args.
"""

from __future__ import annotations

import functools
from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from vri_tpu.config import DebugMode, RenderConfig
from vri_tpu.hydra.camera import CameraState
from vri_tpu.ops import intersect, raygen, shading
from vri_tpu.registry import SceneBuffers, bake_world


@flax.struct.dataclass
class FrameParams:
    """Per-frame camera + settings, all device arrays (the analog of the
    reference's FrameContext render settings, RenderPass.cpp:892-902)."""

    view_proj: jnp.ndarray      # (4, 4)
    inv_view_proj: jnp.ndarray  # (4, 4)
    eye: jnp.ndarray            # (3,)
    near: jnp.ndarray           # ()
    far: jnp.ndarray            # ()
    # ray-cone pixel spread (2*tan(fov_y/2)/height); 0 disables mip LOD
    pixel_spread: jnp.ndarray = None  # ()

    @classmethod
    def from_camera(cls, cam: CameraState,
                    height: int | None = None) -> "FrameParams":
        import math

        spread = (2.0 * math.tan(0.5 * cam.fov_y) / height) if height else 0.0
        return cls(view_proj=jnp.asarray(cam.view_proj),
                   inv_view_proj=jnp.asarray(cam.inv_view_proj),
                   eye=jnp.asarray(cam.eye),
                   near=jnp.asarray(cam.near, jnp.float32),
                   far=jnp.asarray(cam.far, jnp.float32),
                   pixel_spread=jnp.asarray(spread, jnp.float32))


def _raster_variant(backend: str) -> tuple:
    """Parse a raster backend string -> (variant, caps_scale).

    ``raster`` = list kernels at default capacities; ``raster2x`` /
    ``raster4x`` = the same with doubled/quadrupled list capacities (the
    renderer's graceful overflow escalation); ``raster_ranged`` = the
    exact, capacity-free chunk-range kernel (the last-resort fallback —
    ~20x slower at 111k tris, so the caps ladder comes first)."""
    if backend == "raster_ranged":
        return "ranged", 1
    if backend in ("raster2x", "raster4x"):
        return "auto", int(backend[6])
    return "auto", 1



def _cull_sign_instance(scene: SceneBuffers):
    """Per-INSTANCE backface-cull signs from USD doubleSided semantics:
    0 = two-sided, +1 = keep CCW-front (right-handed), -1 under a
    mirroring (negative-determinant) instance transform, which flips the
    projected winding.  Returns None when every instance is two-sided
    (legacy SceneBuffers or force_double_sided) so the raster setup skips
    the test entirely.  The reference renders everything two-sided
    (VK_CULL_MODE_NONE, Common.cpp:333) and ignores doubleSided; we
    follow the USD spec — kitchen-scale scenes emit ~2x fewer
    (tile, triangle) pairs with the spec behavior."""
    ds = scene.instance_double_sided
    if ds is None:
        return None
    m = scene.instance_transform
    det = (m[:, 0, 0] * (m[:, 1, 1] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 1])
           - m[:, 0, 1] * (m[:, 1, 0] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 0])
           + m[:, 0, 2] * (m[:, 1, 0] * m[:, 2, 1] - m[:, 1, 1] * m[:, 2, 0]))
    return jnp.where(ds, 0.0, jnp.sign(det))


def _cull_sign(scene: SceneBuffers):
    """Per-face cull signs (``_cull_sign_instance`` broadcast over the
    face pool); None when every instance is two-sided."""
    inst = _cull_sign_instance(scene)
    return None if inst is None else inst[scene.tri_instance]


def _instance_frustum_mask(scene: SceneBuffers, view_proj):
    """Conservative per-instance frustum visibility from world AABBs:
    an instance is culled only when all 8 AABB corners lie outside one
    clip plane (homogeneous plane tests — sign-safe for corners behind
    the camera).  The z planes match the raster's z in [0, w] clip
    convention."""
    lo = scene.instance_aabb_lo
    hi = scene.instance_aabb_hi
    sel = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        jnp.float32)                                   # (8, 3)
    corners = lo[:, None, :] + sel[None, :, :] * (hi - lo)[:, None, :]
    hom = jnp.concatenate(
        [corners, jnp.ones(corners.shape[:-1] + (1,), jnp.float32)], -1)
    clip = hom @ view_proj.T                           # (I, 8, 4)
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    outside = jnp.stack([
        jnp.all(x + w < 0, -1), jnp.all(w - x < 0, -1),
        jnp.all(y + w < 0, -1), jnp.all(w - y < 0, -1),
        jnp.all(z < 0, -1), jnp.all(w - z < 0, -1)], -1)
    return ~jnp.any(outside, -1)                       # (I,) visible


# pool size above which the raster compacts to frustum-visible slots
# first: at beyond-bench scale the prep (setup + emission) is POOL-
# proportional and dominates the frame (1.35M-slot city: prep-bound at
# 1.3 s/frame while only ~0.8M pairs are live — BASELINE.md round 4)
_CULL_COMPACT_MIN_POOL = 1 << 19


def _compact_visible_faces(scene: SceneBuffers, view_proj, cap: int):
    """Frustum-cull instances and compact the surviving face ranges into a
    front-packed (cap,) face-id list — the raster then pays setup/emission
    proportional to LIVE faces, not the padded pool.  The reference gets
    this for free from its per-draw loop + hardware clipping
    (Source/RenderPass.cpp:642-664): off-frustum draw items still issue
    but their triangles die in clipping; our sort-raster prep is pool-
    proportional, so at city scale (1.35M-slot pool, ~0.4M visible) the
    un-culled frame was 1,345 ms for ~30 ms of live walk (BASELINE.md r4).

    Returns (face_ids, live_count, instance_of_pair, overflow_count);
    overflow > 0 means ``cap`` could not hold every visible face — the
    caller reports it via HitRecord.overflow and the renderer's
    caps-escalation ladder widens the budget next frame (never silent).
    """
    vis = _instance_frustum_mask(scene, view_proj)
    num_i = scene.instance_transform.shape[0]
    inst_live = jnp.arange(num_i, dtype=jnp.int32) < scene.num_instances
    counts = jnp.where(vis & inst_live, scene.instance_face_count, 0)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    j = jnp.arange(cap, dtype=jnp.int32)
    # per-entry instance/start/offset via MONOTONE segment carries
    # (scatter + cumsum), not searchsorted: the binary search's log2
    # passes of per-entry gathers were ~half the compaction's cost at
    # the 1M-entry city budget.  All three carried fields ascend over
    # live instances (packing order), so each rides its own carry.
    starts = cum - counts
    live_i = counts > 0

    def carry(field):
        masked = jnp.where(live_i, field, -1)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                jax.lax.cummax(masked)[:-1]])
        diff = jnp.where(live_i, field - jnp.maximum(prev, 0), 0)
        buf = jnp.zeros((cap,), jnp.int32).at[
            jnp.where(live_i, starts, cap)].add(diff, mode="drop")
        return jnp.cumsum(buf)

    sid = carry(jnp.arange(num_i, dtype=jnp.int32))
    seg_start = carry(starts)
    base_off = carry(scene.instance_face_offset.astype(jnp.int32))
    face_ids = base_off + (j - seg_start)
    live = j < total
    face_ids = jnp.where(live, face_ids, 0)
    overflow = jnp.maximum(total - cap, 0)
    return face_ids, jnp.minimum(total, cap), sid, overflow


def _y_off(y0):
    """Traced-or-static y offset -> raster ``y_offset`` arg (None = 0).
    Sharded bands pass a TRACED ``dev * band_h``; the single-chip band
    path passes a static int."""
    if y0 is None:
        return None
    if isinstance(y0, (int, float)):
        return jnp.float32(y0) if y0 else None
    return jnp.asarray(y0, jnp.float32)


def _visibility_raster(scene: SceneBuffers, world_verts, frame, height,
                       width, variant: str = "auto", y0=0,
                       proj_height: int | None = None,
                       caps_scale: int = 1, lod_tau: float = 0.75,
                       cull_instances: bool | None = None,
                       compact_cap: int | None = None):
    """Raster dispatch: group-binned lists for ordinary scenes (big
    triangles dominate; the global tier would overflow), the sort-binned
    kernel beyond ~64k triangles (tessellated scenes: per-triangle exact
    lists, O(F log F) — the (tiles x groups) binning matrix stops scaling).
    ``variant='ranged'`` forces the chunk-range kernel — the exact,
    capacity-free fallback when a list kernel reports overflow
    (HitRecord.overflow > 0); ``caps_scale`` multiplies the list
    capacities (the renderer's intermediate overflow response).

    When the scene carries LOD chains (registry lod_levels > 0), each
    instance rasterizes the coarsest level whose geometric deviation
    projects below ``lod_tau`` pixels (ops/lod.py); ``lod_tau=0`` forces
    full-rate geometry.

    ``cull_instances``: frustum-cull instance AABBs and compact the
    surviving face ranges BEFORE triangle setup (None = auto: pools of
    >= ``_CULL_COMPACT_MIN_POOL`` slots, where pool-proportional prep
    dominates the frame).  Compaction overflow is counted into
    HitRecord.overflow; ``caps_scale`` widens the compact budget."""
    from vri_tpu.ops import rasterize as raster_mod

    num_faces = scene.num_faces
    kw = {}
    if scene.tri_lod is not None and lod_tau > 0:
        from vri_tpu.ops import lod as lod_mod

        focal_px = 1.0 / jnp.maximum(frame.pixel_spread, 1e-8)
        mask, _ = lod_mod.face_mask(scene, frame.eye, focal_px, lod_tau)
        num_faces = scene.num_faces_total
        kw["face_mask"] = mask
    f = scene.tri_vertices.shape[0]
    if cull_instances is None:
        cull_instances = f >= _CULL_COMPACT_MIN_POOL
    if cull_instances and variant != "ranged" and "face_mask" not in kw:
        # LOD chains keep the uncompacted path for now: the face ranges
        # cover base geometry only, and the LOD mask indexes the full pool.
        # ``compact_cap`` budgets the live-face list (static shape): the
        # default f//4 holds any view where <= a quarter of the pool
        # survives the frustum; denser views overflow COUNTED and the
        # caps ladder doubles the budget — never silent, never wrong.
        ccap = compact_cap if compact_cap is not None \
            else max(f // 4, 1 << 10)
        ccap = min(raster_mod._round_up(ccap, 128) * caps_scale, f)
        face_ids, live, pair_inst, c_over = _compact_visible_faces(
            scene, frame.view_proj, ccap)
        inst_sign = _cull_sign_instance(scene)
        # the pair/template arrays are STATIC-cap-proportional (their
        # build dominates city-scale frames: 613 ms at the 2M default vs
        # 337 ms at 1M for 822k live pairs — round-5 measurements), so
        # bound them by the compacted pool instead of the global default;
        # emission overflow stays counted and the ladder escalates.
        # cap=4096: dense city tiles overflowed 2048 at caps_scale=1 and
        # a wider per-tile list costs only work-list slack.
        hit, _ = raster_mod.rasterize_sorted(
            world_verts, scene.tri_vertices[face_ids], live,
            frame.view_proj, height=height, width=width,
            proj_height=proj_height,
            cull_sign=None if inst_sign is None else inst_sign[pair_inst],
            y_offset=_y_off(y0), cap=4096,
            pairs_cap=max(raster_mod._round_up(ccap, 1024), 1 << 18),
            caps_scale=caps_scale, src_map=face_ids)
        return hit.replace(overflow=hit.overflow
                           + (c_over > 0).astype(jnp.int32))
    if variant == "ranged":
        fn = raster_mod.rasterize
    elif f <= (1 << 14) and height <= 512:
        # small pool AND a small framebuffer (row-sharded multi-chip
        # bands): the sorted path's per-FRAME prep (emission over the
        # pool, the >= 128k-key sort, the stream/template build) doesn't
        # amortize over a few hundred tiles — the 135-row GI band
        # measured 13.6 ms via binned vs ~21 ms via sorted
        fn = raster_mod.rasterize_binned
        kw["caps_scale"] = caps_scale
    else:
        # full frames: the sorted work-list kernel owns every scale since
        # its fused singleton steps landed: 21.4 vs binned 23.7 ms at 3k
        # (the old crossover favored binned 22.7 vs 27.1), and beyond
        # ~16k the binned (tiles x groups) matrix stops scaling anyway
        # (tools/bench_sorted3k.py)
        fn = raster_mod.rasterize_sorted
        kw["caps_scale"] = caps_scale
    hit, _ = fn(world_verts, scene.tri_vertices, num_faces,
                frame.view_proj, height=height, width=width,
                proj_height=proj_height, cull_sign=_cull_sign(scene),
                y_offset=_y_off(y0), **kw)
    return hit


def _visibility_brute(scene: SceneBuffers, world_verts, origins, dirs):
    v0, e1, e2 = intersect.gather_triangles(world_verts, scene.tri_vertices)
    return intersect.trace_brute(origins, dirs, v0, e1, e2, scene.num_faces,
                                 cull_sign=_cull_sign(scene))


@functools.partial(jax.jit, static_argnames=("height", "width", "mode",
                                             "shadows", "backend",
                                             "lod_tau"))
def render_frame(scene: SceneBuffers, frame: FrameParams, *,
                 height: int, width: int, mode: int = DebugMode.NONE,
                 shadows: bool = True, backend: str = "brute",
                 lod_tau: float = 0.75) -> Dict[str, jnp.ndarray]:
    """Render one frame; returns AOVs reshaped to (H, W, ...).

    Pass order mirrors the reference frame (RenderPass.cpp:890-1077):
    bake world verts (the vertex-transform the raster VS does per draw) ->
    visibility -> attribute resolve -> lightloop (or debug resolve).
    """
    world_verts = bake_world(scene)
    origins, dirs = raygen.camera_rays(frame.inv_view_proj, frame.eye,
                                       height, width)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)

    if backend == "brute":
        hit = _visibility_brute(scene, world_verts, o, d)
    elif backend == "bvh":
        from vri_tpu.ops import trace as trace_mod

        hit = trace_mod.trace_scene(scene, world_verts, o, d)
    elif backend.startswith("raster"):
        variant, caps_scale = _raster_variant(backend)
        hit = _visibility_raster(
            scene, world_verts, frame, height, width,
            variant=variant, caps_scale=caps_scale, lod_tau=lod_tau)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    gb = shading.resolve_gbuffer(scene, world_verts, hit, o, d,
                                 pixel_spread=frame.pixel_spread)
    if backend.startswith("raster"):
        # raster depth is NDC; replace with world-space ray t for AOV parity
        t = jnp.linalg.norm(gb.position - frame.eye[None, :], axis=-1)
        gb = gb.replace(depth=jnp.where(gb.valid, t, intersect.INF))

    if mode == DebugMode.NONE:
        shadow = None
        if shadows:
            shadow = _shadow_factors(scene, world_verts, gb)
        color = shading.shade_direct(gb, scene, shadow=shadow)
    else:
        color = shading.debug_color(mode, gb)

    n_aux = color.shape[-1]
    out = {
        "color": color.reshape(height, width, n_aux),
        "depth": gb.depth.reshape(height, width),
        "instance_id": gb.instance.reshape(height, width),
        "prim_id": gb.prim.reshape(height, width),
        "normal": gb.normal.reshape(height, width, 3),
        "albedo": gb.albedo.reshape(height, width, 3),
    }
    if hit.overflow is not None:
        out["raster_overflow_tiles"] = hit.overflow
    return out


def _shadow_factors(scene: SceneBuffers, world_verts, gb: shading.GBuffer):
    """Hard shadow test per (pixel, light) with brute-force occlusion.
    Replaced by the SDF-marched soft test once cascades exist."""
    v0, e1, e2 = intersect.gather_triangles(world_verts, scene.tri_vertices)
    n, L = gb.position.shape[0], scene.light_position.shape[0]
    is_distant = (scene.light_type == 1)[None, :, None]
    to_l = jnp.where(is_distant, scene.light_position[None, :, :],
                     scene.light_position[None, :, :]
                     - gb.position[:, None, :])
    dist = jnp.linalg.norm(to_l, axis=-1)
    dist = jnp.where(is_distant[..., 0], 1e4, dist)
    wi = to_l / jnp.maximum(jnp.linalg.norm(to_l, axis=-1),
                            1e-12)[..., None]
    o = jnp.broadcast_to(
        gb.position[:, None, :] + gb.normal[:, None, :] * 1e-3, (n, L, 3))
    o = o.reshape(n * L, 3)
    blocked = intersect.any_hit_brute(
        o, wi.reshape(n * L, 3), v0, e1, e2, scene.num_faces,
        t_max=(dist.reshape(n * L) - 2e-3))
    return 1.0 - blocked.reshape(n, L).astype(jnp.float32)


class _IndirectView:
    """Minimal G-buffer view for ``gi.indirect_radiance`` (which reads only
    position + normal): slicing two arrays instead of the full 12-field
    G-buffer — the strided [::s, ::s] subsample of every field measured 10s
    of ms at 1080p."""

    __slots__ = ("position", "normal")

    def __init__(self, position, normal):
        self.position = position
        self.normal = normal


def _subsample_pn(gb, height, width, s):
    """GI-resolution position/normal/valid via ONE packed row gather.

    A lane-dim strided slice ([::s, ::s]) lowers to a relayout pass per
    field (3.9-5.2 ms EACH at 1080p, xprof); packing the three fields into
    (N, 8) rows once and row-gathering the strided pixel ids costs ~a
    third of that total — and XLA CSEs the pack + gather across the GI
    and shadow subsamples when their strides match (the default)."""
    from vri_tpu.ops.rowgather import gather_rows

    n = height * width
    packed = jnp.concatenate(
        [gb.position, gb.normal, gb.valid.astype(jnp.float32)[:, None],
         jnp.zeros((n, 1), jnp.float32)], axis=1)          # (N, 8)
    ys = jnp.arange(0, height, s, dtype=jnp.int32)
    xs = jnp.arange(0, width, s, dtype=jnp.int32)
    idx = (ys[:, None] * width + xs[None, :]).reshape(-1)
    f = gather_rows(packed, idx)
    pos = jnp.stack([f(0), f(1), f(2)], axis=-1)
    nrm = jnp.stack([f(3), f(4), f(5)], axis=-1)
    return _IndirectView(pos, nrm), f(6) > 0.5


def _upsample(a, hs, ws, s):
    rest = a.shape[1:]
    a = a.reshape((hs, ws) + rest)
    a = jnp.repeat(jnp.repeat(a, s, axis=0), s, axis=1)
    return a.reshape((hs * s * ws * s,) + rest)


def _direct_lighting(gb, scene, cascades, config, height, width):
    """Direct term with optionally reduced-rate shadow marching
    (config.shadow_scale): the march runs on a pixel subset, the
    N.L/falloff/color math stays full-rate."""
    from vri_tpu.ops import gi as gi_mod

    ss = config.shadow_scale
    if ss <= 1:
        return gi_mod.direct_radiance(gb.position, gb.normal, scene,
                                      cascades, config)
    sub, _ = _subsample_pn(gb, height, width, ss)
    occ = gi_mod.shadow_occlusion(sub.position, sub.normal, scene,
                                  cascades, config)
    occ = _upsample(occ, height // ss, width // ss, ss)
    return gi_mod.direct_radiance_analytic(gb.position, gb.normal, scene,
                                           occ)


@functools.partial(jax.jit, static_argnames=("height", "width", "mode",
                                             "config", "backend", "samples",
                                             "use_cache", "gi_scale",
                                             "lod_tau"))
def render_frame_gi(scene: SceneBuffers, frame: FrameParams,
                    cascades, key, *, height: int, width: int,
                    config, mode: int = DebugMode.NONE,
                    backend: str = "raster", samples: int = 1,
                    use_cache: bool = False, gi_scale: int = 1,
                    lod_tau: float = 0.75) -> Dict[str, jnp.ndarray]:
    """Full frame with the SDF-driven lightloop (BASELINE config 4):
    visibility -> G-buffer resolve -> direct + 1-bounce GI, or the
    Brixelizer-style SDF debug resolve (reference debug visualization,
    RenderPass.cpp:954-976)."""
    from vri_tpu.ops import gi as gi_mod
    from vri_tpu.ops import sdf_trace

    world_verts = bake_world(scene)
    origins, dirs = raygen.camera_rays(frame.inv_view_proj, frame.eye,
                                       height, width)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)

    if mode >= DebugMode.SDF_DISTANCE:
        # ray-march the cascades directly (debug visualization pass)
        rec = sdf_trace.march(cascades, o, d, t_max=frame.far, config=config)
        color = gi_mod.sdf_debug_color(mode, rec, cascades, config)
        return {"color": color.reshape(height, width, 3),
                "depth": rec.t.reshape(height, width)}

    if backend.startswith("raster"):
        variant, caps_scale = _raster_variant(backend)
        hit = _visibility_raster(
            scene, world_verts, frame, height, width,
            variant=variant, caps_scale=caps_scale, lod_tau=lod_tau)
    elif backend == "bvh":
        from vri_tpu.ops import trace as trace_mod

        hit = trace_mod.trace_scene(scene, world_verts, o, d)
    else:
        hit = _visibility_brute(scene, world_verts, o, d)

    gb = shading.resolve_gbuffer(scene, world_verts, hit, o, d,
                                 pixel_spread=frame.pixel_spread)
    t = jnp.linalg.norm(gb.position - frame.eye[None, :], axis=-1)
    gb = gb.replace(depth=jnp.where(gb.valid, t, intersect.INF))

    if mode == DebugMode.NONE:
        if gi_scale <= 1 or samples == 0:
            color = gi_mod.lightloop(gb, scene, cascades, key, config=config,
                                     samples=samples, use_cache=use_cache)
        else:
            # half/quarter-res GI: indirect gathered on a strided pixel
            # subset and nearest-upsampled; direct stays full-rate
            direct = _direct_lighting(gb, scene, cascades, config, height,
                                      width)
            sub, _ = _subsample_pn(gb, height, width, gi_scale)
            ind = gi_mod.indirect_radiance(sub, scene, cascades, key,
                                           config=config, samples=samples,
                                           use_cache=use_cache)
            hs, ws = height // gi_scale, width // gi_scale
            ind = ind.reshape(hs, ws, 3)
            ind = jnp.repeat(jnp.repeat(ind, gi_scale, axis=0), gi_scale,
                             axis=1).reshape(-1, 3)
            color = gb.emissive + gb.albedo * (direct + ind)
            color = jnp.where(gb.valid[:, None], color, 0.0)
    else:
        color = shading.debug_color(mode, gb)

    out = {
        "color": color.reshape(height, width, color.shape[-1]),
        "depth": gb.depth.reshape(height, width),
        "instance_id": gb.instance.reshape(height, width),
        "normal": gb.normal.reshape(height, width, 3),
        "albedo": gb.albedo.reshape(height, width, 3),
    }
    if hit.overflow is not None:
        out["raster_overflow_tiles"] = hit.overflow
    return out


@jax.jit
def accumulate(prev_color: jnp.ndarray, prev_count: jnp.ndarray,
               new_color: jnp.ndarray):
    """Temporal/progressive accumulation (running mean).  The reference has
    no temporal pass (single raster frame); progressive GI needs one."""
    count = prev_count + 1.0
    color = prev_color + (new_color - prev_color) / count
    return color, count


# ---------------------------------------------------------------------------
# Temporal reprojection (progressive GI under camera motion)
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class TemporalState:
    """History buffer for reprojected indirect-irradiance accumulation.

    Stores the *indirect* term only — direct lighting and albedo re-shade
    at full rate every frame, so accumulation never smears shadows or
    textures, only the stochastic GI gather.  All per-pixel fields pack
    into ONE (H*W, 8) row array [indirect(3) | depth | normal(3) | count]
    so reprojection is a single contiguous-row gather — four separate
    per-index gathers measured ~85 ms/frame at 1080p."""

    data: jnp.ndarray       # (H*W, 8)
    view_proj: jnp.ndarray  # (4, 4)  of the writing frame
    eye: jnp.ndarray        # (3,)


def init_temporal(height: int, width: int,
                  gi_scale: int = 1) -> TemporalState:
    """History buffer for :func:`render_frame_gi_temporal`.  Pass the
    SAME ``gi_scale`` the frame uses: the history lives at GI resolution
    (the indirect term never carries more than gi-res information, and a
    full-res history made the 4 reprojection row gathers gi_scale^2 x
    more expensive for zero added signal)."""
    n = (height // gi_scale) * (width // gi_scale)
    return TemporalState(data=jnp.zeros((n, 8), jnp.float32),
                         view_proj=jnp.eye(4, dtype=jnp.float32),
                         eye=jnp.zeros((3,), jnp.float32))


def pack_temporal(indirect, depth, normal, count, view_proj, eye
                  ) -> TemporalState:
    data = jnp.concatenate(
        [indirect, depth[:, None], normal, count[:, None]], axis=1)
    return TemporalState(data=data, view_proj=view_proj, eye=eye)


def _reproject(state: TemporalState, position, normal, valid, height: int,
               width: int, depth_tol: float = 0.02, y0: int = 0,
               proj_height: int | None = None, query_y0=0):
    """Sample the history at each pixel's position reprojected through the
    previous frame's camera; disocclusions (depth mismatch, normal flip —
    which also rejects the thin-wall front/back aliasing a depth test alone
    cannot see — or off-screen) return count 0 so the blend restarts.
    In band mode the history covers rows [y0, y0+height) of a proj_height
    frame; reprojections landing outside the band restart.

    The history fetch is BILINEAR: four row gathers on the packed (N, 8)
    state blended by the sub-pixel reprojection offsets, with per-tap
    validation folded into the weights (an invalid tap drops out; all
    invalid restarts).  A nearest tap resamples the history off-grid under
    sub-pixel motion, compounding into visible shimmer on slow pans
    (VERDICT r2 weak #4).  The depth tolerance is velocity-aware: fast
    reprojection motion widens it (depth derivatives along the motion
    vector dwarf the static tolerance at grazing angles).
    """
    clip = jnp.concatenate(
        [position, jnp.ones_like(position[:, :1])], axis=1) @ state.view_proj.T
    w = clip[:, 3]
    ndc = clip[:, :3] / jnp.maximum(w, 1e-6)[:, None]
    px = (ndc[:, 0] * 0.5 + 0.5) * width - 0.5
    py = (0.5 - ndc[:, 1] * 0.5) * (proj_height or height) - y0 - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0i = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[:, None]
    fy = (py - y0i.astype(jnp.float32))[:, None]

    # velocity: reprojected position vs this pixel's own coordinates.
    # ``query_y0`` places the query rows inside the (possibly
    # halo-extended) history coordinate frame: the queries are rows
    # [query_y0, query_y0 + rows) of the ``height``-row history.
    n = position.shape[0]
    own_x = (jnp.arange(n, dtype=jnp.float32) % width)
    own_y = jnp.floor(jnp.arange(n, dtype=jnp.float32) / width) + query_y0
    vel = jnp.sqrt((px - own_x) ** 2 + (py - own_y) ** 2)
    tol = depth_tol * (1.0 + 0.25 * jnp.minimum(vel, 8.0))

    t_prev = jnp.linalg.norm(position - state.eye[None, :], axis=-1)

    from vri_tpu.ops.rowgather import gather_rows

    # PAIRED horizontal taps: the four bilinear taps sit at two adjacent
    # columns of two rows.  Packing each history row with its right
    # neighbor ((N, 16): [data[i] | data[i+1]]) lets ONE row gather per
    # y-row serve both x-taps — the 4 latency-bound gathers on the
    # 16 MB history (xprof: ~2.5 ms each at 1080p/gi2) become 2, for a
    # ~0.5 ms roll+concat table build.  Window semantics: the gather
    # row is xw = clip(x0, 0, W-2); a tap at global column x reads
    # window slot x - xw and is valid only when that slot is 0 or 1 —
    # exactly reproducing the unpaired taps at both screen edges.
    paired = jnp.concatenate(
        [state.data, jnp.roll(state.data, -1, axis=0)], axis=1)
    xw = jnp.clip(x0, 0, max(width - 2, 0))

    def row_taps(dy):
        yi = y0i + dy
        y_in = (w > 1e-6) & (yi >= 0) & (yi < height)
        idx = jnp.clip(yi, 0, height - 1) * width + xw
        h = gather_rows(paired, idx)
        out = []
        for dx in (0, 1):
            si = x0 + dx - xw                      # window slot, 0 or 1
            xi = x0 + dx
            inside = y_in & (xi >= 0) & (xi < width) & (si >= 0) & (si <= 1)
            off = jnp.where(si == 1, 8, 0)

            def f(k, off=off):
                return jnp.where(off == 8, h(k + 8), h(k))

            depth_ok = jnp.abs(f(3) - t_prev) <= tol * t_prev + 1e-3
            normal_ok = (f(4) * normal[:, 0] + f(5) * normal[:, 1]
                         + f(6) * normal[:, 2]) > 0.5
            ok = inside & depth_ok & normal_ok & (f(7) > 0.0)
            wgt = ((fy if dy else 1.0 - fy)
                   * (fx if dx else 1.0 - fx))[:, 0]
            ind = jnp.stack([f(0), f(1), f(2)], axis=-1)
            out.append((ind, f(7), jnp.where(ok, wgt, 0.0)))
        return out

    taps = row_taps(0) + row_taps(1)
    wsum = sum(t[2] for t in taps)
    scale = 1.0 / jnp.maximum(wsum, 1e-6)
    h_ind = sum(t[0] * t[2][:, None] for t in taps) * scale[:, None]
    h_count = sum(t[1] * t[2] for t in taps) * scale
    ok = valid & (wsum > 0.05)
    return jnp.where(ok[:, None], h_ind, 0.0), jnp.where(ok, h_count, 0.0)


def gi_band_inputs(scene: SceneBuffers, frame: FrameParams, cascades, key,
                   *, height: int, width: int, config,
                   backend: str = "raster", samples: int = 1,
                   use_cache: bool = False, gi_scale: int = 1,
                   lod_tau: float = 0.75, y0=0,
                   proj_height: int | None = None):
    """ONE shared frame body for every GI-temporal path — the single-chip
    band renderer (render_frame_gi_temporal) and the sharded bodies
    (parallel/tiling.py, parallel/multihost.py) all call this, so the
    sharded frame runs the PRODUCTION raster tier selector and the exact
    single-chip shading (VERDICT r4 #5: the shard bodies hand-duplicated
    this code around a hard-coded rasterize_binned).

    Covers raygen -> visibility -> G-buffer -> full-rate direct ->
    gi-resolution indirect sample.  ``y0`` may be TRACED (sharded bands
    pass dev * band_h).  Returns (hit, gb, direct, sub, valid_s, ind)
    where ``sub``/``valid_s`` are the gi-resolution view the temporal
    blend consumes (== gb when gi_scale == 1)."""
    from vri_tpu.ops import gi as gi_mod

    world_verts = bake_world(scene)
    origins, dirs = raygen.camera_rays(frame.inv_view_proj, frame.eye,
                                       height, width, y0=y0,
                                       proj_height=proj_height)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    if backend.startswith("raster"):
        variant, caps_scale = _raster_variant(backend)
        hit = _visibility_raster(
            scene, world_verts, frame, height, width,
            variant=variant, caps_scale=caps_scale,
            y0=y0, proj_height=proj_height, lod_tau=lod_tau)
    else:
        hit = _visibility_brute(scene, world_verts, o, d)
    gb = shading.resolve_gbuffer(scene, world_verts, hit, o, d,
                                 pixel_spread=frame.pixel_spread)
    t = jnp.linalg.norm(gb.position - frame.eye[None, :], axis=-1)
    gb = gb.replace(depth=jnp.where(gb.valid, t, intersect.INF))
    direct = _direct_lighting(gb, scene, cascades, config, height, width)
    if gi_scale > 1:
        assert height % gi_scale == 0 and width % gi_scale == 0, \
            "gi_scale must divide the frame (use an even band height)"
        sub, valid_s = _subsample_pn(gb, height, width, gi_scale)
    else:
        sub, valid_s = gb, gb.valid
    ind = gi_mod.indirect_radiance(sub, scene, cascades, key,
                                   config=config, samples=samples,
                                   use_cache=use_cache)
    return hit, gb, direct, sub, valid_s, ind


def temporal_blend(ind, h_ind, h_count, history_cap: float):
    """History blend shared by single-chip and sharded paths."""
    count = jnp.minimum(h_count, history_cap) + 1.0
    return h_ind + (ind - h_ind) / count[:, None], count


@functools.partial(jax.jit, static_argnames=("height", "width", "config",
                                             "backend", "samples",
                                             "use_cache", "gi_scale",
                                             "history_cap", "band",
                                             "lod_tau"))
def render_frame_gi_temporal(scene: SceneBuffers, frame: FrameParams,
                             cascades, key, state: TemporalState, *,
                             height: int, width: int, config,
                             backend: str = "raster", samples: int = 1,
                             use_cache: bool = False, gi_scale: int = 1,
                             history_cap: float = 16.0, band=None,
                             lod_tau: float = 0.75):
    """GI frame with temporally reprojected indirect accumulation.

    Under camera motion every pixel reuses up to ``history_cap`` frames of
    GI history (validated by reprojected depth), so a flythrough at
    gi_scale=2 / samples=1 converges like a static accumulation with many
    times the marched rays.  Returns (aovs, new_state).

    ``band=(y0, full_height)`` renders rows [y0, y0+height) of a
    full_height frame — the EXACT per-chip body of the row-sharded
    multi-chip topology (each chip keeps its band's history; reprojection
    across band borders restarts accumulation, as it would on-device).
    Used to measure the v5e-8 per-chip frame time on one real chip.
    """
    y0, proj_h = band if band is not None else (0, None)
    hit, gb, direct, sub, valid_s, ind = gi_band_inputs(
        scene, frame, cascades, key, height=height, width=width,
        config=config, backend=backend, samples=samples,
        use_cache=use_cache, gi_scale=gi_scale, lod_tau=lod_tau,
        y0=y0, proj_height=proj_h)
    if gi_scale <= 1:
        h_ind, h_count = _reproject(state, gb.position, gb.normal,
                                    gb.valid, height, width, y0=y0,
                                    proj_height=proj_h)
        ind_blend, count = temporal_blend(ind, h_ind, h_count, history_cap)
        t_s, n_s = gb.depth, gb.normal
        count_full = count
    else:
        # The ENTIRE temporal pipeline runs at GI resolution: the
        # indirect term never carries more than gi-res information, so a
        # full-res history only multiplied the reprojection row gathers
        # by gi_scale^2 (4 taps x 10.2 ms at 1080p, measured) for zero
        # added signal.  History state, reprojection, validation and the
        # blend all live at (H/s, W/s); the blended term upsamples once.
        hs, ws = height // gi_scale, width // gi_scale
        h_ind, h_count = _reproject(
            state, sub.position, sub.normal, valid_s, hs, ws,
            y0=y0 // gi_scale,
            proj_height=None if proj_h is None else proj_h // gi_scale)
        ind_blend_s, count = temporal_blend(ind, h_ind, h_count,
                                            history_cap)
        t_s = jnp.linalg.norm(sub.position - frame.eye[None, :], axis=-1)
        n_s = sub.normal
        ind_blend = _upsample(ind_blend_s, hs, ws, gi_scale)
        count_full = _upsample(count, hs, ws, gi_scale)
        ind_blend_state = ind_blend_s
    new_state = pack_temporal(ind_blend if gi_scale <= 1
                              else ind_blend_state,
                              t_s, n_s, count,
                              frame.view_proj, frame.eye)

    color = gb.emissive + gb.albedo * (direct + ind_blend)
    color = jnp.where(gb.valid[:, None], color, 0.0)
    aovs = {
        "color": color.reshape(height, width, 3),
        "depth": gb.depth.reshape(height, width),
        "instance_id": gb.instance.reshape(height, width),
        "normal": gb.normal.reshape(height, width, 3),
        "albedo": gb.albedo.reshape(height, width, 3),
        "gi_history": count_full.reshape(height, width),
    }
    if hit.overflow is not None:
        aovs["raster_overflow_tiles"] = hit.overflow
    return aovs, new_state


@functools.partial(jax.jit, static_argnames=("height", "width", "config",
                                             "backend", "samples",
                                             "use_cache", "gi_scale",
                                             "history_cap", "band",
                                             "lod_tau", "rebake",
                                             "shard_proxy"))
def render_frame_gi_dynamic(scene: SceneBuffers, frame: FrameParams,
                            cascades, build_state, key,
                            state: TemporalState, dirty_tri, dirty_lo,
                            dirty_hi, *, height: int, width: int, config,
                            backend: str = "raster", samples: int = 1,
                            use_cache: bool = False, gi_scale: int = 1,
                            history_cap: float = 16.0, band=None,
                            lod_tau: float = 0.75, rebake: bool = True,
                            shard_proxy: int | None = None):
    """One ANIMATED production frame: bounded SDF cascade update + radiance
    re-bake + temporal GI frame, all inside one jit — the analog of the
    reference running ``ffxBrixelizerBakeUpdate``/``Update`` inside every
    frame's command buffer before its passes (Source/RenderPass.cpp:
    919-1010): acceleration-structure maintenance is part of the frame
    budget, not an offline step.

    ``scene`` already carries this frame's animated transforms (the
    caller replaces ``instance_transform``); ``dirty_tri`` (F,) marks the
    moved triangles and ``dirty_lo/hi`` (D, 3) cover their old AND new
    world AABBs (pad unused rows +BIG/-BIG).  ``rebake=False`` skips the
    whole-atlas radiance re-bake (valid when lighting-relevant geometry
    did not move; the bounded update itself refreshes the dirty bricks'
    payloads).  Returns (aovs, new_temporal, new_cascades, new_state,
    needs_full) — ``needs_full`` nonzero means a capacity was exceeded
    and the caller must fall back to a full rebuild (the renderer's
    escalation ladder does this on the host path, renderer.py).

    In an in-jit frame loop the cascades ride the loop carry: seed the
    loop with BAKED cascades (``sdf.bake_brick_lighting``) so the carry
    pytree matches this function's output (the bake populates
    ``voxel_shade``).
    """
    from vri_tpu.ops import sdf as sdf_mod
    from vri_tpu.ops import sdf_build

    # shard_proxy=n: single-chip MEASUREMENT PROXY of the n-way sharded
    # animated path (parallel/tiling.render_frame_tiled_dynamic) — the
    # update emits and the bake marches exactly ONE device's 1/n slice
    # (no mesh needed), so bench.py can time the per-chip body of the
    # v5e-8 animated frame on the one real chip.  NOT a production mode:
    # the atlas only receives the slice.
    ax = (None, shard_proxy) if shard_proxy else None
    world_verts = bake_world(scene)
    mat = scene.instance_material[scene.tri_instance]
    cascades, build_state, needs_full = sdf_build.update_cascades(
        cascades, build_state, world_verts, scene.tri_vertices,
        scene.num_faces, dirty_tri, dirty_lo, dirty_hi,
        tri_albedo=scene.mat_base_color[mat],
        tri_emissive=scene.mat_emissive[mat], config=config,
        axis_name=ax)
    if rebake:
        # INCREMENTAL radiance bake: re-march shadows only at bricks the
        # update re-emitted plus bricks whose shadow segment crosses a
        # dirty AABB — the whole-atlas re-bake (max_bricks shadow
        # marches/frame) was the second-largest term of the round-4
        # animated frame.  Overflow of the compacted set folds into
        # needs_full (the caller's full-rebuild escalation re-bakes all).
        light_dirty = sdf_mod.lighting_dirty_bricks(
            cascades, scene, dirty_lo, dirty_hi, config=config)
        cascades, bake_drop = sdf_mod.bake_brick_lighting_partial(
            cascades, scene, build_state.emit_bricks | light_dirty,
            build_state.alive, config=config,
            cap=config.bake_brick_cap, axis_name=ax)
        needs_full = needs_full + bake_drop
    aovs, new_state = render_frame_gi_temporal(
        scene, frame, cascades, key, state, height=height, width=width,
        config=config, backend=backend, samples=samples,
        use_cache=use_cache, gi_scale=gi_scale, history_cap=history_cap,
        band=band, lod_tau=lod_tau)
    return aovs, new_state, cascades, build_state, needs_full


def render_to_numpy(scene: SceneBuffers, camera: CameraState,
                    config: RenderConfig, mode: int = DebugMode.NONE,
                    shadows: bool = True,
                    backend: str = "brute") -> Dict[str, np.ndarray]:
    aovs = render_frame(scene, FrameParams.from_camera(camera),
                        height=config.height, width=config.width, mode=mode,
                        shadows=shadows, backend=backend)
    return {k: np.asarray(v) for k, v in aovs.items()}
