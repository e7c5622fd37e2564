"""Sparse-brick SDF cascade builder (the Brixelizer-equivalent).

Re-implements the data model of AMD FidelityFX Brixelizer as JAX arrays
(reference: External/FidelityFX/include/FidelityFX/gpu/brixelizer/
ffx_brixelizer_host_gpu_shared.h — 64^3-voxel cascades, one 8^3-texel
distance "brick" per occupied voxel stored in a shared atlas, <=2^18 bricks,
cascade voxel size growing per cascade; Source/RenderPass.cpp:493-508) —
but the build pipeline is re-designed for a SIMD machine with static shapes
instead of the reference's 30 indirect compute passes
(ffx_brixelizer_raw.h:76-112):

  1. **voxelize**: dense per-cascade occupancy — every (voxel, triangle
     chunk) pair is tested with a separable AABB-interval test refined by a
     triangle-plane distance test.  No scatter queues, no "reference" lists;
     the occupancy grid is a (R,R,R) reduction over triangle chunks.
  2. **allocate**: one global exclusive-scan (cumsum) over the flattened
     occupancy assigns atlas brick ids — the stream-compaction equivalent of
     Brixelizer's brick allocation, capacity-bounded by ``max_bricks``
     (overflow counted, mirroring ``maxBricksPerBake`` semantics,
     RenderPass.cpp:927-930).
  3. **emit**: per allocated brick, the K nearest triangles are selected by
     brick-center-to-triangle-AABB distance (``lax.top_k``), then every
     8^3 texel evaluates exact point-triangle distance over those K,
     truncated and normalized to [0,1] — the analog of Brixelizer's
     voxelize + emit-SDF + eikonal passes collapsed into one dense pass.

All stages are shapes-static and run under one jit; rebuilding after
animation reuses the compiled executable.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from vri_tpu.config import SDFConfig
from vri_tpu.ops import geometry

BIG = 3.0e38


@flax.struct.dataclass
class SDFCascades:
    """Device-resident cascade set.

    ``brick_map[n, z, y, x]`` holds the atlas brick id for voxel (x,y,z) of
    cascade n; empty voxels store ``-esd`` where esd >= 1 is the chebyshev
    empty-space distance (in voxels) to the nearest brick — the march steps
    ``esd-1`` whole voxels through empty space for free, the TPU equivalent
    of Brixelizer's two-level AABB-tree skip (ffx_brixelizer_trace_ops.h:
    144-196) folded into the same single gather.  ``atlas[b]`` is the
    (B,B,B) normalized truncated distance field covering that voxel (0 = on
    surface, 1 = at or beyond truncation distance).
    """

    center: jnp.ndarray       # (N, 3) cascade centers (world)
    voxel_size: jnp.ndarray   # (N,)
    brick_map: jnp.ndarray    # (N, R, R, R) i32
    atlas: jnp.ndarray        # (max_bricks, B, B, B) f32
    brick_voxel: jnp.ndarray  # (max_bricks,) i32 flattened (n*R^3 + voxel)
    brick_albedo: jnp.ndarray  # (max_bricks, 3) f32 — nearest-surface albedo
    brick_emissive: jnp.ndarray  # (max_bricks, 3) f32 — nearest-surface emission
    brick_normal: jnp.ndarray  # (max_bricks, 3) f32 — nearest-surface normal
    # direct irradiance baked at the brick surface (radiance cache for the
    # GI bounce; see bake_brick_lighting) — zeros until baked
    brick_irradiance: jnp.ndarray  # (max_bricks, 3) f32
    # per-(brick, light) visibility (shadow factors; see bake_brick_lighting)
    brick_light_vis: jnp.ndarray   # (max_bricks, L) f32
    num_bricks: jnp.ndarray   # () i32
    overflow: jnp.ndarray     # () i32 — occupied voxels dropped (capacity)
    # Pallas march-kernel tables (ops/march_kernel.py): per cascade a 16^3
    # coarse cell grid (cell = (R/16)^3 voxels) of u8 chebyshev
    # distances-to-surface in cell units (0 = cell contains surface), packed
    # 4 cells per i32 word, plus per-cell "surface voxel" occupancy bit
    # words (bit = ((vz%s)*s + vy%s)*s + vx%s).  These stay small enough to
    # sit whole in VMEM, which is what makes the kernel's one-gather-per-
    # step march possible.  Zeros-shaped when R is not a multiple of 16.
    march_coarse: jnp.ndarray  # (N*4, 128) i32 — 4096 u4 cells per cascade
    march_fine0: jnp.ndarray   # (N*32, 128) i32 — occupancy bits 0..31
    march_fine1: jnp.ndarray   # (N*32, 128) i32 — occupancy bits 32..63
    # () i32 — near candidates beyond max_triangles_per_brick dropped at
    # emit (SDF overestimates distance in those bricks); counted like every
    # other capacity breach, never silent
    near_drop: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    # voxel-indexed shading payload (N*R^3, 16) f32:
    # [albedo(3) | normal(3) | irradiance(3) | emissive(3) | pad(4)],
    # zeros at empty voxels.  Precomputed at bake time so the GI bounce
    # fetches its whole per-hit payload with ONE row gather keyed on the
    # march kernel's hit voxel — the brick_map indirection (a second
    # dependent 518k-random gather, ~6.5 ms/frame at 540p GI) drops out
    # of the frame entirely.  None until bake_brick_lighting runs.
    voxel_shade: jnp.ndarray | None = flax.struct.field(default=None)


def cascade_origin(center: jnp.ndarray, voxel_size: jnp.ndarray,
                   resolution: int) -> jnp.ndarray:
    """World-space position of the (0,0,0) voxel corner."""
    return center - 0.5 * resolution * voxel_size[..., None]


def default_centers(config: SDFConfig, focus) -> jnp.ndarray:
    """All cascades centered on ``focus`` (the reference recenters on the
    camera every frame: sdfCenter = view position, RenderPass.cpp:934-936),
    snapped to each cascade's *cell* grid (s = R/16 voxels) so recentering
    never shimmers and clipmap scrolls move whole cells
    (ops/sdf_build.scroll_cascades)."""
    focus = jnp.asarray(focus, jnp.float32)
    s = max(config.cascade_resolution // 16, 1)
    vs = jnp.asarray([config.voxel_size(i) * s
                      for i in range(config.num_cascades)], jnp.float32)
    return jnp.round(focus[None, :] / vs[:, None]) * vs[:, None]


def _occupancy_one_cascade(a, b, c, valid, origin, vs, config: SDFConfig,
                           chunk: int):
    """(R,R,R) bool occupancy for one cascade."""
    r = config.cascade_resolution
    # Bricks are allocated only for voxels *intersecting* geometry (plus a
    # one-voxel apron), like Brixelizer — the truncation distance shapes the
    # stored values, not the allocation footprint; empty voxels are skipped
    # by voxel-exit stepping during the march.
    expand = vs
    lo, hi = geometry.tri_aabb(a, b, c)
    lo = (lo - expand - origin) / vs           # voxel coords
    hi = (hi + expand - origin) / vs
    # triangle plane
    n = jnp.cross(b - a, c - a)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n_dot_a = jnp.sum(n * a, axis=-1)

    f = a.shape[0]
    num_chunks = f // chunk
    ax_ids = (jnp.arange(r, dtype=jnp.float32) + 0.5)      # voxel centers

    def body(occ, ci):
        s = ci * chunk
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, chunk, 0)
        clo, chi = sl(lo), sl(hi)
        cva = sl(valid)
        cn, cnda = sl(n), sl(n_dot_a)
        # separable interval masks (r, chunk)
        def axis_mask(k):
            return ((ax_ids[:, None] >= clo[None, :, k])
                    & (ax_ids[:, None] <= chi[None, :, k]))
        mx, my, mz = axis_mask(0), axis_mask(1), axis_mask(2)
        # plane distance |n.(v - a)| at voxel centers, separable dot product
        vx = origin[0] + ax_ids * vs
        vy = origin[1] + ax_ids * vs
        vz = origin[2] + ax_ids * vs
        dx = vx[:, None] * cn[None, :, 0]                   # (r, chunk)
        dy = vy[:, None] * cn[None, :, 1]
        dz = vz[:, None] * cn[None, :, 2]
        # combine to (r, r, r, chunk): z, y, x order
        d = (dz[:, None, None, :] + dy[None, :, None, :]
             + dx[None, None, :, :]) - cnda[None, None, None, :]
        half_diag = 0.8660254 * vs          # voxel half-diagonal
        near_plane = jnp.abs(d) <= (expand + half_diag)
        box = (mz[:, None, None, :] & my[None, :, None, :]
               & mx[None, None, :, :])
        occ_c = jnp.any(box & near_plane & cva[None, None, None, :], axis=-1)
        return occ | occ_c, None

    occ0 = jnp.zeros((r, r, r), bool)
    occ, _ = jax.lax.scan(body, occ0, jnp.arange(num_chunks))
    return occ


@functools.partial(jax.jit, static_argnames=("config", "chunk",
                                              "brick_block"))
def build_cascades(world_verts: jnp.ndarray, tri_vertices: jnp.ndarray,
                   num_faces: jnp.ndarray, centers: jnp.ndarray, *,
                   tri_albedo: jnp.ndarray | None = None,
                   tri_emissive: jnp.ndarray | None = None,
                   config: SDFConfig, chunk: int = 64,
                   brick_block: int = 256) -> SDFCascades:
    """Full cascade build from the world-space triangle soup.

    The instance-registration API of the reference
    (ffxBrixelizerRegisterBuffers / CreateInstances,
    host/ffx_brixelizer.h:287,310) maps to simply passing the registry's
    packed pools here — instances are already flattened.
    """
    n_cas = config.num_cascades
    r = config.cascade_resolution
    bsz = config.brick_size
    max_bricks = config.max_bricks
    k_tris = config.max_triangles_per_brick

    f = tri_vertices.shape[0]
    fp = ((f + chunk - 1) // chunk) * chunk
    p = world_verts[tri_vertices]             # (F, 3, 3)
    if tri_albedo is None:
        tri_albedo = jnp.full((f, 3), 0.5, jnp.float32)
    if tri_emissive is None:
        tri_emissive = jnp.zeros((f, 3), jnp.float32)
    pad = fp - f
    if pad:
        p = jnp.concatenate([p, jnp.zeros((pad, 3, 3), p.dtype)])
        tri_albedo = jnp.concatenate(
            [tri_albedo, jnp.zeros((pad, 3), jnp.float32)])
        tri_emissive = jnp.concatenate(
            [tri_emissive, jnp.zeros((pad, 3), jnp.float32)])
    valid = jnp.arange(fp) < num_faces
    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    tri_n = jnp.cross(b - a, c - a)
    tri_n = tri_n / jnp.maximum(
        jnp.linalg.norm(tri_n, axis=-1, keepdims=True), 1e-20)

    vs = jnp.asarray([config.voxel_size(i) for i in range(n_cas)], jnp.float32)
    origins = cascade_origin(centers, vs, r)   # (N, 3)

    # -- 1. occupancy ------------------------------------------------------
    occ = jnp.stack([
        _occupancy_one_cascade(a, b, c, valid, origins[i], vs[i], config,
                               chunk)
        for i in range(n_cas)])                # (N, r, r, r)

    # -- 2. allocation (stream compaction via cumsum) ----------------------
    occ_flat = occ.reshape(-1)
    ids = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    total_occ = jnp.sum(occ_flat.astype(jnp.int32))
    alloc = occ_flat & (ids < max_bricks)
    num_bricks = jnp.minimum(total_occ, max_bricks)
    overflow = total_occ - num_bricks

    voxel_flat_idx = jnp.arange(n_cas * r * r * r, dtype=jnp.int32)
    scatter_ids = jnp.where(alloc, ids, max_bricks)  # max_bricks -> dropped
    brick_voxel = jnp.zeros((max_bricks,), jnp.int32).at[scatter_ids].set(
        voxel_flat_idx, mode="drop")

    # chebyshev empty-space distance (iterated 3D min-pool): empty voxels
    # store -esd in the brick map so the march can skip esd-1 voxels with
    # the same single gather
    max_esd = 15
    esd = jnp.where(occ, 0, max_esd).astype(jnp.float32)  # (N, r, r, r)
    for _ in range(max_esd - 1):
        pooled = -jax.lax.reduce_window(
            -esd, -jnp.inf, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1),
            "SAME")
        esd = jnp.minimum(esd, pooled + 1.0)
    esd_i = jnp.clip(esd.reshape(-1).astype(jnp.int32), 1, max_esd)
    brick_map = jnp.where(alloc, ids, -esd_i).reshape(n_cas, r, r, r)

    # -- 3. emit (per brick: K nearest tris, exact texel distances) --------
    tri_lo, tri_hi = geometry.tri_aabb(a, b, c)
    tri_lo = jnp.where(valid[:, None], tri_lo, BIG)
    tri_hi = jnp.where(valid[:, None], tri_hi, -BIG)

    # brick metadata from flattened voxel id
    def brick_meta(bv):
        n = bv // (r * r * r)
        rem = bv % (r * r * r)
        z = rem // (r * r)
        y = (rem // r) % r
        x = rem % r
        vsz = vs[n]
        org = origins[n]
        vmin = org + jnp.stack([x, y, z], -1).astype(jnp.float32) * vsz[..., None]
        return n, vmin, vsz

    num_blocks = max_bricks // brick_block
    brick_ids_all = jnp.arange(max_bricks, dtype=jnp.int32)

    tex = (jnp.arange(bsz, dtype=jnp.float32) + 0.5) / bsz
    tz, ty, txx = jnp.meshgrid(tex, tex, tex, indexing="ij")
    texel_unit = jnp.stack([txx, ty, tz], axis=-1).reshape(-1, 3)  # (B^3,3) xyz

    def emit_block(blk):
        bids = jax.lax.dynamic_slice_in_dim(brick_ids_all, blk * brick_block,
                                            brick_block, 0)
        live = bids < num_bricks
        bv = brick_voxel[bids]
        n_idx, vmin, vsz = brick_meta(bv)
        bc = vmin + 0.5 * vsz[:, None]          # brick (voxel) centers
        trunc_w = config.truncation_voxels * vsz

        # K nearest triangles by AABB distance from brick center
        dlo = jnp.maximum(tri_lo[None, :, :] - bc[:, None, :], 0.0)
        dhi = jnp.maximum(bc[:, None, :] - tri_hi[None, :, :], 0.0)
        d2 = jnp.sum(jnp.maximum(dlo, dhi) ** 2, axis=-1)   # (BB, F)
        neg = -jnp.where(valid[None, :], d2, BIG)
        _, knn = jax.lax.top_k(neg, k_tris)                  # (BB, K)

        texels = (vmin[:, None, :]
                  + texel_unit[None, :, :] * vsz[:, None, None])  # (BB,B^3,3)

        def k_body(dmin, kk):
            tri = knn[:, kk]                                  # (BB,)
            ta, tb, tc = a[tri], b[tri], c[tri]               # (BB, 3)
            dk = geometry.point_triangle_distance(
                texels, ta[:, None, :], tb[:, None, :], tc[:, None, :])
            ok = valid[tri]
            dk = jnp.where(ok[:, None], dk, BIG)
            return jnp.minimum(dmin, dk), None

        d0 = jnp.full((brick_block, bsz ** 3), BIG, jnp.float32)
        dmin, _ = jax.lax.scan(k_body, d0, jnp.arange(k_tris))
        d01 = jnp.clip(dmin / trunc_w[:, None], 0.0, 1.0)
        d01 = jnp.where(live[:, None], d01, 1.0)
        if config.atlas_u8:
            d01 = jnp.round(d01 * 255.0).astype(jnp.uint8)
        # nearest-surface shading cache (the radiance-cache analog the
        # reference's GI lightloop would have needed; used by the 1-bounce
        # gather in ops/gi.py)
        nearest = knn[:, 0]
        alb = jnp.where(live[:, None], tri_albedo[nearest], 0.0)
        emi = jnp.where(live[:, None], tri_emissive[nearest], 0.0)
        nrm = jnp.where(live[:, None], tri_n[nearest], 0.0)
        return (d01.reshape(brick_block, bsz, bsz, bsz), alb, emi, nrm)

    blocks, albs, emis, nrms = jax.lax.map(emit_block, jnp.arange(num_blocks))
    atlas = blocks.reshape(max_bricks, bsz, bsz, bsz)
    brick_albedo = albs.reshape(max_bricks, 3)
    brick_emissive = emis.reshape(max_bricks, 3)
    brick_normal = nrms.reshape(max_bricks, 3)

    mc, mf0, mf1 = build_march_tables(brick_map, atlas, config=config)
    return SDFCascades(center=centers, voxel_size=vs, brick_map=brick_map,
                       atlas=atlas, brick_voxel=brick_voxel,
                       brick_albedo=brick_albedo,
                       brick_emissive=brick_emissive,
                       brick_normal=brick_normal,
                       brick_irradiance=jnp.zeros((max_bricks, 3),
                                                  jnp.float32),
                       brick_light_vis=jnp.ones((max_bricks, 1),
                                                jnp.float32),
                       num_bricks=num_bricks, overflow=overflow,
                       march_coarse=mc, march_fine0=mf0, march_fine1=mf1)


def build_march_tables(brick_map: jnp.ndarray, atlas: jnp.ndarray, *,
                       config: SDFConfig, hit_texels: float = 1.5):
    """Pack the kernel-march tables (see SDFCascades docstring).

    The coarse grid is the TPU analog of Brixelizer's two-level AABB tree
    (16^3 top-level stamps, ffx_brixelizer_trace_ops.h:144-196): a VMEM-
    resident conservative skip structure; "surface voxel" bits replace the
    per-brick 8-step SDF march for the approximate (occlusion/GI) tier.
    """
    n = config.num_cascades
    r = config.cascade_resolution
    bsz = config.brick_size
    if r % 16 != 0 or r // 16 not in (1, 2, 4):
        # unsupported resolution: zero tables; march() falls back to XLA
        return (jnp.zeros((n * 4, 128), jnp.int32),
                jnp.zeros((n * 32, 128), jnp.int32),
                jnp.zeros((n * 32, 128), jnp.int32))
    s = r // 16
    s3 = s ** 3

    occ = brick_map >= 0                              # (N, R, R, R) z,y,x
    amin = atlas.reshape(atlas.shape[0], -1).min(axis=1)
    if amin.dtype == jnp.uint8:
        amin = amin.astype(jnp.float32) * (1.0 / 255.0)
    thresh = hit_texels / (config.truncation_voxels * bsz)
    surf = occ & (amin[jnp.maximum(brick_map, 0)] < thresh)

    # cells: (N, 16, s, 16, s, 16, s) with axes (cz, bz, cy, by, cx, bx)
    cz = surf.reshape(n, 16, s, 16, s, 16, s)
    cell_occ = cz.any(axis=(2, 4, 6))                 # (N, 16, 16, 16)

    cap = 15
    d = jnp.where(cell_occ, 0, cap).astype(jnp.float32)
    for _ in range(cap - 1):
        pooled = -jax.lax.reduce_window(
            -d, -jnp.inf, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1), "SAME")
        d = jnp.minimum(d, pooled + 1.0)
    cdist = jnp.clip(d, 0, cap).astype(jnp.int32).reshape(n, 4096)
    # pack 8 consecutive u4 cells per i32 word (cap 15 fits 4 bits;
    # cell flat = (cz*16+cy)*16+cx).  Halving the word count halves the
    # kernel's EVERY-STEP masked-row gather loop (64 -> 32 rows for 8
    # cascades) — the march's dominant per-step memory cost.
    cd8 = cdist.reshape(n, 512, 8)
    words = jnp.zeros(cd8.shape[:2], jnp.int32)
    for k in range(8):
        words = words | (cd8[..., k] << (4 * k))
    coarse = words.reshape(n * 4, 128).astype(jnp.int32)

    # per-cell voxel bits: bit = ((vz%s)*s + vy%s)*s + vx%s
    bits = cz.transpose(0, 1, 3, 5, 2, 4, 6).reshape(n, 4096, s3)
    bits = bits.astype(jnp.int32)
    lo = min(s3, 32)
    w0 = jnp.sum(bits[..., :lo] << jnp.arange(lo, dtype=jnp.int32), axis=-1)
    if s3 > 32:
        w1 = jnp.sum(bits[..., 32:] << jnp.arange(s3 - 32, dtype=jnp.int32),
                     axis=-1)
    else:
        w1 = jnp.zeros_like(w0)
    fine0 = w0.reshape(n * 32, 128)
    fine1 = w1.reshape(n * 32, 128)
    return coarse, fine0, fine1


def brick_positions(cascades: "SDFCascades", config: SDFConfig):
    """World-space voxel centers + cascade index per brick slot."""
    r = config.cascade_resolution
    bv = cascades.brick_voxel
    n = bv // (r * r * r)
    rem = bv % (r * r * r)
    z = rem // (r * r)
    y = (rem // r) % r
    x = rem % r
    vs = cascades.voxel_size[n]
    org = cascades.center[n] - 0.5 * r * vs[:, None]
    centers = org + (jnp.stack([x, y, z], -1).astype(jnp.float32) + 0.5) \
        * vs[:, None]
    return centers, n


@functools.partial(jax.jit, static_argnames=("config", "shadow_steps"))
def bake_brick_lighting(cascades: "SDFCascades", scene, *,
                        config: SDFConfig, shadow_steps: int = 32,
                        alive: jnp.ndarray | None = None
                        ) -> "SDFCascades":
    """Bake SDF-shadowed direct irradiance at every brick's surface point.

    This is the radiance-cache step Brixelizer-GI pairs with its SDF (the
    reference never reached it — its lightloop is stubbed): the 1-bounce
    gather then reads cached irradiance instead of marching shadow rays from
    every GI hit, amortizing lighting over all pixels and frames.
    """
    from vri_tpu.ops import gi as gi_mod

    centers, _ = brick_positions(cascades, config)
    nrm = cascades.brick_normal
    bias = gi_mod.surface_bias(centers, cascades, config)[:, None]
    pts = centers + nrm * bias
    irr, vis = gi_mod.direct_radiance(pts, nrm, scene, cascades, config,
                                      shadow_steps=shadow_steps,
                                      return_visibility=True)
    # after incremental updates live slots are no longer a prefix — pass
    # the BuildState's alive mask (ops/sdf_build.py)
    live = (jnp.arange(cascades.atlas.shape[0]) < cascades.num_bricks
            if alive is None else alive)
    irr = jnp.where(live[:, None], irr, 0.0)
    vis = jnp.where(live[:, None], vis, 1.0)
    # voxel-indexed shading table: flatten the brick indirection once per
    # bake (one (N*R^3)-row gather here, brick ids are voxel-coherent)
    # instead of once per GI ray per frame (random hit voxels)
    shade = jnp.concatenate(
        [cascades.brick_albedo, cascades.brick_normal, irr,
         cascades.brick_emissive,
         jnp.zeros((cascades.brick_albedo.shape[0], 4), jnp.float32)],
        axis=1)
    shade = jnp.where(live[:, None], shade, 0.0)
    bm = cascades.brick_map.reshape(-1)
    # bf16 rows: the table is DRAM-latency-bound at gather time (134 MB
    # at 2^18 bricks in f32); halving the row footprint improves per-row
    # latency and the values only feed bounce SHADING (read-only, never
    # accumulated in place), so the 2^-8 quantization is invisible
    vshade = jnp.where((bm >= 0)[:, None], shade[jnp.maximum(bm, 0)],
                       0.0).astype(jnp.bfloat16)
    return cascades.replace(brick_irradiance=irr, brick_light_vis=vis,
                            voxel_shade=vshade)


def lighting_dirty_bricks(cascades: "SDFCascades", scene, dirty_lo,
                          dirty_hi, *, config: SDFConfig,
                          distant_reach: float = 1.0e3) -> jnp.ndarray:
    """Conservative (max_bricks,) mask of bricks whose BAKED direct
    lighting can change when geometry confined to the ``dirty_lo/hi``
    AABBs moved: the brick's shadow segment (surface point -> each
    light) intersects a dirty box, so the moved geometry may newly block
    or unblock it.  Padded dead boxes (+BIG/-BIG lo>hi) fail the slab
    test for free.  Distant lights use a ``distant_reach`` segment along
    the light direction.  Scanned over boxes so peak memory stays at
    (bricks, lights, 3)."""
    from vri_tpu.ops import gi as gi_mod

    centers, cas_i = brick_positions(cascades, config)
    lp, lc, li, lt = gi_mod._light_arrays(scene)
    is_distant = (lt == 1)[None, :, None]
    p0 = centers[:, None, :]                                # (B, L, 3)
    end = jnp.where(is_distant, p0 + lp[None, :, :] * distant_reach,
                    jnp.broadcast_to(lp[None, :, :], p0.shape))
    d = end - p0
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)

    # moved geometry reshapes the FIELD out to the truncation distance —
    # inflate the boxes so a segment grazing the changed field (not just
    # the changed surface) is caught.  The reach is PER-BRICK (its own
    # cascade's truncation): a coarsest-cascade-wide inflate blanketed a
    # large share of production atlases into the re-bake set for a small
    # prop move (the bench kitchen overflowed bake_brick_cap).  A brick's
    # shadow segment samples the field at ITS cascade resolution near the
    # start; the conservative cross-cascade case is covered by the
    # distant march reading coarser cascades whose own bricks carry their
    # own (larger) reach.  Dead pad boxes stay inverted under the inflate.
    reach = (config.truncation_voxels
             * cascades.voxel_size[cas_i])[:, None, None]   # (B, 1, 1)

    def one_box(mask, box):
        # dead pad boxes are inverted (+BIG lo / -BIG hi); the per-axis
        # min/max swap below would UN-invert them into an everything-box
        # (this exact bug once flagged the whole atlas dirty), so test
        # validity explicitly
        ok_box = jnp.all(box[0] <= box[1])
        lo = box[0][None, None, :] - reach                  # (B, 1, 3)
        hi = box[1][None, None, :] + reach
        t1 = (lo - p0) * inv
        t2 = (hi - p0) * inv
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)        # (B, L)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= 1.0) & ok_box
        return mask | jnp.any(hit, axis=-1), None

    boxes = jnp.stack([dirty_lo, dirty_hi], axis=1)         # (D, 2, 3)
    mask0 = jnp.zeros((centers.shape[0],), bool)
    mask, _ = jax.lax.scan(one_box, mask0, boxes)
    return mask


@functools.partial(jax.jit, static_argnames=("config", "shadow_steps",
                                             "cap", "axis_name"))
def bake_brick_lighting_partial(cascades: "SDFCascades", scene, mask,
                                alive, *, config: SDFConfig,
                                cap: int = 16384, shadow_steps: int = 32,
                                axis_name: tuple | None = None):
    """Re-bake irradiance/visibility for ONLY the bricks in ``mask``
    (payload-dirty ∪ lighting-dirty — the animated-frame path); all
    other bricks keep their baked values, so the per-frame shadow-march
    cost scales with the dirty set instead of the whole atlas (the full
    bake marches every one of max_bricks points).  Returns
    (cascades, dropped): ``dropped`` > 0 means the compacted set
    exceeded ``cap`` and the caller must fall back to the full bake
    (counted, never silent).  The voxel-shade table rebuilds from the
    merged brick rows exactly as the full bake does."""
    from vri_tpu.ops import gi as gi_mod

    sel = mask & alive
    pos = jnp.nonzero(sel, size=cap, fill_value=-1)[0]
    dropped = jnp.maximum(jnp.sum(sel.astype(jnp.int32)) - cap, 0)
    ids = jnp.maximum(pos, 0)
    centers, _ = brick_positions(cascades, config)
    bake_pos = pos
    if axis_name is not None:
        # shard the compacted re-bake rows over the mesh axis (the shadow
        # march per point is the whole cost); one tiled all_gather merges.
        # ``(None, n)`` = single-chip measurement proxy: slice 0 of n,
        # scattered alone (see sdf_build._apply_dirty_cells)
        ax, n_shard = axis_name
        assert cap % n_shard == 0
        per = cap // n_shard
        i0 = (jax.lax.axis_index(ax) if ax is not None
              else jnp.int32(0)) * per
        my = jax.lax.dynamic_slice_in_dim(ids, i0, per, 0)
        c = centers[my]
        nrm = cascades.brick_normal[my]
        bias = gi_mod.surface_bias(c, cascades, config)[:, None]
        pts = c + nrm * bias
        irr, vis = gi_mod.direct_radiance(pts, nrm, scene, cascades,
                                          config,
                                          shadow_steps=shadow_steps,
                                          return_visibility=True)
        if ax is not None:
            irr = jax.lax.all_gather(irr, ax, axis=0, tiled=True)
            vis = jax.lax.all_gather(vis, ax, axis=0, tiled=True)
        else:
            bake_pos = jax.lax.dynamic_slice_in_dim(pos, i0, per, 0)
    else:
        c = centers[ids]
        nrm = cascades.brick_normal[ids]
        bias = gi_mod.surface_bias(c, cascades, config)[:, None]
        pts = c + nrm * bias
        irr, vis = gi_mod.direct_radiance(pts, nrm, scene, cascades,
                                          config,
                                          shadow_steps=shadow_steps,
                                          return_visibility=True)
    nb = cascades.atlas.shape[0]
    tgt = jnp.where(bake_pos >= 0, jnp.maximum(bake_pos, 0), nb)
    irr_all = cascades.brick_irradiance.at[tgt].set(irr, mode="drop")
    vis_all = cascades.brick_light_vis.at[tgt].set(vis, mode="drop")
    irr_all = jnp.where(alive[:, None], irr_all, 0.0)
    vis_all = jnp.where(alive[:, None], vis_all, 1.0)
    shade = jnp.concatenate(
        [cascades.brick_albedo, cascades.brick_normal, irr_all,
         cascades.brick_emissive, jnp.zeros((nb, 4), jnp.float32)],
        axis=1)
    shade = jnp.where(alive[:, None], shade, 0.0)
    bm = cascades.brick_map.reshape(-1)
    vshade = jnp.where((bm >= 0)[:, None], shade[jnp.maximum(bm, 0)],
                       0.0).astype(jnp.bfloat16)
    return cascades.replace(brick_irradiance=irr_all,
                            brick_light_vis=vis_all,
                            voxel_shade=vshade), dropped


def build_for_scene(scene, world_verts, focus, config: SDFConfig,
                    **kw) -> SDFCascades:
    centers = default_centers(config, focus)
    mat = scene.instance_material[scene.tri_instance]
    tri_albedo = scene.mat_base_color[mat]
    tri_emissive = scene.mat_emissive[mat]
    return build_cascades(world_verts, scene.tri_vertices, scene.num_faces,
                          centers, tri_albedo=tri_albedo,
                          tri_emissive=tri_emissive, config=config, **kw)
