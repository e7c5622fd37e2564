"""Scalable cell-binned SDF cascade builder + bounded incremental updates.

This replaces the dense O(R^3 * F) voxelizer and O(bricks * F) emit of
``ops/sdf.py`` with the TPU-native equivalent of Brixelizer's per-brick
*reference lists* (the reference builds triangle reference arrays via
scan/compaction across ~30 indirect passes and caps them at 32M refs —
host/ffx_brixelizer_raw.h:76-112, Source/RenderPass.cpp:927-930):

  1. **bin**: each triangle emits EXACTLY one (cell, tri) pair per cell
     its (AABB + 1 voxel) covers (segmented-repeat emission, up to 8
     cells per axis) — cells are 16^3 per cascade
     (s = R/16 voxels each, matching the march kernel's coarse grid).
     One ``lax.sort_key_val`` per cascade turns the pair stream into
     capacity-bounded per-cell triangle lists, kept as a spatially
     STRATIFIED subsample when demand exceeds K (centroid-morton sort
     tiebreak; overflow counted, not silent).  Only triangles spanning
     >8 cells an axis (walls/floors) take the small per-cascade *global*
     list every cell also tests.
  2. **occupancy**: every cell tests only its own list — (cells, s^3, K)
     instead of (R^3, F).
  3. **emit**: a brick's candidate set is its cell's 27-neighborhood
     lists (exact for truncation <= one cell) + the global list; top-k
     by AABB distance, then the exact texel pass.

Because work is per-cell, updates become bounded: ``update_cascades``
re-bins only cells touched by dirty instance AABBs, re-allocates bricks
through a free-slot pool, and re-emits only bricks whose candidate lists
changed — the bounded-work semantics of ``ffxBrixelizerBakeUpdate``
(Source/RenderPass.cpp:919-1010).  ``scroll_cascades`` recenters a cascade
by rolling the maps one whole cell at a time and treating entering cells
as dirty (cascade scroll invalidation,
gpu/brixelizer/ffx_brixelizer_cascade_ops.h:569-595).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from vri_tpu.config import SDFConfig
from vri_tpu.ops import geometry
from vri_tpu.ops.sdf import (SDFCascades, BIG, cascade_origin,
                             build_march_tables)

# Row layout of the per-slot reference tables: lo3 hi3 n3 nda id
ROW = 11
_PAD_ROW = jnp.asarray([BIG, BIG, BIG, -BIG, -BIG, -BIG,
                        0.0, 0.0, 0.0, BIG, -1.0], jnp.float32)


def supports(config: SDFConfig) -> bool:
    """Cell binning requires 16^3 cells and truncation <= one cell."""
    r = config.cascade_resolution
    return (r % 16 == 0 and r // 16 >= 1
            and config.truncation_voxels <= r // 16)


@flax.struct.dataclass
class BuildState:
    """Persistent binning state enabling bounded incremental updates."""

    cell_tris: jnp.ndarray    # (N, 4096, K) i32 triangle ids, -1 padded
    cell_count: jnp.ndarray   # (N, 4096) i32 (uncapped true count)
    cell_rows: jnp.ndarray    # (N*4096, K, ROW) f32 slot data
    glob_tris: jnp.ndarray    # (N, Kg) i32 large-triangle ids
    glob_rows: jnp.ndarray    # (N, Kg, ROW) f32
    alive: jnp.ndarray        # (max_bricks,) bool — atlas slot in use
    list_overflow: jnp.ndarray  # () i32 — refs dropped at capacity
    # (max_bricks,) bool — bricks whose payload the LAST build/update
    # emitted (full build: every live brick).  The incremental radiance
    # bake re-bakes exactly these plus the shadow-segment-dirty set
    # (sdf.bake_brick_lighting_partial) instead of the whole atlas.
    emit_bricks: jnp.ndarray = None


def _tri_table(a, b, c, valid):
    """(Fp, ROW) per-triangle row data (world AABB, plane, id)."""
    # triangle ids ride an f32 column, exact only to 2^24 (ADVICE r2)
    assert a.shape[0] < (1 << 24), \
        f"face cap {a.shape[0]} exceeds f32-exact id range (2^24)"
    lo, hi = geometry.tri_aabb(a, b, c)
    n = jnp.cross(b - a, c - a)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    nda = jnp.sum(n * a, axis=-1)
    ids = jnp.arange(a.shape[0], dtype=jnp.float32)
    table = jnp.concatenate(
        [lo, hi, n, nda[:, None], ids[:, None]], axis=1)
    return jnp.where(valid[:, None], table, _PAD_ROW[None, :])


def _rows_from_lists(lists, table):
    """Gather (…, K) triangle ids -> (…, K, ROW), padding id<0 slots."""
    safe = jnp.maximum(lists, 0)
    rows = table[safe]
    return jnp.where((lists >= 0)[..., None], rows, _PAD_ROW)


def _cell_span(tri_lo, tri_hi, origin, vs, r, reach_vox: float):
    """Inclusive cell-coordinate span of each triangle's AABB expanded by
    ``reach_vox`` voxels — the binning reach.  Emit candidates need
    truncation reach (a triangle shapes the SDF of every voxel within
    ``truncation_voxels`` of its surface), so each brick's OWN cell list
    holds every relevant candidate exactly once and the emit stage needs
    no neighbor-cell gather (and no duplicate candidates eating top-k
    slots); the occupancy test re-filters to its tighter 1-voxel box."""
    s = r // 16
    cw = s * vs
    e = reach_vox * vs
    clo = jnp.floor((tri_lo - e - origin) / cw).astype(jnp.int32)
    chi = jnp.floor((tri_hi + e - origin) / cw).astype(jnp.int32)
    return clo, chi


_OFFSETS = jnp.asarray(
    [[ox, oy, oz] for oz in (0, 1) for oy in (0, 1) for ox in (0, 1)],
    jnp.int32)                                            # (8, 3)


_BIN_SPAN_CAP = 8        # per-axis cells a triangle may emit exactly
_BIN_PAIRS_MULT = 12     # pairs capacity = mult * working-set size


def _bin_one_cascade(tri_lo, tri_hi, valid, origin, vs, r, K, Kg,
                     tri_ids=None, reach_vox: float = 1.0):
    """(cell_tris (4096,K), count (4096,), glob (Kg,), overflow ()).

    EXACT segmented (cell, tri) emission (round 4; the 2x2x2-offset
    emission this replaces classified every triangle spanning >2 cells
    per axis as "global", which saturated the Kg list on scenes whose
    props are a few cells tall — 10k+ silently degraded refs on the
    kitchen stage): each in-grid triangle with clipped span <=
    _BIN_SPAN_CAP cells per axis emits exactly its span product via the
    raster's scatter+cumsum segmented-repeat (ops/rasterize.py), sorted
    by (cell, centroid-stratum): when a cell's demand exceeds K the
    kept K are a SPATIALLY STRATIFIED subsample (2-bit cell-local
    centroid morton in the sort key), not a mesh-order prefix, so
    occupancy coverage degrades gracefully and the drop is counted.
    Only genuinely huge triangles (walls / floors spanning >8 cells an
    axis) take the Kg global list.

    ``tri_ids`` maps the working set back to global triangle ids when
    binning a compacted dirty subset (incremental updates)."""
    f = tri_lo.shape[0]
    if tri_ids is None:
        tri_ids = jnp.arange(f, dtype=jnp.int32)
    clo, chi = _cell_span(tri_lo, tri_hi, origin, vs, r,
                          reach_vox)                       # (F, 3)
    inside = (valid & jnp.all(chi >= 0, -1)
              & jnp.all(clo < 16, -1))
    clo_c = jnp.clip(clo, 0, 15)
    chi_c = jnp.clip(chi, 0, 15)
    nspan = chi_c - clo_c + 1                              # (F, 3) >= 1
    # classify by the UNCLIPPED span so the small/global split is
    # window-independent (a clipped span would reclassify border
    # triangles between a scrolled window and a fresh build)
    small = inside & jnp.all(chi - clo + 1 <= _BIN_SPAN_CAP, -1)
    large = inside & ~small

    # exact pair emission (segmented repeat, 3-D decode).  The pair
    # capacity scales with the cell size: at s = r/16 voxels per cell the
    # 1-voxel binning reach alone spans ceil(2/s)+1 cells per axis, so
    # single-voxel-cell configs (s=1, e.g. the tiny test preset) emit
    # ~4^3 pairs per triangle where s>=4 emits ~2^3.
    s_cells = max(r // 16, 1)
    mult = _BIN_PAIRS_MULT * max(1, (1 + 2 // s_cells) ** 2)
    ext = jnp.where(small, nspan[:, 0] * nspan[:, 1] * nspan[:, 2], 0)
    starts_x = jnp.cumsum(ext) - ext
    total = starts_x[-1] + ext[-1]
    pairs_cap = -(-max(mult * f, 32768) // 1024) * 1024
    overflow = jnp.maximum(total - pairs_cap, 0)

    # per-pair source triangle via searchsorted (the raster uses a
    # monotone-carry trick instead; a build runs once per geometry
    # change, so a few (pairs,) gathers are the simpler correct choice
    # and impose no bit-packing limit on the working-set size)
    cum_ext = jnp.cumsum(ext)
    j = jnp.arange(pairs_cap, dtype=jnp.int32)
    tri_of = jnp.minimum(
        jnp.searchsorted(cum_ext, j, side="right"), f - 1).astype(jnp.int32)
    k_start = (cum_ext[tri_of] - ext[tri_of]).astype(jnp.int32)
    nx = jnp.maximum(nspan[tri_of, 0], 1).astype(jnp.float32)
    ny = jnp.maximum(nspan[tri_of, 1], 1).astype(jnp.float32)
    k_local = (j - k_start).astype(jnp.float32)
    # exact f32 floor division (k_local < 512 << f32 mantissa)
    dx = jnp.floor((k_local + 0.5) % nx).astype(jnp.int32)
    t = jnp.floor((k_local + 0.5) / nx).astype(jnp.int32)
    dy = jnp.floor((t.astype(jnp.float32) + 0.5)
                   % ny).astype(jnp.int32)
    dz = jnp.floor((t.astype(jnp.float32) + 0.5) / ny).astype(jnp.int32)
    base_c = clo_c[tri_of]                                 # (pairs, 3)
    cell = (base_c[:, 2] + dz) * 256 + (base_c[:, 1] + dy) * 16 \
        + (base_c[:, 0] + dx)
    dead = j >= total

    # spatial stratum: 2-bit per axis cell-local centroid position of the
    # SOURCE triangle (same for all its pairs) — the per-cell tiebreak
    centroid = 0.5 * (tri_lo + tri_hi)
    cellw = vs * (r // 16)
    frac = (centroid - origin) / cellw
    strat3 = jnp.clip(((frac - jnp.floor(frac)) * 4.0).astype(jnp.int32),
                      0, 3)
    strat = (strat3[:, 2] << 4) | (strat3[:, 1] << 2) | strat3[:, 0]
    key = (cell.astype(jnp.uint32) << 6) | strat[tri_of].astype(jnp.uint32)
    key = jnp.where(dead, jnp.uint32(4096 << 6), key)
    vals = jnp.where(dead, -1, tri_ids[tri_of])
    skeys, stris = jax.lax.sort_key_val(key, vals, is_stable=True)

    starts = jnp.searchsorted(
        skeys, (jnp.arange(4097, dtype=jnp.uint32) << 6))
    count = (starts[1:] - starts[:-1]).astype(jnp.int32)   # (4096,)
    k_ids = jnp.arange(K, dtype=jnp.int32)
    gidx = starts[:4096, None].astype(jnp.int32) + k_ids[None, :]
    in_seg = k_ids[None, :] < count[:, None]
    cell_tris = jnp.where(
        in_seg, stris[jnp.minimum(gidx, pairs_cap - 1)], -1)
    overflow += jnp.sum(jnp.maximum(count - K, 0))

    gpos = jnp.nonzero(large, size=Kg, fill_value=-1)[0].astype(jnp.int32)
    glob = jnp.where(gpos >= 0, tri_ids[jnp.maximum(gpos, 0)], -1)
    overflow += jnp.maximum(jnp.sum(large.astype(jnp.int32)) - Kg, 0)
    return cell_tris, jnp.minimum(count, K), glob, overflow


def _cell_voxel_centers(origin, vs, r):
    """World centers of every voxel, grouped per cell: (4096, s^3, 3)."""
    s = r // 16
    ax = origin[None, :] + (jnp.arange(r, dtype=jnp.float32)[:, None] + 0.5) \
        * vs                                             # (r, 3): per-axis
    wz, wy, wx = ax[:, 2], ax[:, 1], ax[:, 0]
    pts = jnp.stack(jnp.meshgrid(wz, wy, wx, indexing="ij"),
                    axis=-1)[..., ::-1]                  # (r, r, r, 3) xyz
    g = pts.reshape(16, s, 16, s, 16, s, 3)              # (cz,lz,cy,ly,cx,lx)
    return g.transpose(0, 2, 4, 1, 3, 5, 6).reshape(4096, s ** 3, 3)


def _occupancy_cells(rows, grows, centers, vs):
    """Cell-list occupancy test: (cells, s^3) bool.

    Matches the dense builder's semantics exactly: voxel center within the
    triangle AABB expanded by one voxel, refined by |plane distance| <=
    (voxel + half diagonal).
    """
    def test(rws):                                  # (cells, K, ROW)
        lo = rws[:, None, :, 0:3] - vs              # (cells, 1, K, 3)
        hi = rws[:, None, :, 3:6] + vs
        p = centers[:, :, None, :]                  # (cells, s3, 1, 3)
        box = jnp.all((p >= lo) & (p <= hi), axis=-1)
        d = jnp.sum(p * rws[:, None, :, 6:9], -1) - rws[:, None, :, 9]
        near = jnp.abs(d) <= (1.8660254 * vs)
        return jnp.any(box & near, axis=-1)         # (cells, s3)

    occ = test(rows)
    if grows is not None:
        occ |= test(jnp.broadcast_to(grows[None], (rows.shape[0],)
                                     + grows.shape))
    return occ


def _cells_to_grid(occ_cells, r):
    """(4096, s^3) cell-major -> (R, R, R) voxel grid (z, y, x)."""
    s = r // 16
    g = occ_cells.reshape(16, 16, 16, s, s, s)      # (cz,cy,cx,lz,ly,lx)
    return g.transpose(0, 3, 1, 4, 2, 5).reshape(r, r, r)


def _grid_to_cells(grid, r):
    s = r // 16
    g = grid.reshape(16, s, 16, s, 16, s)           # (cz,lz,cy,ly,cx,lx)
    return g.transpose(0, 2, 4, 1, 3, 5).reshape(4096, s ** 3)


_NB_OFFSETS = jnp.asarray(
    [[ox, oy, oz] for oz in (-1, 0, 1) for oy in (-1, 0, 1)
     for ox in (-1, 0, 1)], jnp.int32)               # (27, 3)


def esd_map(occ, max_esd: int = 15):
    """Chebyshev empty-space distance via iterated 3-D min-pool."""
    d = jnp.where(occ, 0, max_esd).astype(jnp.float32)
    for _ in range(max_esd - 1):
        pooled = -jax.lax.reduce_window(
            -d, -jnp.inf, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1), "SAME")
        d = jnp.minimum(d, pooled + 1.0)
    return jnp.clip(d.reshape(-1).astype(jnp.int32), 1, max_esd)


def _emit_blocks(brick_ids, live, brick_voxel, state: BuildState,
                 origins, vs, a, b, c, valid, tri_albedo, tri_emissive,
                 tri_n, config: SDFConfig, block: int):
    """Emit atlas bricks + shading cache for ``brick_ids`` (padded, 2-D
    (num_blocks, block)).  Returns per-brick arrays shaped like the ids."""
    r = config.cascade_resolution
    s = r // 16
    bsz = config.brick_size
    k_tris = config.max_triangles_per_brick
    K = state.cell_tris.shape[-1]
    Kg = state.glob_tris.shape[-1]
    r3 = r ** 3

    tex = (jnp.arange(bsz, dtype=jnp.float32) + 0.5) / bsz
    tz, ty, txx = jnp.meshgrid(tex, tex, tex, indexing="ij")
    texel_unit = jnp.stack([txx, ty, tz], axis=-1).reshape(-1, 3)

    def emit_block(args):
        bids, blive = args                           # (block,)
        bv = brick_voxel[bids]
        n_idx = bv // r3
        rem = bv % r3
        vx, vy, vz = rem % r, (rem // r) % r, rem // (r * r)
        vsz = vs[n_idx]
        org = origins[n_idx]
        vmin = org + jnp.stack([vx, vy, vz], -1).astype(jnp.float32) \
            * vsz[:, None]
        bc = vmin + 0.5 * vsz[:, None]
        trunc_w = config.truncation_voxels * vsz

        # candidate rows: 27-neighborhood cell lists + the global list.
        # (Binning at truncation reach so a brick's OWN list holds every
        # candidate once was tried in round 4: exact and 27x cheaper to
        # gather, but per-cell reach demand is ~100+ refs at production
        # density — 861k/11.5M counted drops at K=128 on kitchen
        # tess=1/4 — so fixed-K tables can't hold it; needs the
        # variable-length ref-stream rework, docs/ROADMAP.md.)
        cxyz = jnp.stack([vx // s, vy // s, vz // s], -1)   # (block, 3)
        nb = cxyz[:, None, :] + _NB_OFFSETS[None, :, :]     # (block, 27, 3)
        nb = jnp.clip(nb, 0, 15)
        ncell = (n_idx[:, None] * 4096
                 + (nb[..., 2] * 16 + nb[..., 1]) * 16 + nb[..., 0])
        crows = state.cell_rows[ncell].reshape(block, 27 * K, ROW)
        grows = state.glob_rows[n_idx]                      # (block, Kg, ROW)
        cand = jnp.concatenate([crows, grows], axis=1)      # (block, C, ROW)

        dlo = jnp.maximum(cand[..., 0:3] - bc[:, None, :], 0.0)
        dhi = jnp.maximum(bc[:, None, :] - cand[..., 3:6], 0.0)
        d2 = jnp.sum(jnp.maximum(dlo, dhi) ** 2, axis=-1)
        d2 = jnp.where(cand[..., 10] >= 0.0, d2, BIG)
        # DEDUP by OWNERSHIP: since round 4's exact emission a triangle
        # spanning multiple cells appears in several neighborhood lists;
        # duplicates would eat top-k slots and inflate near_drop.  Keep
        # each candidate only in ONE canonical neighbor cell: the clamp
        # of its AABB-center cell into the 27-neighborhood.  The clamp
        # lands inside the triangle's emitted span (monotone ops), so
        # the canonical cell's list contains it — every pooled triangle
        # survives exactly once, in O(1) per candidate (a sort-based
        # dedup here measured 12 s/build).  Global-list candidates
        # (slots past 27*K) are singletons already.
        # CAVEAT (ADVICE r4): the canonical-cell guarantee holds only
        # when no cell saturated K — if the stratified subsample dropped
        # a triangle from its canonical cell while a neighbor kept it,
        # ownership masks the surviving copy too and the triangle leaves
        # this brick's candidate set entirely.  That loss is BOUNDED BY
        # THE COUNTED LIST OVERFLOW (a triangle can only vanish here if
        # it was dropped somewhere, which list_overflow counts), and
        # production builds run overflow-free since demand-scaled caps
        # (demand_caps / renderer.ensure_cascades) size K to the scene.
        ctr = 0.5 * (cand[..., 0:3] + cand[..., 3:6])       # (block, C, 3)
        ctr_cell = jnp.floor(
            (ctr - org[:, None, :]) / (s * vsz)[:, None, None]
        ).astype(jnp.int32)
        # clamp into the IN-GRID part of the neighborhood (grid-edge
        # bricks have a truncated neighborhood; out-of-range nb slots are
        # clip-duplicates of edge cells and are masked below)
        lo_nb = jnp.maximum(cxyz[:, None, :] - 1, 0)
        hi_nb = jnp.minimum(cxyz[:, None, :] + 1, 15)
        canon = jnp.clip(ctr_cell, lo_nb, hi_nb)            # (block, C, 3)
        nb_raw = cxyz[:, None, :] + _NB_OFFSETS[None, :, :]
        nb_ok = (jnp.all(nb_raw >= 0, -1)
                 & jnp.all(nb_raw < 16, -1))                # (block, 27)
        slot_ok = jnp.broadcast_to(
            nb_ok[:, :, None], (block, 27, K)).reshape(block, 27 * K)
        nb_of_slot = jnp.broadcast_to(
            nb[:, :, None, :], (block, 27, K, 3)).reshape(block, 27 * K, 3)
        owner = slot_ok & jnp.all(canon[:, :27 * K] == nb_of_slot, axis=-1)
        owner = jnp.concatenate(
            [owner, jnp.ones((block, Kg), bool)], axis=1)
        d2 = jnp.where(owner, d2, BIG)
        _, ki = jax.lax.top_k(-d2, k_tris)                  # (block, k)
        knn = jnp.take_along_axis(cand[..., 10], ki, axis=1).astype(jnp.int32)
        knn_ok = jnp.take_along_axis(d2, ki, axis=1) < BIG
        # candidates within truncation reach beyond the k nearest are
        # DROPPED — the emitted SDF overestimates distance there.  Count
        # them like every other cap (VERDICT r2 weak #5).  Candidate rows
        # may repeat a triangle across neighbor cells; the count uses the
        # same candidate set top_k selects from, so it bounds what the emit
        # actually lost.
        n_near = jnp.sum((d2 <= (trunc_w[:, None] ** 2)).astype(jnp.int32),
                         axis=1)
        near_drop = jnp.where(blive, jnp.maximum(n_near - k_tris, 0), 0)

        texels = (vmin[:, None, :]
                  + texel_unit[None, :, :] * vsz[:, None, None])

        def k_body(dmin, kk):
            tri = jnp.maximum(knn[:, kk], 0)
            ta, tb, tc = a[tri], b[tri], c[tri]
            dk = geometry.point_triangle_distance(
                texels, ta[:, None, :], tb[:, None, :], tc[:, None, :])
            ok = knn_ok[:, kk] & valid[tri]
            dk = jnp.where(ok[:, None], dk, BIG)
            return jnp.minimum(dmin, dk), None

        d0 = jnp.full((block, bsz ** 3), BIG, jnp.float32)
        dmin, _ = jax.lax.scan(k_body, d0, jnp.arange(k_tris))
        d01 = jnp.clip(dmin / trunc_w[:, None], 0.0, 1.0)
        d01 = jnp.where(blive[:, None], d01, 1.0)
        if config.atlas_u8:
            d01 = jnp.round(d01 * 255.0).astype(jnp.uint8)
        nearest = jnp.maximum(knn[:, 0], 0)
        ok0 = blive & knn_ok[:, 0]
        alb = jnp.where(ok0[:, None], tri_albedo[nearest], 0.0)
        emi = jnp.where(ok0[:, None], tri_emissive[nearest], 0.0)
        nrm = jnp.where(ok0[:, None], tri_n[nearest], 0.0)
        return d01.reshape(block, bsz, bsz, bsz), alb, emi, nrm, near_drop

    return jax.lax.map(emit_block, (brick_ids, live))


def _prep_tris(world_verts, tri_vertices, num_faces, tri_albedo,
               tri_emissive, chunk_pad: int = 128):
    f = tri_vertices.shape[0]
    p = world_verts[tri_vertices]
    if tri_albedo is None:
        tri_albedo = jnp.full((f, 3), 0.5, jnp.float32)
    if tri_emissive is None:
        tri_emissive = jnp.zeros((f, 3), jnp.float32)
    valid = jnp.arange(f) < num_faces
    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    tri_n = jnp.cross(b - a, c - a)
    tri_n = tri_n / jnp.maximum(
        jnp.linalg.norm(tri_n, axis=-1, keepdims=True), 1e-20)
    return a, b, c, valid, tri_n, tri_albedo, tri_emissive


@functools.partial(jax.jit, static_argnames=("config", "brick_block"))
def build_cascades_binned(world_verts, tri_vertices, num_faces, centers, *,
                          tri_albedo=None, tri_emissive=None,
                          config: SDFConfig, brick_block: int = 256):
    """Full cascade build through cell reference lists.

    Produces the same SDFCascades contract as ``sdf.build_cascades`` but
    with cost O(F log F + cells * K) instead of O(R^3 * F) — and returns
    the BuildState that makes later ``update_cascades`` calls bounded.
    """
    n_cas = config.num_cascades
    r = config.cascade_resolution
    max_bricks = config.max_bricks
    K = config.cell_list_cap
    Kg = config.global_list_cap

    a, b, c, valid, tri_n, tri_albedo, tri_emissive = _prep_tris(
        world_verts, tri_vertices, num_faces, tri_albedo, tri_emissive)
    tri_lo, tri_hi = geometry.tri_aabb(a, b, c)
    table = _tri_table(a, b, c, valid)

    vs = jnp.asarray([config.voxel_size(i) for i in range(n_cas)],
                     jnp.float32)
    origins = cascade_origin(centers, vs, r)

    # -- 1. bin ------------------------------------------------------------
    cell_tris, cell_count, glob_tris, glob_rows_l, overflow = [], [], [], [], 0
    for n in range(n_cas):
        ct, cc, gt, ov = _bin_one_cascade(
            tri_lo, tri_hi, valid, origins[n], vs[n], r, K, Kg)
        cell_tris.append(ct)
        cell_count.append(cc)
        glob_tris.append(gt)
        overflow = overflow + ov
    cell_tris = jnp.stack(cell_tris)                   # (N, 4096, K)
    cell_count = jnp.stack(cell_count)
    glob_tris = jnp.stack(glob_tris)                   # (N, Kg)
    cell_rows = _rows_from_lists(cell_tris, table).reshape(
        n_cas * 4096, K, ROW)
    glob_rows = _rows_from_lists(glob_tris, table)     # (N, Kg, ROW)

    # -- 2. occupancy from lists -------------------------------------------
    occs = []
    for n in range(n_cas):
        centers_n = _cell_voxel_centers(origins[n], vs[n], r)
        oc = _occupancy_cells(cell_rows[n * 4096:(n + 1) * 4096],
                              glob_rows[n], centers_n, vs[n])
        occs.append(_cells_to_grid(oc, r))
    occ = jnp.stack(occs)                              # (N, R, R, R)

    # -- 3. allocation (cumsum compaction, as the dense builder) ------------
    occ_flat = occ.reshape(-1)
    ids = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    total_occ = jnp.sum(occ_flat.astype(jnp.int32))
    alloc = occ_flat & (ids < max_bricks)
    num_bricks = jnp.minimum(total_occ, max_bricks)
    brick_overflow = total_occ - num_bricks
    voxel_flat_idx = jnp.arange(n_cas * r ** 3, dtype=jnp.int32)
    scatter_ids = jnp.where(alloc, ids, max_bricks)
    brick_voxel = jnp.zeros((max_bricks,), jnp.int32).at[scatter_ids].set(
        voxel_flat_idx, mode="drop")
    esd_i = esd_map(occ)
    brick_map = jnp.where(alloc, ids, -esd_i).reshape(n_cas, r, r, r)
    alive = jnp.arange(max_bricks) < num_bricks

    state = BuildState(cell_tris=cell_tris, cell_count=cell_count,
                       cell_rows=cell_rows, glob_tris=glob_tris,
                       glob_rows=glob_rows, alive=alive,
                       list_overflow=overflow, emit_bricks=alive)

    # -- 4. emit -------------------------------------------------------------
    num_blocks = max_bricks // brick_block
    bids = jnp.arange(max_bricks, dtype=jnp.int32)
    live = bids < num_bricks
    blocks, albs, emis, nrms, near_drop = _emit_blocks(
        bids.reshape(num_blocks, brick_block),
        live.reshape(num_blocks, brick_block),
        brick_voxel, state, origins, vs, a, b, c, valid,
        tri_albedo, tri_emissive, tri_n, config, brick_block)
    bsz = config.brick_size
    atlas = blocks.reshape(max_bricks, bsz, bsz, bsz)

    mc, mf0, mf1 = build_march_tables(brick_map, atlas, config=config)
    cascades = SDFCascades(
        center=centers, voxel_size=vs, brick_map=brick_map, atlas=atlas,
        brick_voxel=brick_voxel, brick_albedo=albs.reshape(max_bricks, 3),
        brick_emissive=emis.reshape(max_bricks, 3),
        brick_normal=nrms.reshape(max_bricks, 3),
        brick_irradiance=jnp.zeros((max_bricks, 3), jnp.float32),
        brick_light_vis=jnp.ones((max_bricks, 1), jnp.float32),
        num_bricks=num_bricks, overflow=brick_overflow,
        march_coarse=mc, march_fine0=mf0, march_fine1=mf1,
        near_drop=jnp.sum(near_drop))
    return cascades, state


# ---------------------------------------------------------------------------
# Bounded incremental updates
# ---------------------------------------------------------------------------

def _cell_meta(cell_ids, origins, vs, r):
    """Per dirty cell: cascade index, voxel flat ids (C, s^3), voxel world
    centers (C, s^3, 3).  ``cell_ids`` are global (n*4096 + cell), -1 pad."""
    s = r // 16
    s3 = s ** 3
    cid = jnp.maximum(cell_ids, 0)
    n = cid // 4096
    rem = cid % 4096
    cz, cy, cx = rem // 256, (rem // 16) % 16, rem % 16
    loc = jnp.arange(s3, dtype=jnp.int32)
    lz, ly, lx = loc // (s * s), (loc // s) % s, loc % s
    vx = cx[:, None] * s + lx[None, :]                    # (C, s3)
    vy = cy[:, None] * s + ly[None, :]
    vz = cz[:, None] * s + lz[None, :]
    vox = n[:, None] * (r ** 3) + (vz * r + vy) * r + vx
    vsz = vs[n]                                           # (C,)
    org = origins[n]                                      # (C, 3)
    centers = org[:, None, :] + (jnp.stack([vx, vy, vz], -1)
                                 .astype(jnp.float32) + 0.5) \
        * vsz[:, None, None]
    return n, vox, centers


def _apply_dirty_cells(cascades: SDFCascades, state: BuildState,
                       cell_ids, new_tris, new_count, a, b, c, valid,
                       tri_n, tri_albedo, tri_emissive, table,
                       origins, vs, config: SDFConfig, brick_block: int,
                       dirty_lo=None, dirty_hi=None,
                       axis_name: tuple | None = None):
    """Shared bounded-update core: install new lists for ``cell_ids``
    (global cell ids, -1 padded, (C,)), diff occupancy, re-allocate bricks
    through the free-slot pool, re-emit affected bricks, refresh ESD +
    march tables.  Returns (cascades, state, emit_overflow).

    ``dirty_lo/hi`` (D, 3) boxes, when given, trim the re-emit set to
    voxel granularity: a surviving brick re-emits only if its voxel AABB is
    within the truncation distance of changed geometry (a cell is s voxels
    wide, so the cell-level dirty set over-approximates by up to s-1
    voxels per axis — several-fold extra emit work on dense scenes)."""
    r = config.cascade_resolution
    s3 = (r // 16) ** 3
    max_bricks = config.max_bricks
    K = state.cell_tris.shape[-1]
    Ecap = config.update_brick_cap
    C = cell_ids.shape[0]
    cvalid = cell_ids >= 0
    n_cas = state.cell_tris.shape[0]
    cid = jnp.where(cvalid, cell_ids, n_cas * 4096)   # drop sentinel

    # 1. install the new lists
    rows_new = _rows_from_lists(new_tris, table)          # (C, K, ROW)
    ct = state.cell_tris.reshape(n_cas * 4096, K).at[cid].set(
        new_tris, mode="drop")
    cc = state.cell_count.reshape(-1).at[cid].set(new_count, mode="drop")
    cr = state.cell_rows.at[cid].set(rows_new, mode="drop")
    state = state.replace(cell_tris=ct.reshape(n_cas, 4096, K),
                          cell_count=cc.reshape(n_cas, 4096),
                          cell_rows=cr)

    # 2. occupancy diff over the dirty cells (per-cell voxel size)
    n_idx, vox, centers = _cell_meta(cell_ids, origins, vs, r)
    lo = rows_new[:, None, :, 0:3] - vs[n_idx][:, None, None, None]
    hi = rows_new[:, None, :, 3:6] + vs[n_idx][:, None, None, None]
    p = centers[:, :, None, :]
    box = jnp.all((p >= lo) & (p <= hi), axis=-1)
    dpl = jnp.sum(p * rows_new[:, None, :, 6:9], -1) - rows_new[:, None, :, 9]
    near = jnp.abs(dpl) <= (1.8660254 * vs[n_idx])[:, None, None]
    occ_new = jnp.any(box & near, axis=-1)                # (C, s3)
    grows = state.glob_rows[n_idx]                        # (C, Kg, ROW)
    glo = grows[:, None, :, 0:3] - vs[n_idx][:, None, None, None]
    ghi = grows[:, None, :, 3:6] + vs[n_idx][:, None, None, None]
    gbox = jnp.all((p >= glo) & (p <= ghi), axis=-1)
    gd = jnp.sum(p * grows[:, None, :, 6:9], -1) - grows[:, None, :, 9]
    gnear = jnp.abs(gd) <= (1.8660254 * vs[n_idx])[:, None, None]
    occ_new |= jnp.any(gbox & gnear, axis=-1)
    occ_new &= cvalid[:, None]

    bm_flat = cascades.brick_map.reshape(-1)
    vox_safe = jnp.where(cvalid[:, None], vox, 0)
    old_ids = bm_flat[vox_safe]                           # (C, s3)
    old_occ = (old_ids >= 0) & cvalid[:, None]

    # 3. allocation diff through the free-slot pool
    freed = old_occ & ~occ_new
    alive = state.alive.at[
        jnp.where(freed, old_ids, max_bricks)].set(False, mode="drop")
    new_vox = (~old_occ) & occ_new
    free_ids = jnp.nonzero(~alive, size=max_bricks, fill_value=-1)[0]
    n_free = jnp.sum(~alive)
    order = jnp.cumsum(new_vox.reshape(-1).astype(jnp.int32)) - 1
    order = order.reshape(C, s3)
    slot = jnp.where(new_vox & (order < n_free),
                     free_ids[jnp.minimum(order, max_bricks - 1)], -1)
    n_new = jnp.sum(new_vox)
    brick_overflow = jnp.maximum(n_new - n_free, 0)
    alive = alive.at[jnp.where(slot >= 0, slot, max_bricks)].set(
        True, mode="drop")
    brick_voxel = cascades.brick_voxel.at[
        jnp.where(slot >= 0, slot, max_bricks)].set(vox_safe, mode="drop")
    state = state.replace(alive=alive)

    # 4. brick map scatter (freed -> placeholder, new -> slot), then ESD
    new_map_val = jnp.where(occ_new, jnp.where(old_occ, old_ids, slot), -1)
    bm_flat = bm_flat.at[jnp.where(cvalid[:, None], vox, bm_flat.shape[0])
                         ].set(new_map_val, mode="drop")
    occ_grid = (bm_flat >= 0).reshape(cascades.brick_map.shape)
    esd_i = esd_map(occ_grid)
    bm_flat = jnp.where(occ_grid.reshape(-1), bm_flat, -esd_i)
    brick_map = bm_flat.reshape(cascades.brick_map.shape)
    num_bricks = jnp.sum(alive.astype(jnp.int32))

    # 5. re-emit every (still or newly) occupied brick in a dirty cell —
    # trimmed to voxels actually within reach of the changed geometry
    emit_mask = occ_new
    if dirty_lo is not None:
        # reach = max(truncation, 1.5 voxels): atlas texels see tris within
        # trunc_w; the occupancy box test reaches 1 voxel from a triangle's
        # AABB (voxel center), i.e. 1.5 voxels for the voxel's AABB
        e = jnp.maximum(config.truncation_voxels, 1.5) * vs[n_idx]  # (C,)
        vlo = centers - 0.5 * vs[n_idx][:, None, None]   # (C, s3, 3)
        vhi = centers + 0.5 * vs[n_idx][:, None, None]
        near = jnp.all(
            (vlo[:, :, None, :] <= dirty_hi[None, None, :, :]
             + e[:, None, None, None])
            & (vhi[:, :, None, :] >= dirty_lo[None, None, :, :]
               - e[:, None, None, None]), axis=-1).any(-1)   # (C, s3)
        emit_mask = emit_mask & near
    emit_mask = emit_mask.reshape(-1)
    epos = jnp.nonzero(emit_mask, size=Ecap, fill_value=-1)[0]
    emit_overflow = jnp.maximum(jnp.sum(emit_mask) - Ecap, 0)
    evox = vox.reshape(-1)[jnp.maximum(epos, 0)]
    ebrick = jnp.where(epos >= 0, bm_flat[evox], -1)
    pad = (-Ecap) % brick_block
    if pad:
        ebrick = jnp.concatenate([ebrick, jnp.full((pad,), -1, jnp.int32)])
    nb = ebrick.shape[0] // brick_block
    # record the emitted set for the incremental radiance bake
    state = state.replace(emit_bricks=jnp.zeros(
        (max_bricks,), bool).at[jnp.where(ebrick >= 0, ebrick,
                                          max_bricks)].set(
        True, mode="drop"))
    cascades = cascades.replace(brick_map=brick_map, brick_voxel=brick_voxel,
                                num_bricks=num_bricks,
                                overflow=cascades.overflow + brick_overflow)
    emit_targets = ebrick
    if axis_name is not None:
        # SHARDED EMIT (the animated multi-chip path, VERDICT r4 #2):
        # inside shard_map every device re-derives the identical lists /
        # allocation / brick map (cheap, replicated by determinism), but
        # the expensive per-brick emit — the bounded update's cost floor,
        # proportional to the PADDED update_brick_cap — splits 1/n per
        # device; one tiled all_gather rebuilds the replicated block set
        # (Ecap x 512 B of atlas payload — ICI noise).
        # ``axis_name=(None, n)`` is the single-chip MEASUREMENT PROXY:
        # emit slice 0 of n and scatter only it (no mesh available) —
        # exactly one device's share of the sharded path's work, used by
        # bench.py's v5e-8 animated band proxy.
        ax, n_shard = axis_name
        assert nb % n_shard == 0, \
            f"update_brick_cap blocks {nb} must divide over {n_shard} devices"
        per = nb // n_shard
        idx = jax.lax.axis_index(ax) if ax is not None else jnp.int32(0)
        eb2 = ebrick.reshape(nb, brick_block)
        my = jax.lax.dynamic_slice_in_dim(eb2, idx * per, per, 0)
        blocks, albs, emis, nrms, near_drop = _emit_blocks(
            jnp.maximum(my, 0), my >= 0,
            brick_voxel, state, origins, vs, a, b, c, valid,
            tri_albedo, tri_emissive, tri_n, config, brick_block)
        if ax is not None:
            gather = lambda x: jax.lax.all_gather(x, ax, axis=0,
                                                  tiled=True)
            blocks, albs, emis, nrms = map(gather,
                                           (blocks, albs, emis, nrms))
            near_drop = jax.lax.psum(jnp.sum(near_drop), ax)
        else:
            emit_targets = my.reshape(-1)
    else:
        blocks, albs, emis, nrms, near_drop = _emit_blocks(
            jnp.maximum(ebrick, 0).reshape(nb, brick_block),
            (ebrick >= 0).reshape(nb, brick_block),
            brick_voxel, state, origins, vs, a, b, c, valid,
            tri_albedo, tri_emissive, tri_n, config, brick_block)
    bsz = config.brick_size
    tgt = jnp.where(emit_targets >= 0, emit_targets, max_bricks)
    atlas = cascades.atlas.at[tgt].set(
        blocks.reshape(-1, bsz, bsz, bsz), mode="drop")
    brick_albedo = cascades.brick_albedo.at[tgt].set(
        albs.reshape(-1, 3), mode="drop")
    brick_emissive = cascades.brick_emissive.at[tgt].set(
        emis.reshape(-1, 3), mode="drop")
    brick_normal = cascades.brick_normal.at[tgt].set(
        nrms.reshape(-1, 3), mode="drop")

    mc, mf0, mf1 = build_march_tables(brick_map, atlas, config=config)
    cascades = cascades.replace(
        atlas=atlas, brick_albedo=brick_albedo,
        brick_emissive=brick_emissive, brick_normal=brick_normal,
        march_coarse=mc, march_fine0=mf0, march_fine1=mf1,
        near_drop=cascades.near_drop + jnp.sum(near_drop))
    return cascades, state, emit_overflow


@functools.partial(jax.jit, static_argnames=("config", "brick_block",
                                             "axis_name"))
def update_cascades(cascades: SDFCascades, state: BuildState,
                    world_verts, tri_vertices, num_faces,
                    dirty_tri_mask, dirty_lo, dirty_hi, *,
                    tri_albedo=None, tri_emissive=None, config: SDFConfig,
                    brick_block: int = 256,
                    axis_name: tuple | None = None):
    """Bounded incremental cascade update.

    ``dirty_tri_mask`` (F,) marks triangles whose data changed;
    ``dirty_lo/hi`` (D, 3) are world AABBs covering all changed geometry at
    both its OLD and NEW positions (pad unused rows with +BIG/-BIG).
    Matches ``ffxBrixelizerBakeUpdate``'s bounded-work contract
    (Source/RenderPass.cpp:919-1010): work scales with the dirty region,
    not the stage.  Returns (cascades, state, needs_full) — when
    ``needs_full`` is nonzero a capacity was exceeded (or a *global* large
    triangle moved, which invalidates every cell) and the caller must fall
    back to ``build_cascades_binned``.
    """
    n_cas = config.num_cascades
    r = config.cascade_resolution
    K = config.cell_list_cap
    Kg = config.global_list_cap
    Ccap = config.update_cell_cap
    Ucap = config.update_tri_cap

    a, b, c, valid, tri_n, tri_albedo, tri_emissive = _prep_tris(
        world_verts, tri_vertices, num_faces, tri_albedo, tri_emissive)
    tri_lo, tri_hi = geometry.tri_aabb(a, b, c)
    table = _tri_table(a, b, c, valid)
    vs = cascades.voxel_size
    origins = cascade_origin(cascades.center, vs, r)

    dirty = dirty_tri_mask & valid
    needs_full = jnp.int32(0)

    # compact the dirty triangle set
    dpos = jnp.nonzero(dirty, size=Ucap, fill_value=-1)[0]
    needs_full += jnp.maximum(jnp.sum(dirty) - Ucap, 0)
    dsafe = jnp.maximum(dpos, 0)
    dvalid = dpos >= 0
    dlo, dhi = tri_lo[dsafe], tri_hi[dsafe]

    # dirty cells: overlap of (expanded) dirty boxes per cascade
    cw = vs * (r // 16)
    dirty_cells = []
    for n in range(n_cas):
        e = config.truncation_voxels * vs[n] + vs[n]
        ax = origins[n][None, :] \
            + jnp.arange(16, dtype=jnp.float32)[:, None] * cw[n]
        # per-axis interval overlap, (16, D) each
        def ov(k):
            return ((ax[:, k][:, None] <= dirty_hi[None, :, k] + e)
                    & ((ax[:, k] + cw[n])[:, None]
                       >= dirty_lo[None, :, k] - e))
        mx, my, mz = ov(0), ov(1), ov(2)
        m = (mz[:, None, None, :] & my[None, :, None, :]
             & mx[None, None, :, :]).any(-1)              # (16,16,16) z,y,x
        dirty_cells.append(m.reshape(4096))
    dirty_cells = jnp.stack(dirty_cells).reshape(-1)      # (N*4096,)
    cell_ids = jnp.nonzero(dirty_cells, size=Ccap, fill_value=-1)[0] \
        .astype(jnp.int32)
    needs_full += jnp.maximum(jnp.sum(dirty_cells) - Ccap, 0)
    cvalid = cell_ids >= 0

    # fresh bin of the dirty subset -> new pair lists + glob merge per
    # cascade.  A moved *global* (3+ cell span) triangle only affects cells
    # inside the dirty region — outside it the distance tests reject it
    # both before and after — so the glob list updates in place and the
    # dirty-cell bound still holds.
    add_tris, add_count, globs = [], [], []
    for n in range(n_cas):
        ct, cnt, gt, rebin_ov = _bin_one_cascade(
            dlo, dhi, dvalid, origins[n], vs[n], r, K, Kg,
            tri_ids=jnp.where(dvalid, dsafe, -1))
        # a ref dropped at re-bin capacity would vanish silently from the
        # merged lists — escalate like every other capacity breach
        needs_full += rebin_ov
        add_tris.append(ct)
        add_count.append(cnt)
        old_g = state.glob_tris[n]
        old_g = jnp.where((old_g >= 0) & ~dirty[jnp.maximum(old_g, 0)],
                          old_g, -1)
        gm = jnp.concatenate([old_g, gt])                 # (2*Kg,)
        gkey = jnp.where(gm >= 0, jnp.uint32(0), jnp.uint32(1))
        _, gsort = jax.lax.sort_key_val(gkey, gm, is_stable=True)
        needs_full += jnp.maximum(
            jnp.sum((gm >= 0).astype(jnp.int32)) - Kg, 0)
        globs.append(gsort[:Kg])
    add_tris = jnp.stack(add_tris).reshape(n_cas * 4096, K)
    add_count = jnp.stack(add_count).reshape(-1)
    glob_tris = jnp.stack(globs)
    state = state.replace(glob_tris=glob_tris,
                          glob_rows=_rows_from_lists(glob_tris, table))

    # merge per dirty cell: (old minus dirty) ++ new, compacted to K
    cid = jnp.maximum(cell_ids, 0)
    old = state.cell_tris.reshape(n_cas * 4096, K)[cid]   # (Ccap, K)
    keep = (old >= 0) & ~dirty[jnp.maximum(old, 0)]
    old = jnp.where(keep, old, -1)
    add = add_tris[cid]                                   # (Ccap, K)
    merged = jnp.concatenate([old, add], axis=1)          # (Ccap, 2K)
    mkey = jnp.where(merged >= 0, jnp.uint32(0), jnp.uint32(1))
    _, msort = jax.lax.sort_key_val(mkey, merged, is_stable=True)
    new_tris = msort[:, :K]
    new_count = jnp.sum((merged >= 0).astype(jnp.int32), axis=1)
    dropped = jnp.maximum(new_count - K, 0)
    n_dropped = jnp.sum(jnp.where(cvalid, dropped, 0))
    state = state.replace(list_overflow=state.list_overflow + n_dropped)
    # Merge truncation matches the BUILD's own contract since round 4's
    # stratified exact emission: a full build truncates a saturated cell
    # to K stratified refs and COUNTS it (list_overflow) — escalating
    # the update on the same condition (the pre-round-4 ADVICE r2 rule)
    # would full-rebuild every frame on any scene whose dense cells sit
    # at capacity, and the rebuild would truncate identically.  The drop
    # is counted above (renderer warns); only over-truncation beyond the
    # build's own K -- impossible here since merge keeps K -- would lose
    # more than a rebuild.  Real capacity breaches (dirty-set, cell,
    # brick, emit, re-bin pair caps) still escalate via needs_full.
    new_count = jnp.minimum(new_count, K)

    cascades, state, emit_overflow = _apply_dirty_cells(
        cascades, state, cell_ids, new_tris, new_count, a, b, c, valid,
        tri_n, tri_albedo, tri_emissive, table, origins, vs, config,
        brick_block, dirty_lo=dirty_lo, dirty_hi=dirty_hi,
        axis_name=axis_name)
    needs_full += emit_overflow
    return cascades, state, needs_full


def _demand_one_cascade(tri_lo, tri_hi, valid, origin, vs, r):
    """Counting half of ``_bin_one_cascade`` (no sort, no list build):
    exact per-cell reference demand (4096,) via scatter-add over the
    same segmented pair emission, plus the large-triangle count.  Drives
    demand-scaled list caps so production builds run with ZERO dropped
    refs (VERDICT r4 #3; the Brixelizer analog budgets maxReferences
    explicitly per frame, Source/RenderPass.cpp:927-930)."""
    f = tri_lo.shape[0]
    clo, chi = _cell_span(tri_lo, tri_hi, origin, vs, r, 1.0)
    inside = valid & jnp.all(chi >= 0, -1) & jnp.all(clo < 16, -1)
    clo_c = jnp.clip(clo, 0, 15)
    chi_c = jnp.clip(chi, 0, 15)
    nspan = chi_c - clo_c + 1
    small = inside & jnp.all(chi - clo + 1 <= _BIN_SPAN_CAP, -1)
    large = inside & ~small

    s_cells = max(r // 16, 1)
    mult = _BIN_PAIRS_MULT * max(1, (1 + 2 // s_cells) ** 2)
    ext = jnp.where(small, nspan[:, 0] * nspan[:, 1] * nspan[:, 2], 0)
    starts_x = jnp.cumsum(ext) - ext
    total = starts_x[-1] + ext[-1]
    pairs_cap = -(-max(mult * f, 32768) // 1024) * 1024

    cum_ext = jnp.cumsum(ext)
    j = jnp.arange(pairs_cap, dtype=jnp.int32)
    tri_of = jnp.minimum(
        jnp.searchsorted(cum_ext, j, side="right"), f - 1).astype(jnp.int32)
    k_start = (cum_ext[tri_of] - ext[tri_of]).astype(jnp.int32)
    nx = jnp.maximum(nspan[tri_of, 0], 1).astype(jnp.float32)
    ny = jnp.maximum(nspan[tri_of, 1], 1).astype(jnp.float32)
    k_local = (j - k_start).astype(jnp.float32)
    dx = jnp.floor((k_local + 0.5) % nx).astype(jnp.int32)
    t = jnp.floor((k_local + 0.5) / nx).astype(jnp.int32)
    dy = jnp.floor((t.astype(jnp.float32) + 0.5) % ny).astype(jnp.int32)
    dz = jnp.floor((t.astype(jnp.float32) + 0.5) / ny).astype(jnp.int32)
    base_c = clo_c[tri_of]
    cell = (base_c[:, 2] + dz) * 256 + (base_c[:, 1] + dy) * 16 \
        + (base_c[:, 0] + dx)
    dead = (j >= total) | (j >= pairs_cap - 1)
    counts = jnp.zeros((4096,), jnp.int32).at[
        jnp.where(dead, 4096, cell)].add(1, mode="drop")
    # pair-stream truncation would undercount demand; surface it so the
    # caller escalates conservatively instead
    trunc = jnp.maximum(total - (pairs_cap - 1), 0)
    return counts, jnp.sum(large.astype(jnp.int32)), trunc


@functools.partial(jax.jit, static_argnames=("config",))
def list_demand(world_verts, tri_vertices, num_faces, centers, *,
                config: SDFConfig):
    """(max per-cell ref demand, max per-cascade large count, truncated
    pairs) over all cascades — the exact capacities a zero-drop build
    needs (compare against cell_list_cap / global_list_cap)."""
    a, b, c, valid, _, _, _ = _prep_tris(world_verts, tri_vertices,
                                         num_faces, None, None)
    tri_lo, tri_hi = geometry.tri_aabb(a, b, c)
    n_cas = config.num_cascades
    r = config.cascade_resolution
    vs = jnp.asarray([config.voxel_size(i) for i in range(n_cas)],
                     jnp.float32)
    origins = cascade_origin(centers, vs, r)
    max_cell = jnp.int32(0)
    max_glob = jnp.int32(0)
    trunc = jnp.int32(0)
    for n in range(n_cas):
        counts, n_large, tr = _demand_one_cascade(
            tri_lo, tri_hi, valid, origins[n], vs[n], r)
        max_cell = jnp.maximum(max_cell, jnp.max(counts))
        max_glob = jnp.maximum(max_glob, n_large)
        trunc = trunc + tr
    return max_cell, max_glob, trunc


# auto-cap ceilings: cell_rows HBM is n_cas * 4096 * K * ROW * 4 B
# (512 at 6 cascades = 554 MB), so escalation beyond the ceiling stays a
# COUNTED drop rather than an OOM
_AUTO_CELL_CAP_MAX = 512
_AUTO_GLOB_CAP_MAX = 8192


def demand_caps(scene, world_verts, centers, config: SDFConfig
                ) -> SDFConfig:
    """Host helper: measure list demand and return a config whose caps
    cover it (next power of two, bounded by the auto-cap ceilings).
    Call once per scene load before ``build_for_scene``; the escalated
    config must then be used for every subsequent build/update/scroll
    (BuildState list shapes derive from the caps)."""
    import dataclasses

    mc, mg, tr = list_demand(world_verts, scene.tri_vertices,
                             scene.num_faces, centers, config=config)
    mc, mg, tr = int(mc), int(mg), int(tr)
    if tr > 0:      # demand pass itself truncated: escalate to ceiling
        mc = _AUTO_CELL_CAP_MAX
    # 64-granular rounding, not pow2: build cost scales ~linearly with K
    # (the kitchen stage at pow2-rounded 512 built in 4.2 s vs 1.5 s at
    # 128+drops; demand ~300 wants ~320, not 512)
    def g64(x, g=64):
        return -(-x // g) * g
    k = min(max(config.cell_list_cap, g64(mc)), _AUTO_CELL_CAP_MAX)
    kg = min(max(config.global_list_cap, g64(mg, 128)),
             _AUTO_GLOB_CAP_MAX)
    if (k, kg) == (config.cell_list_cap, config.global_list_cap):
        return config
    return dataclasses.replace(config, cell_list_cap=k,
                               global_list_cap=kg)


def _scene_colors(scene):
    mat = scene.instance_material[scene.tri_instance]
    return scene.mat_base_color[mat], scene.mat_emissive[mat]


def build_for_scene(scene, world_verts, centers, config: SDFConfig, **kw):
    alb, emi = _scene_colors(scene)
    return build_cascades_binned(world_verts, scene.tri_vertices,
                                 scene.num_faces, centers, tri_albedo=alb,
                                 tri_emissive=emi, config=config, **kw)


def update_for_scene(cascades, state, scene, world_verts, dirty_tri_mask,
                     dirty_lo, dirty_hi, config: SDFConfig, **kw):
    alb, emi = _scene_colors(scene)
    return update_cascades(cascades, state, world_verts, scene.tri_vertices,
                           scene.num_faces, dirty_tri_mask, dirty_lo,
                           dirty_hi, tri_albedo=alb, tri_emissive=emi,
                           config=config, **kw)


def scroll_for_scene(cascades, state, scene, world_verts, new_centers,
                     scrolled, config: SDFConfig, **kw):
    alb, emi = _scene_colors(scene)
    return scroll_cascades(cascades, state, new_centers, world_verts,
                           scene.tri_vertices, scene.num_faces,
                           tri_albedo=alb, tri_emissive=emi, config=config,
                           scrolled=scrolled, **kw)


def _roll3(grid, d, fill):
    """Shift a (..., R, R, R) volume so new[z,y,x] = old[z+dz, y+dy, x+dx],
    filling out-of-range entries (d traced, (3,) int32 xyz order)."""
    r = grid.shape[-1]
    ax = jnp.arange(r, dtype=jnp.int32)
    iz, iy, ix = ax + d[2], ax + d[1], ax + d[0]
    ok = ((iz >= 0) & (iz < r))[:, None, None] \
        & ((iy >= 0) & (iy < r))[None, :, None] \
        & ((ix >= 0) & (ix < r))[None, None, :]
    g = grid[..., jnp.clip(iz, 0, r - 1), :, :]
    g = g[..., :, jnp.clip(iy, 0, r - 1), :]
    g = g[..., :, :, jnp.clip(ix, 0, r - 1)]
    return jnp.where(ok, g, fill), ~ok


@functools.partial(jax.jit, static_argnames=("config", "scrolled",
                                              "brick_block"))
def scroll_cascades(cascades: SDFCascades, state: BuildState,
                    new_centers, world_verts, tri_vertices, num_faces, *,
                    tri_albedo=None, tri_emissive=None, config: SDFConfig,
                    scrolled: tuple, brick_block: int = 256):
    """Clipmap scroll: recenter cascades reusing every surviving brick.

    ``new_centers`` must be snapped to whole *cells* (s voxels) per
    cascade; ``scrolled`` is a static per-cascade bool tuple (only those
    cascades are touched).  Surviving bricks keep their atlas content —
    world voxel positions are absolute, only the map window moves — and
    only the entering slab re-bins/re-emits, mirroring Brixelizer's
    cascade scroll invalidation
    (gpu/brixelizer/ffx_brixelizer_cascade_ops.h:569-595).
    Returns (cascades, state, needs_full).
    """
    n_cas = config.num_cascades
    r = config.cascade_resolution
    s = r // 16
    r3 = r ** 3
    K = config.cell_list_cap
    Kg = config.global_list_cap
    Ccap = config.update_cell_cap
    max_bricks = config.max_bricks

    a, b, c, valid, tri_n, tri_albedo, tri_emissive = _prep_tris(
        world_verts, tri_vertices, num_faces, tri_albedo, tri_emissive)
    tri_lo, tri_hi = geometry.tri_aabb(a, b, c)
    table = _tri_table(a, b, c, valid)
    vs = cascades.voxel_size
    new_origins = cascade_origin(new_centers, vs, r)
    old_origins = cascade_origin(cascades.center, vs, r)
    # whole-voxel shifts (xyz); snapping guarantees multiples of s
    dvox = jnp.round((new_origins - old_origins) / vs[:, None]) \
        .astype(jnp.int32)                                # (N, 3)

    brick_map = cascades.brick_map
    alive = state.alive
    brick_voxel = cascades.brick_voxel
    cell_tris = state.cell_tris
    cell_count = state.cell_count
    cell_rows = state.cell_rows.reshape(n_cas, 4096, K, ROW)
    entering = jnp.zeros((n_cas, 4096), bool)
    needs_full = jnp.int32(0)

    for n in range(n_cas):
        if not scrolled[n]:
            continue
        d = dvox[n]
        # free bricks whose voxels scroll out; shift survivors' voxel ids
        bn = brick_voxel // r3 == n
        rem = brick_voxel % r3
        bz, by, bx = rem // (r * r), (rem // r) % r, rem % r
        nz, ny, nx = bz - d[2], by - d[1], bx - d[0]
        in_r = ((nz >= 0) & (nz < r) & (ny >= 0) & (ny < r)
                & (nx >= 0) & (nx < r))
        keep = bn & alive & in_r
        gone = bn & alive & ~in_r
        alive = alive & ~gone
        new_bv = n * r3 + (jnp.clip(nz, 0, r - 1) * r
                           + jnp.clip(ny, 0, r - 1)) * r \
            + jnp.clip(nx, 0, r - 1)
        brick_voxel = jnp.where(keep, new_bv, brick_voxel)
        rolled, _ = _roll3(brick_map[n], d, -1)
        brick_map = brick_map.at[n].set(rolled)
        # roll the cell tables (cell grid shifts by d/s)
        dc = d // s
        ct3, ent = _roll3(cell_tris[n].reshape(16, 16, 16, K)
                          .transpose(3, 0, 1, 2), dc, -1)
        cell_tris = cell_tris.at[n].set(
            ct3.transpose(1, 2, 3, 0).reshape(4096, K))
        cc3, _ = _roll3(cell_count[n].reshape(16, 16, 16), dc, 0)
        cell_count = cell_count.at[n].set(cc3.reshape(4096))
        cr3, _ = _roll3(cell_rows[n].reshape(16, 16, 16, K * ROW)
                        .transpose(3, 0, 1, 2), dc, 0.0)
        cell_rows = cell_rows.at[n].set(
            cr3.transpose(1, 2, 3, 0).reshape(4096, K, ROW))
        entering = entering.at[n].set(ent.reshape(4096))

    state = state.replace(cell_tris=cell_tris, cell_count=cell_count,
                          cell_rows=cell_rows.reshape(n_cas * 4096, K, ROW),
                          alive=alive)
    cascades = cascades.replace(center=new_centers, brick_map=brick_map,
                                brick_voxel=brick_voxel)

    # fresh bin (new origin) for scrolled cascades -> lists for entering
    # cells; glob lists re-derived (cell spans shift, membership may not —
    # but a fresh bin is exact and the sort is the only real cost)
    glob_tris = state.glob_tris
    fresh_tris = state.cell_tris.reshape(n_cas * 4096, K)
    fresh_count = state.cell_count.reshape(-1)
    fresh_t, fresh_c = [], []
    for n in range(n_cas):
        if not scrolled[n]:
            fresh_t.append(None)
            fresh_c.append(None)
            continue
        ct, cnt, gt, ov = _bin_one_cascade(
            tri_lo, tri_hi, valid, new_origins[n], vs[n], r, K, Kg)
        fresh_t.append(ct)
        fresh_c.append(cnt)
        glob_tris = glob_tris.at[n].set(gt)
        state = state.replace(list_overflow=state.list_overflow + ov)
        needs_full += ov    # dropped refs on a scrolled bin (ADVICE r2)
    state = state.replace(glob_tris=glob_tris,
                          glob_rows=_rows_from_lists(glob_tris, table))

    ent_flat = entering.reshape(-1)
    cell_ids = jnp.nonzero(ent_flat, size=Ccap, fill_value=-1)[0] \
        .astype(jnp.int32)
    needs_full += jnp.maximum(jnp.sum(ent_flat) - Ccap, 0)
    cid = jnp.maximum(cell_ids, 0)
    new_tris = jnp.full((Ccap, K), -1, jnp.int32)
    new_count = jnp.zeros((Ccap,), jnp.int32)
    for n in range(n_cas):
        if not scrolled[n]:
            continue
        in_n = (cid // 4096) == n
        new_tris = jnp.where(in_n[:, None], fresh_t[n][cid % 4096],
                             new_tris)
        new_count = jnp.where(in_n, fresh_c[n][cid % 4096], new_count)

    cascades, state, emit_overflow = _apply_dirty_cells(
        cascades, state, cell_ids, new_tris, new_count, a, b, c, valid,
        tri_n, tri_albedo, tri_emissive, table, new_origins, vs, config,
        brick_block)
    return cascades, state, needs_full + emit_overflow
