"""Pallas tiled visibility rasterizer.

TPU re-design of the reference's visibility pass (Source/RenderPass.cpp:
572-678 + Shaders/Source/Visibility.hlsl): instead of a hardware raster
writing ``MeshID<<16|PrimID`` per pixel, a Pallas kernel owns a
(tile_h x tile_w) pixel tile per grid step and scans all triangles in
VMEM-resident chunks, evaluating edge functions for the whole (pixel x
triangle) block on the VPU.  Outputs are a full-rate visibility buffer:
triangle id (32-bit — the reference's 16+16 packing limit is deliberately
not copied, Visibility.hlsl:21), NDC depth, and perspective-correct
barycentrics (computed as in Shaders/Source/Barycentric.hlsl:17-56, from
screen-space edge weights and 1/w).

Two variants share the math:

* :func:`rasterize` — triangle chunks in screen-Morton order with per-tile
  chunk *ranges* (traced fori bounds) + an overlap bitmask cull; scales to
  arbitrary triangle counts.
* :func:`rasterize_binned` (default) — exact per-tile lists of 8-triangle
  groups gathered by XLA (the TPU-native indirect-draw batching); the Pallas
  kernel evaluates corner-difference edge functions on (1024 px, 128 tri)
  VPU blocks and emits only (depth, winner); all attribute reconstruction
  (perspective-correct uv, near-clip source-bary mapping) happens in one XLA
  gather pass over the framebuffer.

Triangle setup (clip transform, near-plane clipping with a static 2x
expansion, pixel-space projection, validity) runs as plain XLA ops — one
(V,4)x(4,4) matmul on the MXU — before the kernel.  Layout constraints that
shaped the design: dynamic indexing only on untiled leading dims; SMEM
scalars packed into 128-wide int32 rows (narrow SMEM rows pad to 512B);
edge functions evaluated in corner-difference form (coefficient forms
cancel catastrophically in f32 at 1080p pixel magnitudes).

Conventions: pixel (0,0) top-left, sample at pixel centers (+0.5); two-sided
rasterization (edge weights all >= 0 or all <= 0); depth test on z_ndc in
[0,1], smaller = nearer; invalid/padded triangles are encoded with z = 10 so
the depth-range test culls them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vri_tpu.ops.intersect import HitRecord

_BIG = 3.0e38

# rasterize_sorted resolve-mode crossover: at or below this many padded
# triangle slots the FUSED in-kernel resolve wins (the per-pixel XLA row
# gather it deletes dominates the walk); above it the gather resolve
# wins (the 2x-wide template taxes every step of a long walk).  The K=6
# fused cascade (round 4) halved the template tax and moved the
# crossover: at 52k slots fused now measures 14.82 vs gather 16.07 ms,
# at 118k slots gather still wins 23.3 vs 24.0 (BASELINE.md round 4;
# round-3's 16k threshold predates K=6).
_FUSED_MAX_SLOTS = 65536


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot_2pass(pixmat: jnp.ndarray, coef: jnp.ndarray) -> jnp.ndarray:
    """f32-accurate coefficient evaluation in THREE bf16 MXU passes.

    Mosaic's default f32 matmul truncates both operands to ONE bf16 pass
    (~8 mantissa bits): measured 5.5e-2 absolute error at tile-local
    pixel magnitudes — a half-pixel edge wobble that opens cracks along
    shared triangle edges and z-fights coplanar quads.  Its HIGHEST mode
    is accurate but costs ~2.7 us extra per 128-slot step (6-pass double
    split).  Here the LHS needs no split at all: pixel-center columns
    are k+0.5 with k < 128 (8 significand bits — exactly representable
    in bf16; the 0/1 constant columns trivially so), so splitting ONLY
    the coefficient operand into a 3-term bf16 cascade (hi + mid + lo)
    recovers ~2^-26 relative accuracy — f32-indistinguishable for the
    edge/depth tests (a 2-term split's 2^-17 still flipped edge pixels
    on sliver triangles) — at three MXU passes (~+1 us/step vs the
    default, measured in tools/micro_worklist.py)."""
    # KERNEL-SIDE split: runs inside Pallas, where Mosaic lowers the
    # f32->bf16->f32 converts faithfully (and reduce_precision has no
    # lowering).  The XLA-side split (_bf16_cascade_terms) MUST NOT use
    # this pattern — XLA's simplifier folds the convert pair to identity
    # and zeroes the residuals (see _bf16_cascade_terms).
    hi = coef.astype(jnp.bfloat16)
    r1 = coef - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    pixb = pixmat.astype(jnp.bfloat16)
    return (jnp.dot(pixb, hi, preferred_element_type=jnp.float32)
            + jnp.dot(pixb, mid, preferred_element_type=jnp.float32)
            + jnp.dot(pixb, lo, preferred_element_type=jnp.float32))


def _bf16_cascade_terms(x):
    """hi/mid/lo bf16-representable f32 cascade terms of ``x``.

    MUST round through ``lax.reduce_precision``, not an f32->bf16->f32
    convert round-trip: inside jit XLA's simplifier folds the convert
    pair to identity, which silently turns the residuals (x - hi) into
    ZERO — the kernels then run at plain bf16 edge precision (~2^-8),
    re-opening the half-pixel edge cracks the cascade exists to close
    (found round 5: sorted-tier pixels missing vs the exact oracle on
    thin edge margins; eager vs jit split outputs differed).
    ``reduce_precision(8, 7)`` is bf16's exponent/mantissa layout with
    round-to-nearest-even — bit-identical to the convert on every finite
    value — and is opaque to the simplifier."""
    hi_f = jax.lax.reduce_precision(x, 8, 7)
    r1 = x - hi_f
    mid_f = jax.lax.reduce_precision(r1, 8, 7)
    lo_f = jax.lax.reduce_precision(r1 - mid_f, 8, 7)
    return hi_f, mid_f, lo_f


def _bf16_split_rows(chunks: jnp.ndarray) -> jnp.ndarray:
    """Pre-split bf16 cascade operand for the K=6 fused matmul.

    ``chunks`` is a (C, 8, N) f32 kernel template whose rows 0-1 are the
    (a, b) coefficient rows.  Returns a (C, 8, N) bf16 operand with rows
    [hi_a hi_b mid_a mid_b lo_a lo_b 0 0]: the same 3-term hi/mid/lo
    coefficient split `_dot_2pass` performs, hoisted out of the kernel so
    the MXU can sum all three cascade terms in its f32 accumulator in ONE
    (P, 6) x (6, N) pass — removing two matmul passes, two (P, N) adds
    and the per-step in-kernel split (tools/micro_attrib.py).  Identical
    terms, single f32 accumulation."""
    ab = chunks[:, 0:2]
    hi_f, mid_f, lo_f = _bf16_cascade_terms(ab)
    hi = hi_f.astype(jnp.bfloat16)
    mid = mid_f.astype(jnp.bfloat16)
    lo = lo_f.astype(jnp.bfloat16)
    zero = jnp.zeros_like(hi)
    return jnp.concatenate([hi, mid, lo, zero], axis=1)


def _pm6(p: int, tile_w: int):
    """(P, 6) bf16 LHS for the fused cascade: [px py px py px py] columns
    (pixel centers are exactly representable in bf16 at tile scale)."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    py = 0.5 + (pix // tile_w).astype(jnp.float32)
    px = 0.5 + (pix % tile_w).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, 6), 1)
    return jnp.where(cols % 2 == 1, py, px).astype(jnp.bfloat16)


def triangle_setup_clipped(world_verts: jnp.ndarray,
                           tri_vertices: jnp.ndarray,
                           num_faces: jnp.ndarray, view_proj: jnp.ndarray,
                           height: int, width: int, w_eps: float = 1e-4,
                           y_offset=None, extra_cap: int | None = None,
                           face_mask=None, cull_sign=None, src_map=None):
    """``y_offset`` (traced ok) shifts pixel-space y after projection:
    band rendering for the row-sharded multi-chip path projects with the
    *full* framebuffer height, then rasterizes rows [y0, y0+band)."""
    """Near-plane-clipped triangle setup.

    The hardware raster the reference relies on clips against the near plane
    for free; this is the TPU-native equivalent (vectorized Sutherland-
    Hodgman against w = eps, static 2x expansion: each source triangle emits
    up to two clipped triangles).  Each output corner carries the
    *source-triangle barycentrics* (l1, l2) so attribute reconstruction maps
    hits back to the authored triangle exactly.

    Returns (x, y, z, inv_w, bary1, bary2, src_id, valid) where x.. are
    (2F, 3), bary1/bary2 are (2F, 3) per-corner source barycentrics, src_id
    is (2F,) and valid is (2F,) bool.
    """
    f = tri_vertices.shape[0]
    v = world_verts
    clip = jnp.concatenate([v, jnp.ones_like(v[:, :1])], axis=1) @ view_proj.T
    c = clip[tri_vertices]                     # (F, 3, 4) clip-space corners

    w = c[..., 3]
    inside = w > w_eps
    n_in = inside.sum(axis=1)                  # (F,)

    # rotate corners so the canonical patterns hold:
    #   n_in==1 -> the inside corner first; n_in==2 -> the outside corner last
    idx_in = jnp.argmax(inside, axis=1)                  # first inside
    idx_out = jnp.argmax(~inside, axis=1)                # first outside
    rot = jnp.where(n_in == 1, idx_in,
                    jnp.where(n_in == 2, (idx_out + 1) % 3, 0))
    # roll-select rotation: rot has only 3 values, so the rotation is a
    # 3-way select over rolled corner arrays (pure vector ops) — the
    # take_along_axis form lowered to a per-element gather chain measured
    # at 3.7 ms/frame vs 0.7 for this (tools/micro_setup.py, 49k tris)
    sel = rot[:, None, None]
    cr = jnp.where(sel == 1, jnp.roll(c, -1, axis=1),
                   jnp.where(sel == 2, jnp.roll(c, -2, axis=1), c))
    # source barycentrics of the rotated corners: the 3 rotations of the
    # canonical (l1, l2) = (0,0), (1,0), (0,1) corner table
    bt = jnp.asarray([[[0., 0.], [1., 0.], [0., 1.]],
                      [[1., 0.], [0., 1.], [0., 0.]],
                      [[0., 1.], [0., 0.], [1., 0.]]], jnp.float32)
    br = jnp.broadcast_to(
        jnp.where(sel == 1, bt[1], jnp.where(sel == 2, bt[2], bt[0])),
        (f, 3, 2))
    wr = cr[..., 3]

    def lerp_to_plane(pa, pb, wa, wb):
        t = (w_eps - wa) / jnp.where(jnp.abs(wb - wa) > 1e-20, wb - wa, 1.0)
        t = jnp.clip(t, 0.0, 1.0)[..., None]
        return pa + (pb - pa) * t

    A, B, C = cr[:, 0], cr[:, 1], cr[:, 2]
    bA, bB, bC = br[:, 0], br[:, 1], br[:, 2]
    wA, wB, wC = wr[:, 0], wr[:, 1], wr[:, 2]
    # intersection points on each edge (lerp position and source bary
    # together; clip-space lerp is exact for both)
    posb_A = jnp.concatenate([A, bA], -1)
    posb_B = jnp.concatenate([B, bB], -1)
    posb_C = jnp.concatenate([C, bC], -1)
    P_ab = lerp_to_plane(posb_A, posb_B, wA, wB)
    P_ac = lerp_to_plane(posb_A, posb_C, wA, wC)
    P_bc = lerp_to_plane(posb_B, posb_C, wB, wC)

    full = jnp.stack([posb_A, posb_B, posb_C], axis=1)           # n_in == 3
    one_in = jnp.stack([posb_A, P_ab, P_ac], axis=1)             # n_in == 1
    two_in_1 = jnp.stack([posb_A, posb_B, P_bc], axis=1)         # n_in == 2
    two_in_2 = jnp.stack([posb_A, P_bc, P_ac], axis=1)

    sel = n_in[:, None, None]
    out1 = jnp.where(sel == 3, full,
                     jnp.where(sel == 2, two_in_1,
                               jnp.where(sel == 1, one_in, full)))
    out2 = two_in_2
    valid1 = (n_in >= 1)
    valid2 = (n_in == 2)

    in_range = jnp.arange(f) < num_faces
    if face_mask is not None:
        # LOD: only the selected level's faces rasterize (ops/lod.py)
        in_range &= face_mask
    if cull_sign is not None:
        # Backface culling per USD doubleSided semantics (cull_sign: (F,)
        # f32, 0 = two-sided, ±1 = keep faces whose clip-space orientation
        # matches).  The homogeneous det [x y w] is the orientation as SEEN
        # (valid on both sides of the near plane, unlike post-divide screen
        # area); clipping preserves winding, so culling at the SOURCE level
        # removes both clipped children before emission.  The reference
        # sets VK_CULL_MODE_NONE (Common.cpp:333) and ignores doubleSided;
        # we follow the USD spec instead (meshes default single-sided).
        cw = c[..., 3]
        cx, cy = c[..., 0], c[..., 1]
        dhom = (cx[:, 0] * (cy[:, 1] * cw[:, 2] - cy[:, 2] * cw[:, 1])
                - cy[:, 0] * (cx[:, 1] * cw[:, 2] - cx[:, 2] * cw[:, 1])
                + cw[:, 0] * (cx[:, 1] * cy[:, 2] - cx[:, 2] * cy[:, 1]))
        in_range &= (cull_sign == 0.0) | (dhom * cull_sign > 0.0)
    clip_overflow = jnp.int32(0)
    # ``src_map`` (frustum-compacted rasterization, passes/frame.py): the
    # F slots here are a COMPACTED subset of the scene's face pool and
    # src_map[i] is slot i's original face id — hits must report original
    # ids so the G-buffer resolve indexes the uncompacted attribute pools
    ids = jnp.arange(f, dtype=jnp.int32) if src_map is None else src_map
    if extra_cap is None:
        # static 2x expansion: every source triangle owns a second slot
        tri6 = jnp.concatenate([out1, out2], axis=0)      # (2F, 3, 6)
        valid = jnp.concatenate([valid1 & in_range, valid2 & in_range])
        src_id = jnp.concatenate([ids] * 2)
    else:
        # compact the second clipped triangles (near-plane crossers are
        # rare) into a small capacity — halves every downstream array;
        # overflow is counted, never silent
        live2 = valid2 & in_range
        idx2 = jnp.nonzero(live2, size=extra_cap,
                           fill_value=f)[0].astype(jnp.int32)
        ok2 = idx2 < f
        safe2 = jnp.minimum(idx2, f - 1)
        tri6 = jnp.concatenate([out1, out2[safe2]], axis=0)  # (F+E, 3, 6)
        valid = jnp.concatenate([valid1 & in_range, ok2])
        src_id = jnp.concatenate([ids, ids[safe2]])
        clip_overflow = jnp.maximum(
            jnp.sum(live2.astype(jnp.int32)) - extra_cap, 0)

    cpos = tri6[..., :4]
    bary = tri6[..., 4:6]                                  # (2F, 3, 2)
    wv = jnp.maximum(cpos[..., 3], w_eps)
    inv_w = 1.0 / wv
    ndc = cpos[..., :3] * inv_w[..., None]
    tx = (ndc[..., 0] * 0.5 + 0.5) * width
    ty = (0.5 - ndc[..., 1] * 0.5) * height
    if y_offset is not None:
        ty = ty - y_offset
    tz = ndc[..., 2]
    area = ((tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0])
            - (ty[:, 1] - ty[:, 0]) * (tx[:, 2] - tx[:, 0]))
    valid &= jnp.abs(area) > 1e-12
    return (tx, ty, tz, inv_w, bary[..., 0], bary[..., 1], src_id, valid,
            clip_overflow)


def _binsearch_first_geq(sorted_arr: jnp.ndarray, queries: jnp.ndarray
                         ) -> jnp.ndarray:
    """First index with sorted_arr[i] >= query, per query (the
    searchsorted 'left' contract).  Hand-unrolled binary search:
    ceil(log2(n)) rounds of one tiny gather + compare — XLA's own
    searchsorted lowering measured 5.6 ms for 2k queries over 790k keys
    on v5e; this form is ~0.1 ms."""
    n = sorted_arr.shape[0]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    # the search interval is [0, n] (n+1 candidate answers): n.bit_length()
    # halvings guarantee lo == hi; bit_length(n-1) is one short when n is
    # a power of two (a latent off-by-one the foreign-head chunk slack
    # used to mask)
    for _ in range(n.bit_length()):
        mid = (lo + hi) >> 1
        v = sorted_arr[jnp.minimum(mid, n - 1)]
        go_hi = v < queries
        lo = jnp.where(go_hi, mid + 1, lo)
        hi = jnp.where(go_hi, hi, mid)
    return lo


def _screen_morton_order(tx, ty, valid, height: int, width: int,
                         large_span: float = 160.0,
                         partition_large: bool = True) -> jnp.ndarray:
    """Spatial-locality permutation for the chunk cull.

    Triangles are sorted by the Morton code of their screen-AABB center so
    each packed chunk covers a small screen region and the kernel's
    chunk-vs-tile bound test rejects almost everything.  Triangles spanning
    more than ``large_span`` pixels (and invalid ones) sort to the front as
    "global" chunks every tile walks — the indirect-draw batching analog of
    the reference's per-draw loop (RenderPass.cpp:642-664), re-designed as a
    data layout instead of a command stream.
    """
    lox = tx.min(axis=1)
    hix = tx.max(axis=1)
    loy = ty.min(axis=1)
    hiy = ty.max(axis=1)
    cx = jnp.clip((lox + hix) * 0.5, 0, width - 1) * (1024.0 / width)
    cy = jnp.clip((loy + hiy) * 0.5, 0, height - 1) * (1024.0 / height)

    def spread(v):
        v = v.astype(jnp.uint32)
        v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
        v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x33333333)
        v = (v | (v << 1)) & jnp.uint32(0x55555555)
        return v

    code = (spread(cx.astype(jnp.uint32)) << 1) | spread(cy.astype(jnp.uint32))
    if partition_large:
        # ranged kernel: screen-spanning triangles go to a front block every
        # tile walks, so local chunk ranges stay compact
        large = ((hix - lox) > large_span) | ((hiy - loy) > large_span)
        key = jnp.where(large, jnp.uint32(0), code + 1)
        n_large = jnp.sum(large & valid).astype(jnp.int32)
    else:
        # binned kernel: per-group bboxes already reflect triangle size;
        # partitioning would pack unrelated screen-spanning triangles into
        # shared mega-bbox groups that overlap every tile
        key = code
        n_large = jnp.int32(0)
    key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(key).astype(jnp.int32), n_large


def _pack_chunks(tx, ty, tz, tw, b1, b2, valid, tri_chunk: int):
    """Pack setup into (C, 24, TC) f32 + (C, 4) bbox.

    Row layout: 0-2 x, 3-5 y, 6-8 z, 9-11 1/w, 12-14 source-bary l1,
    15-17 source-bary l2 per corner (near-clipped triangles reference their
    source triangle's barycentric frame), rows 18-23 padding.
    """
    f = tx.shape[0]
    fp = _round_up(f, tri_chunk)
    pad = fp - f
    if pad:
        padf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        tx, ty, tz, tw, b1, b2, valid = map(
            padf, (tx, ty, tz, tw, b1, b2, valid))
    # cull invalid triangles via the z-range test
    tz = jnp.where(valid[:, None], tz, 10.0)
    c = fp // tri_chunk

    def rows(a):      # (Fp, 3) -> (C, 3, TC)
        return a.reshape(c, tri_chunk, 3).transpose(0, 2, 1)

    zero = jnp.zeros((c, 6, tri_chunk), jnp.float32)
    data = jnp.concatenate(
        [rows(tx), rows(ty), rows(tz), rows(tw), rows(b1), rows(b2), zero],
        axis=1)                                           # (C, 24, TC)

    vx = jnp.where(valid[:, None], tx, _BIG).reshape(c, tri_chunk, 3)
    vy = jnp.where(valid[:, None], ty, _BIG).reshape(c, tri_chunk, 3)
    wx = jnp.where(valid[:, None], tx, -_BIG).reshape(c, tri_chunk, 3)
    wy = jnp.where(valid[:, None], ty, -_BIG).reshape(c, tri_chunk, 3)
    bbox = jnp.stack([vx.min((1, 2)), wx.max((1, 2)),
                      vy.min((1, 2)), wy.max((1, 2))], axis=1)   # (C, 4)
    return data, bbox, c


def _raster_kernel(meta_ref, tri_ref,
                   z_out, tri_out, u_out, v_out, *,
                   tile_h: int, tile_w: int, tri_chunk: int,
                   num_chunks: int, num_tx: int, n_words: int,
                   num_tiles: int):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_id = ti * num_tx + tj

    # meta layout (one SMEM int32 table, 128 values per 512-byte row):
    # [0] = n_global; [1 + 2*tile] = range start; [2 + 2*tile] = range end;
    # [1 + 2*num_tiles + tile*n_words + w] = overlap bitmask words
    def meta(idx):
        return meta_ref[idx // 128, idx % 128]
    p = tile_h * tile_w
    y0 = (ti * tile_h).astype(jnp.float32)
    x0 = (tj * tile_w).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    py = y0 + 0.5 + (pix // tile_w).astype(jnp.float32)      # (P, 1)
    px = x0 + 0.5 + (pix % tile_w).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, tri_chunk), 1)

    def chunk_body(c, carry):
        def compute(carry):
            best_z, best_tri, best_l1, best_l2, best_w, best_b = carry
            d = tri_ref[c]                                    # (16, TC)
            ax, bx, cx = d[0][None, :], d[1][None, :], d[2][None, :]
            ay, by, cy = d[3][None, :], d[4][None, :], d[5][None, :]
            az, bz, cz = d[6][None, :], d[7][None, :], d[8][None, :]
            # edge functions (signed areas) at pixel centers
            e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
            e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
            e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                     ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
            inv_area = 1.0 / area                             # (1, TC)
            l1 = e1 * inv_area
            l2 = e2 * inv_area
            z = (az + l1 * (bz - az) + l2 * (cz - az))
            ok = inside & (z >= 0.0) & (z <= 1.0)
            zm = jnp.where(ok, z, 3.0e38)
            # nearest triangle in chunk, lowest index wins ties
            z_best = jnp.min(zm, axis=-1, keepdims=True)      # (P, 1)
            is_best = (zm == z_best) & ok
            k = jnp.min(jnp.where(is_best, lane, jnp.int32(2**30)), axis=-1,
                        keepdims=True)
            sel = lane == k                                    # one-hot (P, TC)
            # select the winner's attributes; the perspective divide happens
            # once per pixel at the end of the frame, not per (pixel, tri)
            pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=-1,
                                     keepdims=True)
            l1s, l2s = pick(l1), pick(l2)
            pack_w = jnp.concatenate(
                [pick(d[9][None, :]), pick(d[10][None, :]),
                 pick(d[11][None, :])], axis=-1)              # (P, 3) 1/w
            pack_b = jnp.concatenate(
                [pick(d[12][None, :]), pick(d[13][None, :]),
                 pick(d[14][None, :]), pick(d[15][None, :]),
                 pick(d[16][None, :]), pick(d[17][None, :])],
                axis=-1)                                      # (P, 6) src bary
            closer = z_best < best_z
            tri_id = c * tri_chunk + k
            return (jnp.where(closer, z_best, best_z),
                    jnp.where(closer, tri_id, best_tri),
                    jnp.where(closer, l1s, best_l1),
                    jnp.where(closer, l2s, best_l2),
                    jnp.where(closer, pack_w, best_w),
                    jnp.where(closer, pack_b, best_b))

        word = meta(1 + 2 * num_tiles + tile_id * n_words + c // 32)
        bit = (word >> (c % 32)) & 1
        return jax.lax.cond(bit != 0, compute, lambda cr: cr, carry)

    init = (jnp.full((p, 1), 3.0e38, jnp.float32),
            jnp.full((p, 1), -1, jnp.int32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 3), jnp.float32),
            jnp.zeros((p, 6), jnp.float32))
    # two data-dependent loops: the global chunks (screen-spanning
    # triangles, always walked) and this tile's local Morton chunk range —
    # an empty tile runs zero iterations
    carry = jax.lax.fori_loop(0, meta(0), chunk_body, init)
    c_lo = meta(1 + 2 * tile_id)
    c_hi = meta(2 + 2 * tile_id)
    best_z, best_tri, best_l1, best_l2, best_w, best_b = jax.lax.fori_loop(
        c_lo, c_hi, chunk_body, carry)
    # perspective-correct barycentrics from screen-space weights + 1/w
    # (Barycentric.hlsl approach), one divide per pixel; then map through
    # the clipped corners' source barycentrics to the authored triangle
    l1, l2 = best_l1[:, 0], best_l2[:, 0]
    l0 = 1.0 - l1 - l2
    p0 = l0 * best_w[:, 0]
    p1 = l1 * best_w[:, 1]
    p2 = l2 * best_w[:, 2]
    inv = 1.0 / jnp.maximum(p0 + p1 + p2, 1e-20)
    u_c = p1 * inv
    v_c = p2 * inv
    w_c = 1.0 - u_c - v_c
    src_u = w_c * best_b[:, 0] + u_c * best_b[:, 1] + v_c * best_b[:, 2]
    src_v = w_c * best_b[:, 3] + u_c * best_b[:, 4] + v_c * best_b[:, 5]
    z_out[:, :] = best_z.reshape(tile_h, tile_w)
    tri_out[:, :] = best_tri.reshape(tile_h, tile_w)
    u_out[:, :] = src_u.reshape(tile_h, tile_w)
    v_out[:, :] = src_v.reshape(tile_h, tile_w)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "tile_h", "tile_w", "tri_chunk", "interpret",
    "proj_height"))
def rasterize(world_verts: jnp.ndarray, tri_vertices: jnp.ndarray,
              num_faces: jnp.ndarray, view_proj: jnp.ndarray, *,
              height: int, width: int, tile_h: int = 8, tile_w: int = 128,
              tri_chunk: int = 128, interpret: bool | None = None,
              proj_height: int | None = None, y_offset=None,
              face_mask=None, cull_sign=None) -> Tuple[HitRecord, jnp.ndarray]:
    """Full-frame visibility raster.

    Returns (HitRecord flattened to (H*W,) with z stored in ``t`` as NDC
    depth, and the (H, W) depth image).  Callers wanting world-space ray t
    reconstruct it from the interpolated position.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)

    tx, ty, tz, tw, b1, b2, src_id, valid, _ = triangle_setup_clipped(
        world_verts, tri_vertices, num_faces, view_proj,
        proj_height or height, width, y_offset=y_offset,
        face_mask=face_mask, cull_sign=cull_sign)
    order, n_large = _screen_morton_order(tx, ty, valid, height, width)
    tx, ty, tz, tw, b1, b2, valid = (
        a[order] for a in (tx, ty, tz, tw, b1, b2, valid))
    src_sorted = src_id[order]
    data, bbox, num_chunks = _pack_chunks(tx, ty, tz, tw, b1, b2, valid,
                                          tri_chunk)
    n_global = jnp.minimum((n_large + tri_chunk - 1) // tri_chunk,
                           num_chunks).astype(jnp.int32)

    grid = (hp // tile_h, wp // tile_w)
    # per-(tile, chunk) overlap mask, computed as one small XLA op and packed
    # into per-tile int32 bitmask words in SMEM — the kernel's lax.cond skips
    # non-overlapping chunks entirely
    ty_ids = jnp.arange(grid[0], dtype=jnp.float32) * tile_h
    tx_ids = jnp.arange(grid[1], dtype=jnp.float32) * tile_w
    ov_x = ((bbox[None, :, 0] <= tx_ids[:, None] + tile_w)
            & (bbox[None, :, 1] >= tx_ids[:, None]))        # (TX, C)
    ov_y = ((bbox[None, :, 2] <= ty_ids[:, None] + tile_h)
            & (bbox[None, :, 3] >= ty_ids[:, None]))        # (TY, C)
    overlap = (ov_y[:, None, :] & ov_x[None, :, :])         # (TY, TX, C)
    # per-tile [start, end) over local (non-global) chunks
    cid = jnp.arange(num_chunks, dtype=jnp.int32)
    local = overlap & (cid >= n_global)[None, None, :]
    start = jnp.min(jnp.where(local, cid, jnp.int32(2**30)), axis=-1)
    end = jnp.max(jnp.where(local, cid + 1, jnp.int32(0)), axis=-1)
    start = jnp.minimum(start, end)
    ranges = jnp.stack([start, end], -1).reshape(-1)        # (tiles*2,)
    n_words = (num_chunks + 31) // 32
    pad_c = n_words * 32 - num_chunks
    if pad_c:
        overlap = jnp.concatenate(
            [overlap, jnp.zeros(overlap.shape[:2] + (pad_c,), bool)], -1)
    bits = overlap.reshape(grid[0] * grid[1], n_words, 32).astype(jnp.uint32)
    words = (bits << jnp.arange(32, dtype=jnp.uint32)[None, None, :])\
        .sum(-1).astype(jnp.int32).reshape(-1)              # (tiles*W,)
    num_tiles = grid[0] * grid[1]
    # single SMEM int32 table, 128 values per (512-byte) row — 2-D SMEM rows
    # are padded to 512B, so narrow rows waste the whole budget
    meta = jnp.concatenate([n_global.reshape(1), ranges, words])
    pad_m = (-meta.shape[0]) % 128
    if pad_m:
        meta = jnp.concatenate([meta, jnp.zeros((pad_m,), jnp.int32)])
    meta = meta.reshape(-1, 128)

    out_shape = [
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),
    ]
    out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # meta table (rows, 128)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # tri data (C, 24, TC)
    ]
    kernel = functools.partial(
        _raster_kernel, tile_h=tile_h, tile_w=tile_w, tri_chunk=tri_chunk,
        num_chunks=num_chunks, num_tx=grid[1], n_words=n_words,
        num_tiles=num_tiles)
    z, tri, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(meta, data)

    z = z[:height, :width]
    tri = tri[:height, :width].reshape(-1)
    u = u[:height, :width]
    v = v[:height, :width]
    # kernel ids index sorted clipped slots; map back to source triangles
    tri = jnp.where(tri >= 0,
                    src_sorted[jnp.clip(tri, 0, src_sorted.shape[0] - 1)],
                    -1)
    hit = HitRecord(t=z.reshape(-1), tri=tri,
                    u=u.reshape(-1), v=v.reshape(-1))
    return hit, z


# ---------------------------------------------------------------------------
# Binned rasterizer: exact per-tile triangle lists
# ---------------------------------------------------------------------------

def _bin_groups(tx, ty, valid, grid, tile_h: int, tile_w: int,
                group: int, cap_groups: int):
    """Per-tile lists of 8-triangle groups.

    Groups are ``group`` Morton-consecutive triangle slots; a group belongs
    to a tile when its screen bbox overlaps it.  Returns (group_ids
    (tiles, capG) — padded with the last (all-invalid) group, counts
    (tiles,), overflowed (tiles,) bool).
    """
    fp = tx.shape[0]
    g = fp // group
    vx = jnp.where(valid[:, None], tx, _BIG).reshape(g, group, 3)
    vy = jnp.where(valid[:, None], ty, _BIG).reshape(g, group, 3)
    wx = jnp.where(valid[:, None], tx, -_BIG).reshape(g, group, 3)
    wy = jnp.where(valid[:, None], ty, -_BIG).reshape(g, group, 3)
    gbox = jnp.stack([vx.min((1, 2)), wx.max((1, 2)),
                      vy.min((1, 2)), wy.max((1, 2))], axis=1)   # (G, 4)

    ty_ids = jnp.arange(grid[0], dtype=jnp.float32) * tile_h
    tx_ids = jnp.arange(grid[1], dtype=jnp.float32) * tile_w
    ov_x = ((gbox[None, :, 0] <= tx_ids[:, None] + tile_w)
            & (gbox[None, :, 1] >= tx_ids[:, None]))            # (TX, G)
    ov_y = ((gbox[None, :, 2] <= ty_ids[:, None] + tile_h)
            & (gbox[None, :, 3] >= ty_ids[:, None]))            # (TY, G)
    overlap = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(-1, g)

    counts = overlap.sum(axis=-1).astype(jnp.int32)
    overflowed = counts > cap_groups
    # overlapping group ids first (stable argsort of the negated mask)
    order = jnp.argsort(~overlap, axis=-1, stable=True)[:, :cap_groups]
    in_list = jnp.take_along_axis(overlap, order, axis=-1)
    group_ids = jnp.where(in_list, order, g - 1).astype(jnp.int32)
    if group_ids.shape[1] < cap_groups:   # fewer groups than capacity
        fill = jnp.full((group_ids.shape[0],
                         cap_groups - group_ids.shape[1]), g - 1, jnp.int32)
        group_ids = jnp.concatenate([group_ids, fill], axis=1)
    return group_ids, jnp.minimum(counts, cap_groups), overflowed


def _raster_binned_kernel(meta_ref, tri_ref, z_out, slot_out,
                          best_ref, sid_ref, *,
                          tile_h: int, tile_w: int, tri_chunk: int,
                          num_subs: int, num_tx: int):
    """Visibility inner loop on the MXU, occupancy-adaptive.

    Per sub-chunk of 128 triangle slots, one (1024, 4) x (4, 384)
    coefficient matmul (bf16 hi+lo cascade, see _dot_2pass) evaluates
    the affine fields [l1 | l2 | z] for every (pixel, triangle) pair of
    the tile; the VPU derives the remaining inside tests (l1+l2 <= 1,
    0 <= z <= 1), packs depth + winner position into ONE sortable int32
    key (low mantissa bits of positive z carry the position: the whole
    depth test + tie-break collapses into a single running lane-min on a
    (P, 1) accumulator — the (P, TC) best/sid select chain this replaces
    measured ~2x the kernel at 3k tris), and recovers the winner's slot
    id by position in a second activity-guarded pass over the RESIDENT
    coefficient block.  Costs pos_bits (<= 12) mantissa bits of depth
    resolution, <= 2^-12 relative — far below geometric tolerance.
    Coefficients are in *tile-local* pixel space (coefficient forms are
    numerically fine at tile-local magnitudes; it is global 1080p
    magnitudes where they cancel).

    The sub walk is STATIC (python-unrolled; Mosaic's dynamic fori_loop
    trip counts measured pathologically slow when the bound differs from
    the static maximum) but each sub is guarded by ``pl.when`` on this
    tile's activity bitmask from SMEM: per-tile slot lists are
    front-packed per segment, so a tile pays only for the
    ceil(count/128) sub-chunks it actually occupies.  The (P, 1)
    accumulators live in scratch only because SSA values cannot cross
    ``pl.when`` regions.  Only (depth, winner slot id) leave the kernel;
    attributes are recovered by one XLA row gather over the framebuffer.

    Tie-breaking: equal packed keys resolve to the lowest (sub, lane)
    position — deterministic under the fixed list order.
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_id = ti * num_tx + tj
    active = meta_ref[tile_id // 128, tile_id % 128]     # sub bitmask
    p = tile_h * tile_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    py = 0.5 + (pix // tile_w).astype(jnp.float32)
    px = 0.5 + (pix % tile_w).astype(jnp.float32)
    one = jnp.ones((p, 1), jnp.float32)
    zero = jnp.zeros((p, 1), jnp.float32)
    pixmat = jnp.concatenate([px, py, one, zero], axis=1)     # (P, 4)
    tc = tri_chunk
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, tc), 1)

    pos_bits = max(9, (num_subs * tc - 1).bit_length())
    assert pos_bits <= 12   # <= 2^-12 relative depth quantization
    mask = jnp.int32(~((1 << pos_bits) - 1))
    miss_key = 1073741824   # f32 2.0 bit pattern

    best_ref[:, :] = jnp.full((p, 1), miss_key, jnp.int32)
    for s in range(num_subs):
        @pl.when(((active >> s) & 1) != 0)
        def _(s=s):
            d = tri_ref[0, s]                             # (4, 3*TC)
            out = _dot_2pass(pixmat, d)
            l1 = out[:, 0:tc]
            l2 = out[:, tc:2 * tc]
            z = out[:, 2 * tc:3 * tc]
            # the remaining inside tests derive on the VPU (l3 = 1-l1-l2,
            # far plane z <= 1); dead slots carry z = 10 and fail z <= 1
            ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
                  & (l1 + l2 <= 1.0) & (z <= 1.0))
            zm = jnp.where(ok, z, 2.0)
            key = (jax.lax.bitcast_convert_type(zm, jnp.int32) & mask) \
                | (s * tc + lane)
            best_ref[:, :] = jnp.minimum(
                best_ref[:, :], jnp.min(key, axis=-1, keepdims=True))

    bk = best_ref[:, :]
    z = jax.lax.bitcast_convert_type(bk & mask, jnp.float32)  # (P, 1)
    hit = z <= 1.0
    pos = bk & ~mask
    win_sub = pos // tc
    win_lane = pos % tc
    sid_ref[:, :] = jnp.zeros((p, 1), jnp.float32)
    for s in range(num_subs):
        @pl.when(((active >> s) & 1) != 0)
        def _(s=s):
            sel = (win_sub == s) & (lane == win_lane)
            sid = tri_ref[0, s, 3:4, 0:tc]                # (1, TC)
            sid_ref[:, :] = sid_ref[:, :] + jnp.sum(
                jnp.where(sel, sid, 0.0), axis=-1, keepdims=True)

    z_out[:, :] = jnp.where(hit, z, 3.0e38).reshape(tile_h, tile_w)
    slot_out[:, :] = jnp.where(hit, sid_ref[:, :].astype(jnp.int32), -1) \
        .reshape(tile_h, tile_w)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "tile_h", "tile_w", "tri_chunk", "cap_groups",
    "kernel_slots", "caps_scale", "interpret", "proj_height"))
def rasterize_binned(world_verts: jnp.ndarray, tri_vertices: jnp.ndarray,
                     num_faces: jnp.ndarray, view_proj: jnp.ndarray, *,
                     height: int, width: int, tile_h: int = 8,
                     tile_w: int = 128, tri_chunk: int = 128,
                     cap_groups: int = 64, kernel_slots: int = 512,
                     caps_scale: int = 1,
                     interpret: bool | None = None,
                     proj_height: int | None = None, y_offset=None,
                     face_mask=None, cull_sign=None,
                     ) -> Tuple[HitRecord, jnp.ndarray]:
    """Visibility raster with exact per-tile triangle lists.

    XLA builds, per Pallas tile, the capacity-bounded list of 8-triangle
    Morton groups overlapping it (the TPU-native "indirect draw batching":
    the per-tile gather replaces the reference's per-draw command stream,
    RenderPass.cpp:642-664) and gathers their barycentric/depth coefficient
    rows; the kernel statically walks the sub-chunks, evaluating the five
    affine fields on the MXU, and emits only (depth, winner).
    Perspective-correct barycentrics and the source-triangle mapping are
    recovered by one XLA pass over the framebuffer.

    Memory note: the binning matrix is (tiles x groups) bool and the
    gathered coefficients are (tiles, subs, 8, 5*128) f32 — fine up to
    ~100k triangles at 1080p; beyond that raise ``group`` or use the
    ranged `rasterize`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # caps_scale: the renderer's graceful overflow response
    cap_groups = cap_groups * caps_scale
    kernel_slots = kernel_slots * caps_scale

    group = 8   # measured best: finer groups (4) overflow scattered tiles
                # at equal slot capacity and only save ~5% frame time
    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    grid = (hp // tile_h, wp // tile_w)
    num_tiles = grid[0] * grid[1]
    cap_t = cap_groups * group
    kernel_slots = min(_round_up(kernel_slots, tri_chunk), cap_t)
    num_subs = kernel_slots // tri_chunk

    tx, ty, tz, tw, b1, b2, src_id, valid, _ = triangle_setup_clipped(
        world_verts, tri_vertices, num_faces, view_proj,
        proj_height or height, width, y_offset=y_offset,
        face_mask=face_mask, cull_sign=cull_sign)
    order, _ = _screen_morton_order(tx, ty, valid, height, width,
                                    partition_large=False)
    tx, ty, tz, tw, b1, b2, valid = (
        a[order] for a in (tx, ty, tz, tw, b1, b2, valid))
    src_sorted = src_id[order]

    f2 = tx.shape[0]
    fp = _round_up(f2, tri_chunk)
    pad = fp - f2
    if pad:
        padf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        tx, ty, tz, tw, b1, b2, valid = map(
            padf, (tx, ty, tz, tw, b1, b2, valid))
        src_sorted = jnp.concatenate(
            [src_sorted, jnp.zeros((pad,), jnp.int32)])

    # invalid triangles: constant z = 10 -> culled by the z-range test
    tz = jnp.where(valid[:, None], tz, 10.0)

    group_ids, counts, overflowed = _bin_groups(
        tx, ty, valid, grid, tile_h, tile_w, group, cap_groups)
    slots = (group_ids[:, :, None] * group
             + jnp.arange(group, dtype=jnp.int32)[None, None, :]
             ).reshape(num_tiles, cap_t)                  # (tiles, capT)
    return _slots_to_frame(
        tx, ty, tz, tw, b1, b2, src_sorted, slots, overflowed,
        height=height, width=width, hp=hp, wp=wp, grid=grid, tile_h=tile_h,
        tile_w=tile_w, tri_chunk=tri_chunk, kernel_slots=kernel_slots,
        interpret=interpret,
        seg_counts=[(counts * group, _round_up(cap_t, tri_chunk))])


def _sub_activity(seg_counts, num_tiles: int, tri_chunk: int) -> jnp.ndarray:
    """Per-tile sub-chunk activity bitmask (tiles,) i32.

    ``seg_counts`` is a list of (count, cap_slots) per slot-array segment
    — count is (tiles,) or scalar live slots, front-packed within the
    segment; cap_slots must be a multiple of tri_chunk.  Sub s of a
    segment is active for a tile when count > s * tri_chunk.
    """
    bits = jnp.zeros((num_tiles,), jnp.int32)
    sub_off = 0
    for count, cap in seg_counts:
        n_seg = cap // tri_chunk
        assert cap == n_seg * tri_chunk, "segment cap must be 128-aligned"
        count = jnp.broadcast_to(jnp.asarray(count, jnp.int32), (num_tiles,))
        nact = jnp.clip((count + tri_chunk - 1) // tri_chunk, 0, n_seg)
        local = jnp.arange(n_seg, dtype=jnp.int32)
        seg_bits = jnp.sum(
            jnp.where(local[None, :] < nact[:, None],
                      jnp.int32(1) << (sub_off + local)[None, :], 0),
            axis=1, dtype=jnp.int32)
        bits = bits | seg_bits
        sub_off += n_seg
    assert sub_off <= 31, "activity bitmask limited to 31 subs"
    return bits


def _slots_to_frame(tx, ty, tz, tw, b1, b2, src_sorted, slots, overflowed,
                    *, height, width, hp, wp, grid, tile_h, tile_w,
                    tri_chunk, kernel_slots, interpret, seg_counts=None,
                    rows=None):
    """Shared back half of the list-driven rasterizers: gather per-slot
    rows, optional exact-cull compaction, coefficient packing, the Pallas
    kernel, and the attribute resolve.  ``slots`` is (tiles, capT) indices
    into the padded slot arrays (invalid slots must carry tz = 10);
    ``seg_counts`` (see _sub_activity) enables the occupancy-adaptive sub
    walk — None walks every sub for every tile.  Callers may pass
    pre-gathered ``rows`` (tiles, capT, 10) instead of ``slots`` —
    narrow s32 gathers run on the scalar core (a (tiles, capT) slot
    gather measured 14.8 ms where the equivalent 10-wide f32 row gathers
    vectorize to ~3 ms), so the sorted path gathers wide rows end-to-end."""
    num_tiles = grid[0] * grid[1]
    cap_t = slots.shape[1] if rows is None else rows.shape[1]
    kernel_slots = min(_round_up(kernel_slots, tri_chunk), cap_t)
    num_subs = kernel_slots // tri_chunk

    # one contiguous row gather for all per-slot kernel data: x3 y3 z3 +
    # the slot id itself (picked in-kernel by the winner — mapping winner
    # positions to slots in XLA cost a 21 ms 2-D gather, measured)
    fp_ids = jnp.arange(tx.shape[0], dtype=jnp.float32)[:, None]
    packed = jnp.concatenate([tx, ty, tz, fp_ids], axis=1)   # (Fp, 10)
    if rows is None:
        rows = packed[slots]                              # (tiles, capT, 10)
    tile_x0 = ((jnp.arange(num_tiles) % grid[1]) * tile_w
               ).astype(jnp.float32)[:, None]
    tile_y0 = ((jnp.arange(num_tiles) // grid[1]) * tile_h
               ).astype(jnp.float32)[:, None]

    # exact per-slot tile cull + compaction (opt-in, kernel_slots < cap_t):
    # Morton 8-groups inflate tile lists ~4x (a group joins every tile its
    # *joint* bbox overlaps), so the 512 gathered slots can compact to a
    # smaller kernel capacity via one batched sort + one row gather.
    # Measured at 1080p/3k tris the prep costs MORE than the halved sub
    # walk saves (17.3 vs 13.7 ms), so the default ships all slots; denser
    # per-tile lists may tip the balance the other way.
    if kernel_slots < cap_t:
        exact = ((jnp.min(rows[..., 0:3], -1) <= tile_x0 + tile_w)
                 & (jnp.max(rows[..., 0:3], -1) >= tile_x0)
                 & (jnp.min(rows[..., 3:6], -1) <= tile_y0 + tile_h)
                 & (jnp.max(rows[..., 3:6], -1) >= tile_y0)
                 & (jnp.min(rows[..., 6:9], -1) <= 1.0)
                 & (jnp.max(rows[..., 6:9], -1) >= 0.0))  # (tiles, capT)
        iota = jnp.broadcast_to(
            jnp.arange(cap_t, dtype=jnp.int32)[None, :], exact.shape)
        _, order = jax.lax.sort_key_val((~exact).astype(jnp.uint32), iota,
                                        is_stable=True)
        cnt = jnp.sum(exact.astype(jnp.int32), axis=-1)
        overflowed |= cnt > kernel_slots
        take = order[:, :kernel_slots]
        rows = jnp.take_along_axis(rows, take[..., None], axis=1)
        live = jnp.arange(kernel_slots,
                          dtype=jnp.int32)[None, :] < cnt[:, None]
        # compaction front-packs the whole tile list into one segment
        seg_counts = [(jnp.minimum(cnt, kernel_slots), kernel_slots)]
    else:
        live = jnp.ones((num_tiles, cap_t), bool)

    # tile-local coordinates: the kernel's pixel pattern becomes a constant
    gx = rows[..., 0:3].transpose(0, 2, 1) - tile_x0[..., None]
    gy = rows[..., 3:6].transpose(0, 2, 1) - tile_y0[..., None]
    gz = rows[..., 6:9].transpose(0, 2, 1)                # (tiles, 3, capK)
    sid = rows[..., 9:10].transpose(0, 2, 1)              # (tiles, 1, capK)

    # affine barycentric/depth coefficients in tile-local pixels:
    # l1 = a1 x + b1 y + c1, l2 = ..., z = Az x + Bz y + Cz
    ax, bx, cx = gx[:, 0], gx[:, 1], gx[:, 2]             # (tiles, capT)
    ay, by, cy = gy[:, 0], gy[:, 1], gy[:, 2]
    az, bz, cz = gz[:, 0], gz[:, 1], gz[:, 2]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    dead = ~live | (jnp.abs(area) <= 1e-12)   # culled / degenerate / padding
    inv = jnp.where(dead, 0.0, 1.0 / jnp.where(dead, 1.0, area))
    ka1 = -(ay - cy) * inv
    kb1 = (ax - cx) * inv
    kc1 = (cx * (ay - cy) - cy * (ax - cx)) * inv
    ka2 = -(by - ay) * inv
    kb2 = (bx - ax) * inv
    kc2 = (ax * (by - ay) - ay * (bx - ax)) * inv
    dz1, dz2 = bz - az, cz - az
    azc = ka1 * dz1 + ka2 * dz2
    bzc = kb1 * dz1 + kb2 * dz2
    czc = az + kc1 * dz1 + kc2 * dz2
    czc = jnp.where(dead, 10.0, czc)   # (1-z) >= 0 test culls dead slots
    azc = jnp.where(dead, 0.0, azc)
    bzc = jnp.where(dead, 0.0, bzc)
    def fld(a, b, c):   # 3 coefficient planes -> (tiles, S, 3, TC)
        return jnp.stack([a, b, c], axis=1)\
            .reshape(num_tiles, 3, num_subs, tri_chunk).transpose(0, 2, 1, 3)

    coef = jnp.concatenate(
        [fld(ka1, kb1, kc1), fld(ka2, kb2, kc2), fld(azc, bzc, czc)],
        axis=3)                                       # (tiles, S, 3, 3*TC)
    # row 3 multiplies pixmat's zero column; its first TC columns carry the
    # slot ids for the in-kernel winner pick
    sid_row = sid.reshape(num_tiles, 1, num_subs, tri_chunk)\
        .transpose(0, 2, 1, 3)                        # (tiles, S, 1, TC)
    row3 = jnp.concatenate(
        [sid_row,
         jnp.zeros((num_tiles, num_subs, 1, 2 * tri_chunk), jnp.float32)],
        axis=3)
    data = jnp.concatenate([coef, row3], axis=2)      # (tiles, S, 4, 3*TC)

    # per-tile sub activity bitmask in one SMEM int32 table (128 values per
    # 512-byte row)
    if seg_counts is not None:
        bits = _sub_activity(seg_counts, num_tiles, tri_chunk)
    else:
        bits = jnp.full((num_tiles,), (1 << num_subs) - 1, jnp.int32)
    pad_m = (-num_tiles) % 128
    if pad_m:
        bits = jnp.concatenate([bits, jnp.zeros((pad_m,), jnp.int32)])
    meta = bits.reshape(-1, 128)

    p = tile_h * tile_w
    out_shape = [
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),
    ]
    out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),      # activity bitmasks
        pl.BlockSpec((1, num_subs, 4, 3 * tri_chunk),
                     lambda i, j, nx=grid[1]: (i * nx + j, 0, 0, 0),
                     memory_space=pltpu.VMEM),      # per-tile coefficients
    ]
    kernel = functools.partial(
        _raster_binned_kernel, tile_h=tile_h, tile_w=tile_w,
        tri_chunk=tri_chunk, num_subs=num_subs, num_tx=grid[1])
    z, slot = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 2,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((p, 1), jnp.int32),
                        pltpu.VMEM((p, 1), jnp.float32)],
        interpret=interpret,
    )(meta, data)

    return _resolve_frame(z, slot, tx, ty, tw, b1, b2, src_sorted,
                          overflowed, height=height, width=width)


def _resolve_frame(z, slot, tx, ty, tw, b1, b2, src_sorted, overflowed,
                   *, height, width):
    """XLA resolve: per-pixel winner slot -> (HitRecord, z)."""
    z = z[:height, :width]
    slot = slot[:height, :width]
    hit_mask = slot >= 0
    slot = jnp.maximum(slot, 0)

    # one contiguous row gather per pixel (15 separate per-index gathers
    # measured ~10x worse), block-transposed for free field extraction —
    # naive column slices of the lane-padded result cost 1.41 ms EACH at
    # 1080p (see ops/rowgather.py)
    from vri_tpu.ops.rowgather import gather_rows

    table = jnp.concatenate(
        [tx, ty, tw, b1, b2, src_sorted.astype(jnp.float32)[:, None]],
        axis=1)                                           # (Fp, 16)
    raw = gather_rows(table, slot.reshape(-1))
    fld = lambda k: raw(k).reshape(slot.shape)
    ax, bx, cx = fld(0), fld(1), fld(2)
    ay, by, cy = fld(3), fld(4), fld(5)
    w0, w1, w2 = fld(6), fld(7), fld(8)

    pxc = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    pyc = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
    e1 = (ax - cx) * (pyc - cy) - (ay - cy) * (pxc - cx)
    e2 = (bx - ax) * (pyc - ay) - (by - ay) * (pxc - ax)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-20, area, 1.0)
    l1 = e1 * inv_area
    l2 = e2 * inv_area
    l0 = 1.0 - l1 - l2
    p0 = l0 * w0
    p1 = l1 * w1
    p2 = l2 * w2
    inv_sum = 1.0 / jnp.maximum(p0 + p1 + p2, 1e-20)
    u_c = p1 * inv_sum
    v_c = p2 * inv_sum
    w_c = 1.0 - u_c - v_c
    src_u = w_c * fld(9) + u_c * fld(10) + v_c * fld(11)
    src_v = w_c * fld(12) + u_c * fld(13) + v_c * fld(14)
    tri = jnp.where(hit_mask, fld(15).astype(jnp.int32), -1)
    z = jnp.where(hit_mask, z, _BIG)

    hit = HitRecord(t=z.reshape(-1), tri=tri.reshape(-1),
                    u=jnp.where(hit_mask, src_u, 0.0).reshape(-1),
                    v=jnp.where(hit_mask, src_v, 0.0).reshape(-1),
                    overflow=jnp.sum(overflowed.astype(jnp.int32)))
    return hit, z


# ---------------------------------------------------------------------------
# Sort-binned rasterizer: exact per-tile lists at any triangle count
# ---------------------------------------------------------------------------

def _segment_lists(keys, vals, n_segments: int, cap: int, fill: int):
    """Sorted-pair stream -> capacity-bounded per-segment lists.

    ``keys`` (P,) u32 segment ids (n_segments = invalid), ``vals`` (P,)
    payloads.  One ``sort_key_val`` + searchsorted — the same
    stream-compaction pattern as the SDF builder's cell binning.
    Returns (lists (n_segments, cap) filled with ``fill``, counts).
    """
    skeys, svals = jax.lax.sort_key_val(keys, vals, is_stable=True)
    starts = jnp.searchsorted(
        skeys, jnp.arange(n_segments + 1, dtype=jnp.uint32))
    count = (starts[1:] - starts[:-1]).astype(jnp.int32)
    k_ids = jnp.arange(cap, dtype=jnp.int32)
    gidx = starts[:n_segments, None].astype(jnp.int32) + k_ids[None, :]
    in_seg = k_ids[None, :] < count[:, None]
    lists = jnp.where(in_seg, svals[jnp.minimum(gidx, skeys.shape[0] - 1)],
                      fill)
    return lists, count


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "tile_h", "tile_w", "tri_chunk", "cap",
    "cap_glob", "pairs_cap", "caps_scale", "interpret", "proj_height",
    "grouped", "fused", "probe", "walker", "emit_path"))
def rasterize_sorted(world_verts: jnp.ndarray, tri_vertices: jnp.ndarray,
                     num_faces: jnp.ndarray, view_proj: jnp.ndarray, *,
                     height: int, width: int, tile_h: int = 8,
                     tile_w: int = 128, tri_chunk: int = 128,
                     cap: int = 2048, cap_glob: int = 512,
                     pairs_cap: int | None = None, caps_scale: int = 1,
                     interpret: bool | None = None,
                     proj_height: int | None = None, y_offset=None,
                     face_mask=None, cull_sign=None, grouped: bool = True,
                     fused: bool | None = None, probe: str = "none",
                     walker: str = "steps", src_map=None,
                     emit_path: str = "auto",
                     ) -> Tuple[HitRecord, jnp.ndarray]:
    """Visibility raster with sort-built EXACT per-tile lists — the scale
    path (cost O(F log F + live pairs), no (tiles x groups) matrices).

    Each visible triangle emits EXACTLY one (tile, slot) pair per screen
    tile its clamped bbox covers (segmented-repeat emission; the
    TPU-native indirect-draw batching, per-draw loop analog
    RenderPass.cpp:642-664).  One ``sort_key_val`` + binary search
    builds front-packed per-tile lists; a scalar-prefetched WORK-LIST
    kernel walks exactly the ceil(count/128) chunks each tile occupies
    and resolves the winner's attributes IN-KERNEL (rational-affine
    (u, v) + triangle id fields ride the template), so no per-pixel
    gather runs after the walk.
    ``cap`` bounds one tile's list span, ``pairs_cap`` the emitted pair
    stream (default 6x the slot count).  Capacity overflow sets
    ``HitRecord.overflow`` (the renderer escalates ``caps_scale`` then
    falls back to the capacity-free ranged kernel).  ``cap_glob`` is
    retained for call compatibility (unused since exact emission needs
    no whole-grid class).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # caps_scale: the renderer's graceful overflow response (doubling the
    # list capacities costs far less than the 20x ranged-kernel cliff)
    cap = cap * caps_scale
    cap_glob = cap_glob * caps_scale
    if pairs_cap is not None:
        pairs_cap = pairs_cap * caps_scale

    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    grid = (hp // tile_h, wp // tile_w)
    num_tiles = grid[0] * grid[1]
    cap = _round_up(cap, tri_chunk)

    extra = max(tri_vertices.shape[0] // 16, 256) * caps_scale
    tx, ty, tz, tw, b1, b2, src_id, valid, clip_over = \
        triangle_setup_clipped(
            world_verts, tri_vertices, num_faces, view_proj,
            proj_height or height, width, y_offset=y_offset,
            extra_cap=extra, face_mask=face_mask, cull_sign=cull_sign,
            src_map=src_map)
    src_sorted = src_id

    f2 = tx.shape[0]
    fp = _round_up(f2 + 1, tri_chunk)   # >= 1 guaranteed-invalid pad slot
    pad = fp - f2
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    tx, ty, tz, tw, b1, b2, valid = map(
        padf, (tx, ty, tz, tw, b1, b2, valid))
    src_sorted = jnp.concatenate([src_sorted, jnp.zeros((pad,), jnp.int32)])
    tz = jnp.where(valid[:, None], tz, 10.0)
    fill = fp - 1                        # padded -> invalid (tz = 10)
    if fused is None:
        fused = fp <= _FUSED_MAX_SLOTS

    # per-slot inclusive tile span from the screen bbox
    lox, hix = tx.min(axis=1), tx.max(axis=1)
    loy, hiy = ty.min(axis=1), ty.max(axis=1)
    tx0 = jnp.floor(lox / tile_w).astype(jnp.int32)
    tx1 = jnp.floor(hix / tile_w).astype(jnp.int32)
    ty0 = jnp.floor(loy / tile_h).astype(jnp.int32)
    ty1 = jnp.floor(hiy / tile_h).astype(jnp.int32)
    on_screen = ((tx1 >= 0) & (tx0 < grid[1])
                 & (ty1 >= 0) & (ty0 < grid[0]))
    vis = valid & on_screen

    # EXACT per-slot emission (no window-class quantization): every
    # visible slot emits precisely its clamped bbox-tile count via the
    # scatter+cumsum segmented-repeat pattern, so the sorted stream holds
    # only real (tile, slot) pairs.  The window-class ladder this replaces
    # emitted static per-class capacities (2.13M keys/frame at 49k tris,
    # 1080p -- 52% from the whole-grid class alone) and paid the sort +
    # emission passes for every dead pair; exact emission sorts ~0.25M.
    # Screen-dominating or near-plane-exploded slots are naturally bounded
    # by the on-screen clamp (<= num_tiles pairs); ``pairs_cap`` bounds the
    # total with a counted overflow (the renderer escalates caps_scale --
    # capacity pressure is never silent).
    tc = tri_chunk
    if pairs_cap is None:
        # backface culling (cull_sign) roughly halves live pairs on solid
        # scenes, so the sort / stream-gather / template arrays (all sized
        # by pairs_cap, STATIC) shrink with it; an all-doubleSided stage
        # that exceeds the culled budget overflows COUNTED and the
        # renderer escalates caps_scale — never silent.
        # The ABSOLUTE cap matters at city scale: the stream/template
        # build pays pairs_cap rows regardless of live pairs (a 1.35M-tri
        # stage emitted 822k live pairs but a 10.8M-row template = ~0.5 GB
        # per pass = 3.7 s/frame).  2M covers every measured view with
        # >2x headroom; denser frames overflow counted and the ladder
        # escalates to 4M/8M.
        mult = 6 if cull_sign is None else 4
        pairs_cap = max(min(mult * fp, 2 * 1024 * 1024),
                        128 * 1024) * caps_scale
    pairs_cap = _round_up(pairs_cap, tc)

    ry0 = jnp.clip(ty0, 0, grid[0] - 1)
    rx0 = jnp.clip(tx0, 0, grid[1] - 1)
    e_rows = jnp.where(vis, jnp.clip(ty1, 0, grid[0] - 1) - ry0 + 1, 0)
    e_cols = jnp.where(vis, jnp.clip(tx1, 0, grid[1] - 1) - rx0 + 1, 0)
    area_t = e_rows * e_cols                       # (fp,) pairs per slot
    starts_x = jnp.cumsum(area_t) - area_t         # exclusive prefix
    total_pairs = starts_x[-1] + area_t[-1]
    emit_over = jnp.maximum(total_pairs - pairs_cap, 0)

    # Per-pair slot id / window geometry / segment start WITHOUT random
    # gathers (random s32 gathers measured ~2 ms each at this size; the
    # scatter+cumsum carries below are ~0.5 ms total).  The carry trick:
    # for a MONOTONE per-slot field, scatter each live slot's delta vs
    # the previous live slot's value at its first pair position; a
    # prefix sum then broadcasts the field across the segment.  The two
    # carried words are built monotone by packing behind an increasing
    # prefix (slot id / segment start).
    live_slot = area_t > 0
    sx = max(grid[1] - 1, 1).bit_length()
    sy = max(grid[0] - 1, 1).bit_length()
    cb = sx + 1                                    # e_cols <= grid[1]
    j = jnp.arange(pairs_cap, dtype=jnp.int32)
    sb = max(fp - 1, 1).bit_length()

    def seg_carry(field):
        """Monotone per-slot field -> per-pair value per segment."""
        masked = jnp.where(live_slot, field, -1)
        prev_live = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32),
             jax.lax.cummax(masked)[:-1]])
        diff = jnp.where(live_slot,
                         field - jnp.maximum(prev_live, 0), 0)
        buf = jnp.zeros((pairs_cap,), jnp.int32).at[
            jnp.where(live_slot, starts_x, pairs_cap)].add(
                diff, mode="drop")
        return jnp.cumsum(buf)

    # ``emit_path``: "auto" picks by bit budget; "split" / "search" force
    # the big-pool tiers (tests assert their parity with the packed path)
    slot_iota = jnp.arange(fp, dtype=jnp.int32)
    if fp < (1 << (31 - sx - sy)) and emit_path == "auto":
        # word A: [slot id | ry0 | rx0]  (monotone: slot id ascends)
        word_a = (slot_iota << (sx + sy)) | (ry0 << sx) | rx0
        # word B: [segment start | e_cols]  (monotone: starts strictly
        # ascend across live slots)
        word_b = (starts_x.astype(jnp.int32) << cb) | e_cols
        a = seg_carry(word_a)
        b = seg_carry(word_b)
        sid = a >> (sx + sy)
        k_start = b >> cb
        cols_s = jnp.maximum(b & ((1 << cb) - 1), 1)
        ry0_p = (a >> sx) & ((1 << sy) - 1)
        rx0_p = a & ((1 << sx) - 1)
    elif (sb + max(sx, sy) <= 31
          and pairs_cap.bit_length() + cb <= 31
          and emit_path != "search"):
        # big pools (>= 2^19 slots at 1080p, e.g. the compacted city
        # stage): the single word can't hold [slot|ry0|rx0], but ANY
        # (monotone << k) | field word still fits i32 one field at a
        # time — three split-word carries replace the searchsorted +
        # per-pair row gathers this branch used (log2-pass binary
        # search + 4 latency-bound gathers over the pair stream:
        # ~200 ms of the 1M-slot city frame's 289 ms setup+emission)
        w_y = seg_carry((slot_iota << sy) | ry0)
        w_x = seg_carry((slot_iota << sx) | rx0)
        w_s = seg_carry((starts_x.astype(jnp.int32) << cb) | e_cols)
        sid = w_y >> sy
        ry0_p = w_y & ((1 << sy) - 1)
        rx0_p = w_x & ((1 << sx) - 1)
        k_start = w_s >> cb
        cols_s = jnp.maximum(w_s & ((1 << cb) - 1), 1)
    else:
        # beyond even the split-word budget: searchsorted + row gathers
        # (no bit budget at all; the SDF binner makes the same trade)
        cum = jnp.cumsum(area_t)
        sid = jnp.minimum(jnp.searchsorted(cum, j, side="right"),
                          fp - 1).astype(jnp.int32)
        k_start = (cum[sid] - area_t[sid]).astype(jnp.int32)
        cols_s = jnp.maximum(e_cols[sid], 1)
        ry0_p = ry0[sid]
        rx0_p = rx0[sid]
    k_local = j - k_start
    # i32 division by a vector lowers to a long software sequence on the
    # VPU; the f32 form is exact here: for live pairs k_local < num_tiles
    # (<= 2^15 at any sane framebuffer) and (k_local + 0.5) / cols lands
    # strictly inside (dy, dy+1) with margin 0.5/cols >> the f32 rounding
    # error, so floor() cannot misround.  (Dead tail pairs may misround;
    # their keys are overwritten below.)
    dy = jnp.floor((k_local.astype(jnp.float32) + 0.5)
                   / cols_s.astype(jnp.float32)).astype(jnp.int32)
    dx = k_local - dy * cols_s
    tile_of = (ry0_p + dy) * grid[1] + rx0_p + dx
    dead_pair = j >= total_pairs
    # PACKED single-array sort when (tile, slot) fits one u32: sorting one
    # word moves half the data of sort_key_val and yields the IDENTICAL
    # order — the stable tile sort kept emission order within a tile,
    # which is ascending slot id (starts_x ascends with slot), exactly
    # the packed key's low-bit tiebreak.  Dead pairs pack
    # (num_tiles, fill) which sorts after every live tile.
    slot_bits = max(fp - 1, 1).bit_length()
    tile_bits = num_tiles.bit_length()
    if slot_bits + tile_bits <= 32:
        pk = ((tile_of.astype(jnp.uint32) << slot_bits)
              | sid.astype(jnp.uint32))
        dead_key = jnp.uint32((num_tiles << slot_bits) | fill)
        spk = jax.lax.sort(jnp.where(dead_pair, dead_key, pk))
        svals = (spk & jnp.uint32((1 << slot_bits) - 1)).astype(jnp.int32)
        starts = _binsearch_first_geq(
            spk, jnp.arange(num_tiles + 1, dtype=jnp.uint32) << slot_bits)
    else:
        keys = jnp.where(dead_pair, jnp.uint32(0x7FFFFFFF),
                         tile_of.astype(jnp.uint32))
        vals = jnp.where(dead_pair, fill, sid)
        skeys, svals = jax.lax.sort_key_val(keys, vals, is_stable=True)
        starts = _binsearch_first_geq(
            skeys, jnp.arange(num_tiles + 1, dtype=jnp.uint32))
    count = (starts[1:] - starts[:-1]).astype(jnp.int32)

    if probe == "sort":
        # profiling: setup + emission + the pair sort, none of the
        # template build or walk (city prep attribution)
        s = (jnp.sum(svals).astype(jnp.float32)
             + jnp.sum(count).astype(jnp.float32))
        dummy = jnp.broadcast_to(s * 1e-20, (height * width,))
        hit = HitRecord(t=dummy, tri=dummy.astype(jnp.int32), u=dummy,
                        v=dummy, overflow=jnp.int32(0))
        return hit, dummy.reshape(height, width)
    if probe == "emit":
        # profiling: setup + emission only (keys before the sort)
        s = (jnp.sum(tile_of).astype(jnp.float32)
             + jnp.sum(sid).astype(jnp.float32)
             + jnp.sum(tz) + jnp.sum(tw))
        dummy = jnp.broadcast_to(s * 1e-20, (height * width,))
        hit = HitRecord(t=dummy, tri=dummy.astype(jnp.int32), u=dummy,
                        v=dummy, overflow=jnp.int32(0))
        return hit, dummy.reshape(height, width)

    # CHUNKED list fetch: per-tile slot windows are fetched as whole
    # 128-slot chunks of the sorted stream, starting at the tile's
    # aligned chunk.  The <=127 leading slots belong to earlier tiles and
    # the trailing chunk may run into later tiles \u2014 both are BENIGN: the
    # kernel's half-plane/z tests delimit each triangle exactly, so a
    # foreign slot either re-adds coverage this tile also emitted (bbox
    # emission is conservative) or covers no pixel here.  Gathering 5 KB
    # contiguous chunks keeps the gather on the vector path \u2014 the
    # front-packed (tiles, cap) row gather this replaces lowered to a
    # {0,1}-layout strided gather measured at 12.8 ms/frame.
    live_pairs = starts[num_tiles].astype(jnp.int32)

    # Per-slot affine coefficients in a TRIANGLE-LOCAL frame (origin =
    # the slot's screen-bbox min): construction at local magnitudes is
    # well-conditioned (global-1080p construction cancels at ~half a
    # pixel); the kernel translates the constant terms to each tile's
    # origin with two FMAs per field \u2014 the translation error scales with
    # the field's value at the tile origin, not with the coordinate
    # magnitude, so distant tiles lose nothing where it matters (near
    # the triangle's own edges).  Precomputing here (once per SLOT, in
    # XLA) is what lets the kernel go straight to the MXU: the
    # VPU-elementwise in-kernel setup + broadcast-FMA evaluation this
    # replaces measured ~2.8 us per (tile, chunk) step vs ~1 us for the
    # matmul form (ROADMAP perf log).
    ox = jnp.floor(lox)
    oy = jnp.floor(loy)
    gx = tx - ox[:, None]
    gy = ty - oy[:, None]
    ax_, bx_, cx_ = gx[:, 0], gx[:, 1], gx[:, 2]
    ay_, by_, cy_ = gy[:, 0], gy[:, 1], gy[:, 2]
    az_, bz_, cz_ = tz[:, 0], tz[:, 1], tz[:, 2]
    area = (bx_ - ax_) * (cy_ - ay_) - (by_ - ay_) * (cx_ - ax_)
    dead = ~valid | (jnp.abs(area) <= 1e-12)
    inv = jnp.where(dead, 0.0, 1.0 / jnp.where(dead, 1.0, area))
    ka1 = -(ay_ - cy_) * inv
    kb1 = (ax_ - cx_) * inv
    kc1 = (cx_ * (ay_ - cy_) - cy_ * (ax_ - cx_)) * inv
    ka2 = -(by_ - ay_) * inv
    kb2 = (bx_ - ax_) * inv
    kc2 = (ax_ * (by_ - ay_) - ay_ * (bx_ - ax_)) * inv
    dz1, dz2 = bz_ - az_, cz_ - az_
    kaz = ka1 * dz1 + ka2 * dz2
    kbz = kb1 * dz1 + kb2 * dz2
    kcz = az_ + kc1 * dz1 + kc2 * dz2
    kcz = jnp.where(dead, 10.0, kcz)   # z <= 1 test culls dead slots
    kaz = jnp.where(dead, 0.0, kaz)
    kbz = jnp.where(dead, 0.0, kbz)
    if fused:
        # FUSED-RESOLVE coefficients: the perspective-corrected
        # attributes are RATIONAL AFFINE in screen space —
        # numerator(src_u) = sum_i l_i * w_i * su_i and denominator =
        # sum_i l_i * w_i are both affine in (x, y) since each screen
        # barycentric l_i is.  Shipping their affine coefficients as
        # three more template field groups lets the kernel hand back
        # final (u, v, tri) planes directly and deletes the resolve's
        # 2M-pixel 16-field row gather + layout copy (measured
        # 5.4 ms/frame at 1080p).  Same math as `_resolve_frame`,
        # factored: u_c = p1/Σp, src_u = l0c*su0 + u_c*su1 + v_c*sv2
        # == un/den.  The wider template costs the walk ~2x per step,
        # so this path is selected only when the slot count is small
        # enough that the per-pixel resolve dominates the walk
        # (fp <= _FUSED_MAX_SLOTS; measured crossover in BASELINE.md).
        w0_, w1_, w2_ = tw[:, 0], tw[:, 1], tw[:, 2]
        su0, su1, su2 = b1[:, 0], b1[:, 1], b1[:, 2]
        sv0, sv1, sv2 = b2[:, 0], b2[:, 1], b2[:, 2]
        au_ = w1_ * su1 - w0_ * su0
        bu_ = w2_ * su2 - w0_ * su0
        av_ = w1_ * sv1 - w0_ * sv0
        bv_ = w2_ * sv2 - w0_ * sv0
        ad_ = w1_ - w0_
        bd_ = w2_ - w0_
        kau = ka1 * au_ + ka2 * bu_
        kbu = kb1 * au_ + kb2 * bu_
        kcu = w0_ * su0 + kc1 * au_ + kc2 * bu_
        kav = ka1 * av_ + ka2 * bv_
        kbv = kb1 * av_ + kb2 * bv_
        kcv = w0_ * sv0 + kc1 * av_ + kc2 * bv_
        kad = ka1 * ad_ + ka2 * bd_
        kbd = kb1 * ad_ + kb2 * bd_
        kcd = jnp.where(dead, 1.0, w0_ + kc1 * ad_ + kc2 * bd_)
        # 24-field packed slot table: 6 coefficient triples (l1 l2 z un
        # vn den) + [ox oy tri pad..]; gathered once per stream entry,
        # then restacked into the kernel-operand template below.  tri
        # ids ride as f32 (exact below 2^24; guarded by the registry).
        packed = jnp.stack(
            [ka1, kb1, kc1, ka2, kb2, kc2, kaz, kbz, kcz,
             kau, kbu, kcu, kav, kbv, kcv, kad, kbd, kcd,
             ox, oy, src_sorted.astype(jnp.float32),
             jnp.zeros_like(ox), jnp.zeros_like(ox), jnp.zeros_like(ox)],
            axis=1)                                       # (fp, 24)
    else:
        # 12-field packed slot table: 3 coefficient triples (l1 l2 z) +
        # [ox oy slot]; the winner SLOT id leaves the kernel and the
        # shared XLA row-gather resolve recovers attributes
        packed = jnp.stack(
            [ka1, kb1, kc1, ka2, kb2, kc2, kaz, kbz, kcz, ox, oy,
             jnp.arange(fp, dtype=jnp.float32)], axis=1)  # (fp, 12)
    nf = 6 if fused else 3                  # template field groups

    # (A 128-aligned per-tile chunk re-gather was tried here to remove
    # foreign-HEAD slots — it measured SLOWER (33.2 vs 29.6 ms at 49k):
    # per-tile chunks defeat the DMA skip for consecutive small tiles
    # sharing one stream chunk, and inflate the template build ~1.7x.
    # The shared-stream walk below keeps both.)
    stream = packed[svals[:pairs_cap]]                 # (pairs_cap, 4nf)
    cm = stream.reshape(pairs_cap // tc, tc, 4 * nf) \
        .transpose(0, 2, 1)                            # (C, 4nf, TC)
    # kernel-operand template (C, 8, nf*TC): rows 0-1 = the (2, nf*TC)
    # MXU operand [a-coefs | b-coefs] over the nf fields (l1, l2, z
    # [, un, vn, den]), row 2 = local-frame constants, rows 3-4 = slot
    # origins (replicated per field group), row 5 = slot/triangle ids,
    # rows 6-7 = pad to the 8-sublane f32 tile.  Pre-packing here
    # matters: Mosaic cannot CONCATENATE vector slices whose sublane
    # offsets differ (offset-mismatch concat is unimplemented as of
    # this writing), so the kernel must receive every multi-row operand
    # contiguous at offset 0 and only combine single rows elementwise.
    def grp(idxs):
        return jnp.concatenate([cm[:, i] for i in idxs], axis=-1)
    rep = lambda i: jnp.tile(cm[:, i], (1, nf))
    zero_g = jnp.zeros_like(cm[:, 0:1])
    a_idx = tuple(range(0, 3 * nf, 3))
    chunks = jnp.stack(
        [grp(a_idx), grp(tuple(i + 1 for i in a_idx)),
         grp(tuple(i + 2 for i in a_idx)),
         rep(3 * nf), rep(3 * nf + 1), rep(3 * nf + 2)],
        axis=1)                                        # (C, 6, nf*TC)
    chunks = jnp.concatenate(
        [chunks, jnp.tile(zero_g, (1, 2, nf))], axis=1)  # (C, 8, nf*TC)
    num_chunks = pairs_cap // tc

    if probe == "prep":
        # profiling hook (tools/prof_prep49.py): everything up to and
        # including the kernel templates, none of the kernel walk — the
        # frame's per-frame prep share, fully consumed
        s = (jnp.sum(chunks) * 1e-20 + jnp.sum(count).astype(jnp.float32)
             + jnp.sum(_bf16_split_rows(chunks).astype(jnp.float32))
             * 1e-20)
        dummy = jnp.broadcast_to(s, (height * width,))
        hit = HitRecord(t=dummy, tri=dummy.astype(jnp.int32), u=dummy,
                        v=dummy, overflow=jnp.int32(0))
        return hit, dummy[: height * width].reshape(height, width)

    # ---- grouped-singleton tier: tiles whose whole list fits in W
    # lanes leave the dense walk entirely (G = 128/W share one step) ----
    grouped_args = None
    grouped_tile = jnp.zeros((num_tiles,), bool)
    if grouped and tc in (128, 256):
        fl_g, chunks_g, src_row, grouped_tile, n_gsteps = _pack_grouped(
            count, starts[:num_tiles].astype(jnp.int32), stream,
            num_tiles=num_tiles, num_tx=grid[1], tile_h=tile_h,
            tile_w=tile_w, tri_chunk=tc, pairs_cap=pairs_cap, nf=nf)
        grouped_args = (fl_g, chunks_g, src_row, grouped_tile, n_gsteps)

    # ---- work list: one entry per (tile, chunk) walk step -------------
    # EVERY non-grouped tile contributes >= 1 step so its output rows get
    # written (init + finalize); an empty tile's single step walks a
    # foreign chunk, which is benign -- the kernel's half-plane/z tests
    # are exact, so slots whose bbox excludes the tile cover no pixel here
    max_subs = cap // tc + 1            # +1: aligned-start slack
    start_chunk = jnp.minimum(starts[:num_tiles].astype(jnp.int32) // tc,
                              num_chunks - 1)
    end = starts[1:].astype(jnp.int32)
    span = end - start_chunk * tc
    nsub = jnp.clip((span + tc - 1) // tc, 1, max_subs)
    nsub = jnp.where(grouped_tile, 0, nsub)
    cum = jnp.cumsum(nsub)
    total_work = cum[-1]
    offs = cum - nsub
    wcap = num_tiles + pairs_cap // tc
    widx = jnp.arange(wcap, dtype=jnp.int32)
    wt = jnp.searchsorted(cum, widx, side="right").astype(jnp.int32)
    live = widx < total_work
    wt = jnp.where(live, jnp.minimum(wt, num_tiles - 1), num_tiles - 1)
    within = widx - offs[wt]
    wchunk = jnp.minimum(start_chunk[wt] + within, num_chunks - 1)
    wchunk = jnp.where(live, wchunk, 0)
    first = live & (within == 0)
    last = live & (widx == cum[wt] - 1)
    flags = (first.astype(jnp.int32) + 2 * last.astype(jnp.int32)
             + 4 * live.astype(jnp.int32))

    overflowed = jnp.any((span > max_subs * tc) & ~grouped_tile) \
        | (emit_over > 0) | (clip_over > 0)

    tileloop_args = None
    if walker == "tileloop" and not interpret:
        # EXPERIMENTAL: one grid step per (non-grouped) tile; the kernel
        # streams the tile's chunks through an in-kernel double-buffered
        # DMA loop.  Bit-exact vs the step walker (same per-chunk math;
        # asserted on real TPU by tools/check_tileloop.py) but measured
        # SLOWER at production scales (16.3 vs 14.9 ms at 49k — the grid
        # pipeline already hides the DMA), so no production caller
        # selects it.  interpret mode keeps the step walk (manual DMA
        # semantics are TPU-only).
        live_t = ~grouped_tile
        tl_pos = jnp.nonzero(live_t, size=num_tiles, fill_value=0)[0] \
            .astype(jnp.int32)
        n_live = jnp.clip(jnp.sum(live_t.astype(jnp.int32)), 1, num_tiles)
        st_tl = start_chunk[tl_pos]
        ns_tl = jnp.where(count[tl_pos] > 0,
                          jnp.clip((span[tl_pos] + tc - 1) // tc, 1,
                                   max_subs), 0)
        tileloop_args = (tl_pos, st_tl, ns_tl, n_live)

    if probe == "debug":
        return dict(wt=wt, wchunk=wchunk, flags=flags, chunks=chunks,
                    svals=svals, starts=starts, count=count, nsub=nsub,
                    grouped_tile=grouped_tile), None
    return _worklist_to_frame(
        wt, wchunk, flags, chunks, overflowed,
        total_work=jnp.clip(total_work, 1, wcap),
        height=height, width=width, hp=hp, wp=wp, grid=grid,
        tile_h=tile_h, tile_w=tile_w, tri_chunk=tc, interpret=interpret,
        fused=fused,
        resolve_args=None if fused else (tx, ty, tw, b1, b2, src_sorted),
        grouped_args=grouped_args, tileloop_args=tileloop_args)


def _pass1_kernel(wt_ref, wc_ref, fl_ref, chunks_ref, chunksb_ref, *refs,
                  tile_h: int, tile_w: int, tri_chunk: int, num_tx: int,
                  fused: bool, packed_bits: int = 0):
    """Work-list visibility walk: one (tile, chunk) step per grid index.

    The TPU-native indirect draw: the grid iterates a scalar-prefetched
    work list of exactly the chunks each tile walks (consecutive steps
    share the tile, so scratch state stays resident).  Each chunk block
    arrives coefficient-major (8, 3TC) with the affine fields already
    constructed in per-TRIANGLE local frames; the kernel translates the
    constant terms to this tile's origin (two FMAs per field on (1, 3TC)
    rows) and evaluates all (pixel, slot) pairs with ONE
    (P, 2) x (2, 3*TC) matmul on the MXU plus a broadcast constant add —
    the VPU broadcast-FMA form this replaces measured ~2.8 us/step vs
    ~1 us for the matmul form.
    Per-LANE best (z, slot id) accumulate in (P, TC) scratch across the
    tile's steps (one compare + two selects per step); the cross-lane
    winner reduction runs once per tile on its last step.  Ties resolve
    to the earlier chunk on the same lane, then the lowest lane —
    deterministic under the fixed emission order.  Two resolve modes
    (static `fused`): FUSED extracts the winner's perspective-corrected
    (u, v) and triangle id per step from the rational-affine fields
    (un, vn, den) via an exact one-hot select-sum, so final attribute
    planes leave the kernel; GATHER extracts only the winner slot id
    and the shared XLA row-gather resolve recovers attributes (cheaper
    per step — the large-slot-count mode, see _FUSED_MAX_SLOTS).
    """
    if fused:
        z_row, u_row, v_row, tri_row, best_ref, u_ref, v_ref, tri_ref \
            = refs
    else:
        z_row, slot_row, best_ref, sid_ref = refs
    i = pl.program_id(0)
    if packed_bits:
        # single packed work word [chunk | tile | flags] — 3x less SMEM
        # for the scalar-prefetched work list (the 3-array form blew the
        # 1 MB SMEM budget at ~1.3M-triangle pair streams)
        fl = wt_ref[i] & 7
    else:
        fl = fl_ref[i]
    p = tile_h * tile_w
    tc = tri_chunk
    lane_bits = (tc - 1).bit_length()
    mask = jnp.int32(~((1 << lane_bits) - 1))
    miss = jnp.int32(1073741824)                # f32 2.0 bit pattern
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, tc), 1)

    # EVERY live step reduces its chunk to a (P, 1) packed depth|lane
    # key plus a (P, 1) winner slot id — the binned kernel's int-key
    # trick applied to the streaming walk.  Packing strips lane_bits
    # (7 for TC=128) mantissa bits: <= 2^-16 relative depth quantization,
    # far below geometric tolerance.  Versus the (P, TC) per-lane
    # accumulator this replaces (init fill + accumulate RW + a heavy
    # once-per-tile cross-lane finalize), scratch traffic drops ~500x
    # and the finalize becomes a read: 11.74 -> 5.91 ms on a 2048-step
    # walk (tools/micro_steps.py run_packed).  Ties: equal quantized
    # depth resolves to the lowest lane within a step, then the earliest
    # step — deterministic under the fixed emission order.
    @pl.when((fl & 4) != 0)
    def _():
        rows = chunks_ref[0]                    # (8, 6TC) template
        if packed_bits:
            tile = (wt_ref[i] >> 3) & ((1 << packed_bits) - 1)
        else:
            tile = wt_ref[i]
        fx0 = ((tile % num_tx) * tile_w).astype(jnp.float32)
        fy0 = ((tile // num_tx) * tile_h).astype(jnp.float32)
        # translate the local-frame constants to this tile's origin:
        # elementwise FMAs on (1, 6TC) row slices (Mosaic relayouts the
        # sublane offsets for elementwise ops; offset-mismatched
        # CONCATENATION is the unimplemented pattern, so the (2, 6TC)
        # MXU operand ships pre-packed from XLA and the constant row is
        # added AFTER the matmul instead of riding a third operand row)
        dx = fx0 - rows[3:4]                    # (1, 6TC) origin deltas
        dy = fy0 - rows[4:5]
        ct = rows[0:1] * dx + rows[1:2] * dy + rows[2:3]

        # ONE K=6 MXU pass sums the whole pre-split hi/mid/lo cascade in
        # the f32 accumulator (see _bf16_split_rows) — replaces the
        # 3-pass _dot_2pass + two (P, 3TC) adds this kernel used to pay
        # per step (the per-step cost attribution in
        # tools/micro_attrib.py)
        pm = _pm6(p, tile_w)
        out = jnp.dot(pm, chunksb_ref[0][0:6, 0:3 * tc],
                      preferred_element_type=jnp.float32) + ct[:, 0:3 * tc]
        l1 = out[:, 0:tc]
        l2 = out[:, tc:2 * tc]
        z = out[:, 2 * tc:3 * tc]
        ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
              & (l1 + l2 <= 1.0) & (z <= 1.0))
        zm = jnp.where(ok, z, 2.0)
        key = (jax.lax.bitcast_convert_type(zm, jnp.int32) & mask) | lane
        row = jnp.min(key, axis=-1, keepdims=True)          # (P, 1)
        # first step of a tile initializes inline (no separate init pass)
        prev = jnp.where((fl & 1) != 0, jnp.full((p, 1), miss, jnp.int32),
                         best_ref[:, :])
        upd = row < prev
        best_ref[:, :] = jnp.where(upd, row, prev)

        # Winner-payload work runs ONLY on steps where some pixel found
        # a new winner (any(upd) — the key min and compare above are
        # all it takes to know).  Skipped-step scratch is safe: a
        # pixel's payload lanes are garbage only until its first win
        # (and miss pixels are masked at finalize).
        sel_ids = jnp.broadcast_to(rows[5:6, 0:tc], (p, tc))
        if fused:
            @pl.when(jnp.any(upd))
            def _():
                att = jnp.dot(pm, chunksb_ref[0][0:6, 3 * tc:6 * tc],
                              preferred_element_type=jnp.float32) \
                    + ct[:, 3 * tc:6 * tc]
                # winner attribute extraction via the lane carried in
                # the key's low bits: one-hot select-and-sum is EXACT
                # (one nonzero term per pixel), so u = un/den matches
                # the affine evaluation of the winning slot to the
                # last ulp
                sel = lane == (row & ~mask)
                ext = lambda m: jnp.sum(jnp.where(sel, m, 0.0), axis=-1,
                                        keepdims=True)
                un_w = ext(att[:, 0:tc])
                vn_w = ext(att[:, tc:2 * tc])
                dn_w = ext(att[:, 2 * tc:3 * tc])
                tri_w = ext(sel_ids)
                rcp = 1.0 / jnp.where(jnp.abs(dn_w) > 1e-20, dn_w, 1.0)
                u_ref[:, :] = jnp.where(upd, un_w * rcp, u_ref[:, :])
                v_ref[:, :] = jnp.where(upd, vn_w * rcp, v_ref[:, :])
                tri_ref[:, :] = jnp.where(upd, tri_w, tri_ref[:, :])

            @pl.when((fl & 2) != 0)             # last step -> write rows
            def _():
                z1 = jax.lax.bitcast_convert_type(
                    best_ref[:, :] & mask, jnp.float32)
                hit = z1 <= 1.0
                z_row[...] = jnp.where(hit, z1, _BIG).reshape(1, 1, p)
                u_row[...] = jnp.where(
                    hit, u_ref[:, :], 0.0).reshape(1, 1, p)
                v_row[...] = jnp.where(
                    hit, v_ref[:, :], 0.0).reshape(1, 1, p)
                tri_row[...] = jnp.where(
                    hit, tri_ref[:, :].astype(jnp.int32),
                    -1).reshape(1, 1, p)
        else:
            @pl.when(jnp.any(upd))
            def _():
                # winner slot id via the lane carried in the key's
                # low bits
                sel = lane == (row & ~mask)
                sid_row = jnp.sum(jnp.where(sel, sel_ids, 0.0),
                                  axis=-1, keepdims=True)
                sid_ref[:, :] = jnp.where(upd, sid_row, sid_ref[:, :])

            @pl.when((fl & 2) != 0)             # last step -> write rows
            def _():
                z1 = jax.lax.bitcast_convert_type(
                    best_ref[:, :] & mask, jnp.float32)
                hit = z1 <= 1.0
                z_row[...] = jnp.where(hit, z1, _BIG).reshape(1, 1, p)
                slot_row[...] = jnp.where(
                    hit, sid_ref[:, :].astype(jnp.int32),
                    -1).reshape(1, 1, p)


def _tileloop_kernel(wt_ref, st_ref, ns_ref, chunks_hbm, chunksb_hbm,
                     *refs, tile_h: int, tile_w: int, tri_chunk: int,
                     num_tx: int, fused: bool):
    """Tile-loop visibility walk: ONE grid step per tile, with the
    tile's chunk templates streamed through a double-buffered in-kernel
    DMA pipeline (chunks stay HBM-resident; two VMEM slots per operand).

    Rationale (tools/micro_attrib.py + micro_floor): after the K=6 fused
    cascade, ~1.4 us of each (tile, chunk) step is pure grid + block-DMA
    machinery, independent of block size — the work-list form pays it
    once per CHUNK.  Here the grid pays it once per TILE and each
    additional chunk costs only its compute (+ a hidden prefetched DMA):
    dense tiles amortize the floor across their whole list.  Compute per
    chunk is IDENTICAL to _pass1_kernel (same K=6 matmul, tests, packed
    key, extraction), so results are bit-exact with the work-list walk.
    """
    if fused:
        z_row, u_row, v_row, tri_row = refs[:4]
        bufs_f32, bufs_b16, sems, parity_ref = refs[4:]
    else:
        z_row, slot_row = refs[:2]
        bufs_f32, bufs_b16, sems, parity_ref = refs[2:]
    i = pl.program_id(0)
    start = st_ref[i]
    n = ns_ref[i]
    tile = wt_ref[i]
    p = tile_h * tile_w
    tc = tri_chunk
    lane_bits = (tc - 1).bit_length()
    mask = jnp.int32(~((1 << lane_bits) - 1))
    miss = jnp.int32(1073741824)                # f32 2.0 bit pattern
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, tc), 1)
    fx0 = ((tile % num_tx) * tile_w).astype(jnp.float32)
    fy0 = ((tile // num_tx) * tile_h).astype(jnp.float32)
    pm = _pm6(p, tile_w)
    nc = chunks_hbm.shape[0]

    def dma_at(slot, c):
        c = jnp.minimum(c, nc - 1)
        return (pltpu.make_async_copy(chunks_hbm.at[c], bufs_f32.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(chunksb_hbm.at[c], bufs_b16.at[slot],
                                      sems.at[slot, 1]))

    # cross-tile software pipeline: the slot ring and its in-flight DMA
    # persist across grid steps (scratch survives); each tile's FIRST
    # chunk was started by its predecessor (exactly once — only tile
    # i-1 prefetches tile i), so no tile pays an unoverlapped head DMA.
    # Empty tiles (n == 0) touch no DMA and don't advance the ring, but
    # still forward the prefetch chain to their successor.
    @pl.when(i == 0)
    def _():
        parity_ref[0] = 0

        @pl.when(n > 0)
        def _():
            for d in dma_at(0, start):
                d.start()

    base = parity_ref[0]
    n_prog = pl.num_programs(0)

    def body(k, carry):
        slot = jax.lax.rem(base + k, 2)
        nslot = jax.lax.rem(base + k + 1, 2)

        @pl.when(k + 1 < n)
        def _():
            for d in dma_at(nslot, start + k + 1):
                d.start()

        # last chunk of this tile: prefetch the successor's first chunk.
        # The lookahead index is CLAMPED — the operand of ns_ref[...] is
        # evaluated even when the (i + 1 < n_prog) predicate is false, and
        # an unclamped i + 1 on the last grid step reads one element past
        # the scalar-prefetch array (ADVICE r4)
        nxt = jnp.minimum(i + 1, ns_ref.shape[0] - 1)

        @pl.when((k + 1 == n) & (i + 1 < n_prog) & (ns_ref[nxt] > 0))
        def _():
            for d in dma_at(nslot, st_ref[nxt]):
                d.start()
        for d in dma_at(slot, 0):
            d.wait()
        rows = bufs_f32[slot]
        rowsb = bufs_b16[slot]
        dx = fx0 - rows[3:4]
        dy = fy0 - rows[4:5]
        ct = rows[0:1] * dx + rows[1:2] * dy + rows[2:3]
        out = jnp.dot(pm, rowsb[0:6, 0:3 * tc],
                      preferred_element_type=jnp.float32) + ct[:, 0:3 * tc]
        l1 = out[:, 0:tc]
        l2 = out[:, tc:2 * tc]
        z = out[:, 2 * tc:3 * tc]
        ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
              & (l1 + l2 <= 1.0) & (z <= 1.0))
        zm = jnp.where(ok, z, 2.0)
        key = (jax.lax.bitcast_convert_type(zm, jnp.int32) & mask) | lane
        row = jnp.min(key, axis=-1, keepdims=True)
        prev = carry[0]
        upd = row < prev
        best = jnp.where(upd, row, prev)
        sel_ids = jnp.broadcast_to(rows[5:6, 0:tc], (p, tc))
        sel = lane == (row & ~mask)
        ext = lambda m: jnp.sum(jnp.where(sel, m, 0.0), axis=-1,
                                keepdims=True)
        if fused:
            att = jnp.dot(pm, rowsb[0:6, 3 * tc:6 * tc],
                          preferred_element_type=jnp.float32) \
                + ct[:, 3 * tc:6 * tc]
            un_w, vn_w, dn_w = (ext(att[:, 0:tc]), ext(att[:, tc:2 * tc]),
                                ext(att[:, 2 * tc:3 * tc]))
            tri_w = ext(sel_ids)
            rcp = 1.0 / jnp.where(jnp.abs(dn_w) > 1e-20, dn_w, 1.0)
            _, u0, v0, t0 = carry
            return (best, jnp.where(upd, un_w * rcp, u0),
                    jnp.where(upd, vn_w * rcp, v0),
                    jnp.where(upd, tri_w, t0))
        sid = ext(sel_ids)
        return (best, jnp.where(upd, sid, carry[1]))

    # an empty tile forwards the prefetch chain without touching the ring
    # (lookahead clamped for the same reason as in the body)
    nxt_t = jnp.minimum(i + 1, ns_ref.shape[0] - 1)

    @pl.when((n == 0) & (i + 1 < n_prog) & (ns_ref[nxt_t] > 0))
    def _():
        for d in dma_at(base, st_ref[nxt_t]):
            d.start()

    init = (jnp.full((p, 1), miss, jnp.int32),) + (
        (jnp.zeros((p, 1), jnp.float32),) * 3 if fused
        else (jnp.zeros((p, 1), jnp.float32),))
    res = jax.lax.fori_loop(0, n, body, init)

    @pl.when(n > 0)
    def _():
        parity_ref[0] = jax.lax.rem(base + n, 2)

    best = res[0]
    z1 = jax.lax.bitcast_convert_type(best & mask, jnp.float32)
    hit = z1 <= 1.0
    z_row[...] = jnp.where(hit, z1, _BIG).reshape(1, 1, p)
    if fused:
        u_row[...] = jnp.where(hit, res[1], 0.0).reshape(1, 1, p)
        v_row[...] = jnp.where(hit, res[2], 0.0).reshape(1, 1, p)
        tri_row[...] = jnp.where(hit, res[3].astype(jnp.int32),
                                 -1).reshape(1, 1, p)
    else:
        slot_row[...] = jnp.where(hit, res[1].astype(jnp.int32),
                                  -1).reshape(1, 1, p)


# Grouped-singleton classes: tiles whose ENTIRE list fits in W lanes are
# packed G = tc/W per kernel step (origins baked per pair, so a step
# needs no tile identity).  The per-step cost is nearly flat in G
# (2.8-4.5 us measured, tools/micro_grouped.py), so sparse tiles cost
# 0.17-2.3 us each instead of the dense walk's ~2.9 us step floor —
# ~32% of tiles hold <= 8 pairs at every bench scale (tools/
# hist_tiles.py), and at 3k tris the floor IS the kernel time.
_GROUP_WIDTHS = (8, 32, 64)                      # dense class = 3


def _group_classes(tc: int):
    return tuple((w, tc // w) for w in _GROUP_WIDTHS)


def _grouped_kernel(fl_ref, chunks_ref, chunksb_ref, *outs,
                    tile_h: int, tile_w: int, tri_chunk: int,
                    fused: bool):
    """Grouped-singleton visibility step: one (8, nf*TC) template chunk
    holds G tiles' complete lists side by side (class flag = lanes per
    tile W).  Constants arrive FULLY baked (ct already translated to
    each pair's own tile origin), so the compute is one `_dot_2pass`
    matmul + tests; the per-W-block winner is found with a masked-roll
    suffix-min on a packed depth|lane key, broadcast back across the
    block, and extracted per group with one-hot Precision.HIGHEST
    matmuls (exact select-and-sum) — in fused mode including the
    rational attribute fields (un, vn, den).  Stateless: no scratch, no
    first/last flags — every step is its tiles' whole walk."""
    if fused:
        z_out, u_out, v_out, tri_out = outs
    else:
        z_out, slot_out = outs
    i = pl.program_id(0)
    fl = fl_ref[i]
    p = tile_h * tile_w
    tc = tri_chunk
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, tc), 1)
    mask = jnp.int32(~(tc - 1))
    rows = chunks_ref[0]

    # fused K=6 cascade (see _bf16_split_rows / _pass1_kernel)
    out = jnp.dot(_pm6(p, tile_w), chunksb_ref[0][0:6],
                  preferred_element_type=jnp.float32) + rows[2:3]
    l1 = out[:, 0:tc]
    l2 = out[:, tc:2 * tc]
    z = out[:, 2 * tc:3 * tc]
    ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
          & (l1 + l2 <= 1.0) & (z <= 1.0))
    zm = jnp.where(ok, z, 2.0)
    key = (jax.lax.bitcast_convert_type(zm, jnp.int32) & mask) | lane
    trib = jnp.broadcast_to(rows[5:6, 0:tc], (p, tc))

    for ci, (w, g) in enumerate(_group_classes(tc)):
        @pl.when(fl == ci)
        def _(w=w, g=g):
            off = lane & (w - 1)
            # suffix min within W-blocks (offset 0 ends with the block
            # min; ties resolve to the lowest lane via the key's lane
            # bits — same tie rule as the dense walk within one step)
            x = key
            s = 1
            while s < w:
                r = pltpu.roll(x, tc - s, axis=1)     # lane i <- x[i+s]
                x = jnp.where(off < (w - s), jnp.minimum(x, r), x)
                s *= 2
            # broadcast the block min from offset 0 to all offsets
            s = 1
            while s < w:
                r = pltpu.roll(x, s, axis=1)          # lane i <- x[i-s]
                x = jnp.where((off >= s) & (off < 2 * s), r, x)
                s *= 2
            sel = key == x                 # one-hot winner per (pixel, block)
            # one-hot block-indicator extraction on the MXU: HIGHEST is
            # exact for select-and-sum (1.0 * f32 reconstructs all
            # mantissa terms; 0 terms exact), (tc, G) x (P, tc) -> (G, P)
            selg = (jax.lax.broadcasted_iota(jnp.int32, (tc, g), 0) // w
                    == jax.lax.broadcasted_iota(jnp.int32, (tc, g), 1)
                    ).astype(jnp.float32)
            dg = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((0,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            # ONE batched extraction dot: the winner fields stack along
            # the sublane axis ((kP, tc), all offset-0 fresh values) so
            # the select-and-sum runs as a single
            # (tc, G) x (kP, tc) -> (G, kP) matmul instead of k
            # fixed-cost dots
            fields = (zm, out[:, 3 * tc:4 * tc], out[:, 4 * tc:5 * tc],
                      out[:, 5 * tc:6 * tc], trib) if fused \
                else (zm, trib)
            stackm = jnp.concatenate(
                [jnp.where(sel, m, 0.0) for m in fields], axis=0)
            allg = dg(selg, stackm)                     # (G, kP)
            zg = allg[:, 0:p]
            hit = zg <= 1.0
            z_out[0, 0:g, :] = jnp.where(hit, zg, _BIG)
            if fused:
                ung = allg[:, p:2 * p]
                vng = allg[:, 2 * p:3 * p]
                dng = allg[:, 3 * p:4 * p]
                trig = allg[:, 4 * p:5 * p]
                rcp = 1.0 / jnp.where(jnp.abs(dng) > 1e-20, dng, 1.0)
                u_out[0, 0:g, :] = jnp.where(hit, ung * rcp, 0.0)
                v_out[0, 0:g, :] = jnp.where(hit, vng * rcp, 0.0)
                tri_out[0, 0:g, :] = jnp.where(
                    hit, trig.astype(jnp.int32), -1)
            else:
                slot_out[0, 0:g, :] = jnp.where(
                    hit, allg[:, p:2 * p].astype(jnp.int32), -1)


def _pack_grouped(count, starts, stream, *, num_tiles: int, num_tx: int,
                  tile_h: int, tile_w: int, tri_chunk: int,
                  pairs_cap: int, nf: int):
    """Build the grouped-singleton work: class-sort tiles, pack G per
    step, and bake per-pair templates.  All heavy moves are row gathers
    (per-element gathers only at (steps x G) <= ~16k granularity —
    XLA's scalar-gather floor is ~10 cyc/elem, so lane-level (~130k)
    index chains are built by class-static broadcast expansion instead).

    Returns (fl (gcap,), chunks_g (gcap, 8, nf*tc), src_row (T,),
    grouped (T,), n_gsteps) where src_row maps each grouped tile to its
    flat output row (step * MAXG + group)."""
    tc = tri_chunk
    classes = _group_classes(tc)
    n_cls = len(classes)
    maxg = classes[0][1]
    t = num_tiles
    ws = jnp.asarray([w for w, _ in classes], jnp.int32)
    gs_arr = jnp.asarray([g for _, g in classes], jnp.int32)
    cls = jnp.minimum(jnp.searchsorted(ws, count, side="left"), n_cls) \
        .astype(jnp.int32)
    order = jnp.argsort(cls, stable=True).astype(jnp.int32)
    n_per = jnp.bincount(cls, length=n_cls + 1)[:n_cls].astype(jnp.int32)
    offs_cls = jnp.cumsum(n_per) - n_per
    steps_per = (n_per + gs_arr - 1) // gs_arr
    stepoff = jnp.cumsum(steps_per) - steps_per
    n_gsteps = jnp.sum(steps_per)
    # sum ceil(n_c / G_c) <= T / min(G) + one rounding slack per class
    gcap = (t * _GROUP_WIDTHS[-1]) // tc + n_cls + 1

    sidx = jnp.arange(gcap, dtype=jnp.int32)
    c_of_s = jnp.minimum(
        jnp.searchsorted(jnp.cumsum(steps_per), sidx, side="right"),
        n_cls - 1).astype(jnp.int32)
    fl = jnp.where(sidx < n_gsteps, c_of_s, -1)       # -1: no branch runs

    # (step, group) -> tile (16k-granularity; the only per-element
    # gathers in the grouped prep)
    gidx16 = jnp.arange(maxg, dtype=jnp.int32)
    pos16 = (sidx - stepoff[c_of_s])[:, None] * gs_arr[c_of_s][:, None] \
        + gidx16[None, :]
    vt16 = (gidx16[None, :] < gs_arr[c_of_s][:, None]) \
        & (pos16 < n_per[c_of_s][:, None])
    tq16 = jnp.where(
        vt16, order[jnp.clip(offs_cls[c_of_s][:, None] + pos16, 0, t - 1)],
        0)                                             # (gcap, MAXG)
    st16 = jnp.where(vt16, starts[tq16], pairs_cap - 1)
    ct16 = jnp.where(vt16, count[tq16], 0)
    fx16 = (tq16 % num_tx).astype(jnp.float32) * tile_w
    fy16 = (tq16 // num_tx).astype(jnp.float32) * tile_h

    def expand(a16, fill_val):
        """(gcap, MAXG) group field -> (gcap, tc) lane field by class-
        static broadcast (repeat each group W times), no gathers."""
        outv = jnp.full((gcap, tc), fill_val, a16.dtype)
        for ci, (w, g) in enumerate(classes):
            rep = jnp.broadcast_to(a16[:, :g, None], (gcap, g, w)) \
                .reshape(gcap, g * w)
            outv = jnp.where((c_of_s == ci)[:, None], rep, outv)
        return outv

    lane = jnp.arange(tc, dtype=jnp.int32)[None, :]
    w_lane = expand(jnp.broadcast_to(ws[c_of_s][:, None],
                                     (gcap, maxg)), 1)
    kq = lane % jnp.maximum(w_lane, 1)
    live = kq < expand(ct16, 0)
    pq = jnp.clip(expand(st16, pairs_cap - 1) + kq, 0, pairs_cap - 1)

    from vri_tpu.ops.rowgather import gather_rows
    raw = gather_rows(stream, pq.reshape(-1))
    sgf = lambda k: raw(k).reshape(gcap, tc)
    fx0q = expand(fx16, 0.0)
    fy0q = expand(fy16, 0.0)
    dxq = fx0q - sgf(3 * nf)
    dyq = fy0q - sgf(3 * nf + 1)
    a_idx = tuple(range(0, 3 * nf, 3))
    row_a = jnp.concatenate(
        [jnp.where(live, sgf(j), 0.0) for j in a_idx], axis=-1)
    row_b = jnp.concatenate(
        [jnp.where(live, sgf(j + 1), 0.0) for j in a_idx], axis=-1)
    # ASSOCIATION matters: (a*dx + b*dy) + c matches the dense kernel's
    # in-kernel translation bit-for-bit, so grouped/dense edge tests
    # agree to the last ulp; dead lanes pin z = 10 (fails z <= 1) and
    # den = 1 (no spurious divide in the extraction)
    cts = [sgf(j) * dxq + sgf(j + 1) * dyq + sgf(j + 2) for j in a_idx]
    dead_ct = (0.0, 0.0, 10.0, 0.0, 0.0, 1.0)[:nf]
    row_c = jnp.concatenate(
        [jnp.where(live, c, dv) for c, dv in zip(cts, dead_ct)], axis=-1)
    row_t = jnp.tile(sgf(3 * nf + 2), (1, nf))
    zrow = jnp.zeros_like(row_a)
    chunks_g = jnp.stack(
        [row_a, row_b, row_c, zrow, zrow, row_t, zrow, zrow],
        axis=1)                                        # (gcap, 8, nf*tc)

    # tile -> flat grouped output row (step * MAXG + group)
    inv_pos = jnp.zeros((t,), jnp.int32).at[order].set(
        jnp.arange(t, dtype=jnp.int32))
    cc = jnp.minimum(cls, n_cls - 1)
    r_in = inv_pos - offs_cls[cc]
    src_row = (stepoff[cc] + r_in // gs_arr[cc]) * maxg \
        + r_in % gs_arr[cc]
    return fl, chunks_g, src_row, cls < n_cls, n_gsteps


def _worklist_to_frame(wt, wchunk, flags, chunks, overflowed, *,
                       total_work, height, width, hp, wp, grid, tile_h,
                       tile_w, tri_chunk, interpret, fused,
                       resolve_args=None, grouped_args=None,
                       tileloop_args=None):
    """Back half of the sorted path: the single work-list visibility
    walk, then one of two resolves (static ``fused``).  FUSED: the
    kernels hand back final (z, u, v, tri) planes, so no per-pixel
    attribute gather runs at all (the 16-field row gather + layout copy
    it replaces measured 5.4 ms/frame at 1080p — the win at small slot
    counts).  GATHER: the kernels hand back (z, slot) and the shared
    XLA row-gather resolve (`_resolve_frame`, ``resolve_args``)
    recovers attributes — cheaper at large slot counts where the
    fused template's 2x step width taxes the long walk.

    The grid is DYNAMIC — sized by the frame's actual work-item count
    (every tile contributes >= 1 item so all output rows are written);
    the static capacity ``wt.shape[0]`` would walk 3-7x more steps than
    are live (dead steps still pay grid + block-fetch overhead: the
    static-grid form measured 18 ms vs ~5 ms at 49k tris / 1080p)."""
    num_tiles = grid[0] * grid[1]
    p = tile_h * tile_w
    tc = tri_chunk
    nf = 6 if fused else 3
    n_out = 4 if fused else 2
    n_work = total_work if not interpret else int(wt.shape[0])

    chunksb = _bf16_split_rows(chunks)
    row_spec = pl.BlockSpec((1, 1, p), lambda i, wt_r, wc_r, fl_r:
                            (wt_r[i], 0, 0), memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.float32)]
                  * (n_out - 1)
                  + [jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.int32)])
    if tileloop_args is not None:
        tl_pos, st_tl, ns_tl, n_live = tileloop_args
        grid_tl = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_live,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[row_spec] * n_out,
            scratch_shapes=[
                pltpu.VMEM((2, 8, nf * tc), jnp.float32),
                pltpu.VMEM((2, 8, nf * tc), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        )
        outs = pl.pallas_call(
            functools.partial(_tileloop_kernel, tile_h=tile_h,
                              tile_w=tile_w, tri_chunk=tc,
                              num_tx=grid[1], fused=fused),
            grid_spec=grid_tl,
            out_shape=out_shapes,
        )(tl_pos, st_tl, ns_tl, chunks, chunksb)
    else:
        f32_scratch = 3 if fused else 1
        scratch = [pltpu.VMEM((p, 1), jnp.int32)] \
            + [pltpu.VMEM((p, 1), jnp.float32)] * f32_scratch
        num_chunks = chunks.shape[0]
        tb = max(num_tiles - 1, 1).bit_length()
        cb_w = max(num_chunks - 1, 1).bit_length()
        if 3 + tb + cb_w <= 31 and not interpret:
            # ONE packed scalar-prefetch word per step ([chunk|tile|fl]):
            # the 3-array form needs 3 x 4B x wcap of SMEM and blew the
            # 1 MB budget at city-scale pair streams (wcap ~97k)
            pk = (wchunk << (3 + tb)) | (wt << 3) | flags
            row_spec_p = pl.BlockSpec(
                (1, 1, p),
                lambda i, pk_r: ((pk_r[i] >> 3) & ((1 << tb) - 1), 0, 0),
                memory_space=pltpu.VMEM)
            chunk_spec_p = pl.BlockSpec(
                (1, 8, nf * tc),
                lambda i, pk_r: (pk_r[i] >> (3 + tb), 0, 0),
                memory_space=pltpu.VMEM)
            grid1 = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_work,),
                in_specs=[chunk_spec_p, chunk_spec_p],
                out_specs=[row_spec_p] * n_out,
                scratch_shapes=scratch,
            )
            def kernel_packed(pk_r, c_r, cb_r, *rs):
                return _pass1_kernel(
                    pk_r, None, None, c_r, cb_r, *rs, tile_h=tile_h,
                    tile_w=tile_w, tri_chunk=tc, num_tx=grid[1],
                    fused=fused, packed_bits=tb)

            outs = pl.pallas_call(
                kernel_packed,
                grid_spec=grid1,
                out_shape=out_shapes,
            )(pk, chunks, chunksb)
        else:
            chunk_spec = pl.BlockSpec((1, 8, nf * tc),
                                      lambda i, wt_r, wc_r, fl_r:
                                      (wc_r[i], 0, 0),
                                      memory_space=pltpu.VMEM)
            grid1 = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_work,),
                in_specs=[chunk_spec, chunk_spec],
                out_specs=[row_spec] * n_out,
                scratch_shapes=scratch,
            )
            kernel1 = functools.partial(
                _pass1_kernel, tile_h=tile_h, tile_w=tile_w, tri_chunk=tc,
                num_tx=grid[1], fused=fused)
            outs = pl.pallas_call(
                kernel1,
                grid_spec=grid1,
                out_shape=out_shapes,
                interpret=interpret,
            )(wt, wchunk, flags, chunks, chunksb)
    outs = [o[:, 0] for o in outs]                       # each (T, p)

    if grouped_args is not None:
        fl_g, chunks_g, src_row, grouped_tile, n_gsteps = grouped_args
        gcap = chunks_g.shape[0]
        maxg = tc // _GROUP_WIDTHS[0]
        ng = n_gsteps if not interpret else gcap
        grow_spec = pl.BlockSpec((1, maxg, p),
                                 lambda i, fl_r: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        gchunk_spec = pl.BlockSpec((1, 8, nf * tc),
                                   lambda i, fl_r: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        chunksb_g = _bf16_split_rows(chunks_g)
        gspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ng,),
            in_specs=[gchunk_spec, gchunk_spec], out_specs=[grow_spec] * n_out)
        gouts = pl.pallas_call(
            functools.partial(_grouped_kernel, tile_h=tile_h,
                              tile_w=tile_w, tri_chunk=tc, fused=fused),
            grid_spec=gspec,
            out_shape=[jax.ShapeDtypeStruct((gcap, maxg, p), jnp.float32)]
            * (n_out - 1)
            + [jax.ShapeDtypeStruct((gcap, maxg, p), jnp.int32)],
            interpret=interpret,
        )(fl_g, chunks_g, chunksb_g)
        gt = grouped_tile[:, None]
        outs = [jnp.where(gt, gr.reshape(gcap * maxg, p)[src_row], dr)
                for gr, dr in zip(gouts, outs)]

    def to_plane(a):
        return a.reshape(grid[0], grid[1], tile_h, tile_w) \
            .transpose(0, 2, 1, 3).reshape(hp, wp)

    if fused:
        z_rows, u_rows, v_rows, tri_rows = outs
        clipped = lambda a: to_plane(a)[:height, :width]
        z = clipped(z_rows)
        tri = clipped(tri_rows)
        hit_mask = tri >= 0
        hit = HitRecord(
            t=jnp.where(hit_mask, z, _BIG).reshape(-1),
            tri=tri.reshape(-1),
            u=clipped(u_rows).reshape(-1),
            v=clipped(v_rows).reshape(-1),
            overflow=jnp.sum(overflowed.astype(jnp.int32)))
        return hit, jnp.where(hit_mask, z, _BIG)

    z_rows, slot_rows = outs
    tx, ty, tw, b1, b2, src_sorted = resolve_args
    return _resolve_frame(to_plane(z_rows), to_plane(slot_rows),
                          tx, ty, tw, b1, b2, src_sorted, overflowed,
                          height=height, width=width)
