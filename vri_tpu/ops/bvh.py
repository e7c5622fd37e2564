"""LBVH: Morton-ordered bounding volume hierarchy, built and traversed as
JAX programs.

The reference has no ray tracer for primary visibility (it rasterizes;
Brixelizer handles rays against an SDF).  The TPU build's north star
(BASELINE.json) makes ray-scene intersection a first-class op, so this module
supplies the acceleration structure:

  * 30-bit Morton codes over triangle centroids (vectorized bit interleave)
  * triangles sorted by code, grouped into fixed-size leaves
  * an *implicit* complete binary tree over the sorted order (heap layout,
    node 0 = root, children 2i+1 / 2i+2, leaves are contiguous ranges) —
    a TPU-friendly LBVH variant: the build is log2(L) levels of pairwise
    AABB unions with zero dynamic allocation, and traversal needs no child
    pointers.  Compared to a Karras radix-tree LBVH the topology is fixed,
    which XLA strongly prefers (static shapes, no data-dependent tree).

Traversal is a vectorized stack-based wavefront: every ray advances one node
per iteration of a ``lax.while_loop``; AABB rejection against the current
best-t prunes.  All state is fixed-shape; rays are processed in bounded
batches by the caller.

**Role: correctness oracle, not a production path.**  Measured on TPU the
XLA traversal runs ~0.01 Mrays/s (per-ray divergent control flow is the
worst case for lock-step SIMD) — the production tiers are the Pallas
raster for primary visibility and the SDF march kernel for
secondary/occlusion rays.  The BVH's job is exact-intersection ground
truth in tests at sizes where ``trace_brute``'s O(F) per ray is too slow,
and AABB queries for host-side tooling.  ``backend="bvh"`` remains wired
for that purpose only.
"""

from __future__ import annotations

import functools
import flax.struct
import jax
import jax.numpy as jnp

from vri_tpu.ops.intersect import INF, HitRecord, moller_trumbore

NEG_INF = jnp.float32(-3.0e38)


# ---------------------------------------------------------------------------
# Morton codes
# ---------------------------------------------------------------------------

def _expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zeros between each bit."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(points01: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points in [0,1] -> (N,) uint32 30-bit Morton codes."""
    q = jnp.clip(points01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (_expand_bits_10(q[:, 0]) << 2 | _expand_bits_10(q[:, 1]) << 1
            | _expand_bits_10(q[:, 2]))


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class BVH:
    order: jnp.ndarray      # (Fp,) i32 — triangle ids sorted by Morton code
    node_lo: jnp.ndarray    # (2L-1, 3) f32
    node_hi: jnp.ndarray    # (2L-1, 3) f32
    # packed per-slot triangle data in sorted order (gather once at build):
    v0: jnp.ndarray         # (Fp, 3)
    e1: jnp.ndarray         # (Fp, 3)
    e2: jnp.ndarray         # (Fp, 3)
    slot_valid: jnp.ndarray  # (Fp,) bool
    leaf_size: int = flax.struct.field(pytree_node=False, default=8)
    num_leaves: int = flax.struct.field(pytree_node=False, default=1)


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def build_bvh(world_verts: jnp.ndarray, tri_vertices: jnp.ndarray,
              num_faces: jnp.ndarray, leaf_size: int = 8) -> BVH:
    """Build the Morton-ordered implicit BVH.  Shapes depend only on the
    padded triangle count, so rebuilds (after animation) hit the jit cache."""
    F = tri_vertices.shape[0]
    p = world_verts[tri_vertices]               # (F, 3, 3)
    valid = jnp.arange(F) < num_faces

    lo = jnp.where(valid[:, None], p.min(axis=1), INF)
    hi = jnp.where(valid[:, None], p.max(axis=1), NEG_INF)
    centroid = (p.min(axis=1) + p.max(axis=1)) * 0.5

    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-8)
    codes = morton3d((centroid - scene_lo) / extent)
    # invalid triangles sort to the end
    codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes).astype(jnp.int32)

    L = _next_pow2(max((F + leaf_size - 1) // leaf_size, 1))
    Fp = L * leaf_size
    pad = Fp - F
    order_p = jnp.concatenate(
        [order, jnp.zeros((pad,), jnp.int32)]) if pad else order
    slot_valid = jnp.concatenate(
        [valid[order], jnp.zeros((pad,), bool)]) if pad else valid[order]

    tri_p = p[order_p]                          # (Fp, 3, 3)
    v0 = tri_p[:, 0]
    e1 = tri_p[:, 1] - v0
    e2 = tri_p[:, 2] - v0

    slot_lo = jnp.where(slot_valid[:, None], tri_p.min(axis=1), INF)
    slot_hi = jnp.where(slot_valid[:, None], tri_p.max(axis=1), NEG_INF)
    leaf_lo = slot_lo.reshape(L, leaf_size, 3).min(axis=1)
    leaf_hi = slot_hi.reshape(L, leaf_size, 3).max(axis=1)

    # heap layout: levels from leaves up
    los = [leaf_lo]
    his = [leaf_hi]
    while los[-1].shape[0] > 1:
        a, b = los[-1][0::2], los[-1][1::2]
        los.append(jnp.minimum(a, b))
        a, b = his[-1][0::2], his[-1][1::2]
        his.append(jnp.maximum(a, b))
    node_lo = jnp.concatenate(los[::-1], axis=0)   # root first
    node_hi = jnp.concatenate(his[::-1], axis=0)

    return BVH(order=order_p, node_lo=node_lo, node_hi=node_hi,
               v0=v0, e1=e1, e2=e2, slot_valid=slot_valid,
               leaf_size=leaf_size, num_leaves=L)


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

def _ray_aabb(o, inv_d, lo, hi, t_best):
    """Slab test; returns (hits, t_near)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_best)
    return hit, tmin


@functools.partial(jax.jit, static_argnames=("stack_depth",))
def traverse(bvh: BVH, origins: jnp.ndarray, dirs: jnp.ndarray,
             t_max=INF, stack_depth: int = 64) -> HitRecord:
    """Nearest-hit traversal for a batch of rays.

    origins, dirs: (N, 3).  Returns HitRecord with *global* triangle ids.
    """
    n = origins.shape[0]
    L = bvh.num_leaves
    K = bvh.leaf_size
    first_leaf = L - 1

    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                            jnp.where(dirs < 0, -1e-12, 1e-12), dirs)

    stack = jnp.zeros((n, stack_depth), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)              # root pushed
    best = HitRecord(t=t_max, tri=jnp.full((n,), -1, jnp.int32),
                     u=jnp.zeros((n,), jnp.float32),
                     v=jnp.zeros((n,), jnp.float32))

    rows = jnp.arange(n)

    def cond(state):
        sp, _, _ = state
        return jnp.any(sp > 0)

    def body(state):
        sp, stack, best = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = stack[rows, top]
        sp = jnp.where(active, sp - 1, sp)

        hit_node, _ = _ray_aabb(origins, inv_d, bvh.node_lo[node],
                                bvh.node_hi[node], best.t)
        hit_node = hit_node & active
        is_leaf = node >= first_leaf

        # --- leaf: intersect K triangle slots --------------------------
        leaf = jnp.maximum(node - first_leaf, 0)
        slot0 = leaf * K
        slots = slot0[:, None] + jnp.arange(K)[None, :]          # (N, K)
        v0 = bvh.v0[slots]
        e1 = bvh.e1[slots]
        e2 = bvh.e2[slots]
        t, u, v, hit_tri = moller_trumbore(
            origins[:, None, :], dirs[:, None, :], v0, e1, e2,
            t_max=best.t[:, None])
        hit_tri = hit_tri & bvh.slot_valid[slots] & \
            (hit_node & is_leaf)[:, None]
        t = jnp.where(hit_tri, t, INF)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
        closer = tk < best.t
        take = lambda a: jnp.take_along_axis(a, k[:, None], -1)[:, 0]
        tri_id = bvh.order[slots[rows, k]]
        best = HitRecord(
            t=jnp.where(closer, tk, best.t),
            tri=jnp.where(closer, tri_id, best.tri),
            u=jnp.where(closer, take(u), best.u),
            v=jnp.where(closer, take(v), best.v))

        # --- internal: test children, push near-far ordered -------------
        c0 = 2 * node + 1
        c1 = 2 * node + 2
        push = hit_node & ~is_leaf
        h0, t0 = _ray_aabb(origins, inv_d, bvh.node_lo[c0], bvh.node_hi[c0],
                           best.t)
        h1, t1 = _ray_aabb(origins, inv_d, bvh.node_lo[c1], bvh.node_hi[c1],
                           best.t)
        h0, h1 = h0 & push, h1 & push
        # far child first so the near child pops first
        swap = t1 < t0
        first = jnp.where(swap, c1, c0)
        fh = jnp.where(swap, h1, h0)
        second = jnp.where(swap, c0, c1)
        sh = jnp.where(swap, h0, h1)
        for child, h in ((second, sh), (first, fh)):
            idx = jnp.minimum(sp, stack_depth - 1)
            newcol = jnp.where(h, child, stack[rows, idx])
            stack = stack.at[rows, idx].set(newcol)
            sp = jnp.where(h, sp + 1, sp)
        return sp, stack, best

    _, _, best = jax.lax.while_loop(cond, body, (sp, stack, best))
    return best


def trace_batched(bvh: BVH, origins: jnp.ndarray, dirs: jnp.ndarray,
                  t_max=INF, batch: int = 1 << 16,
                  stack_depth: int = 64) -> HitRecord:
    """Traverse in bounded ray batches (stack memory = batch * depth)."""
    n = origins.shape[0]
    if n <= batch:
        return traverse(bvh, origins, dirs, t_max, stack_depth)
    pad = (-n) % batch
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tm = jnp.concatenate([tm, jnp.zeros((pad,), jnp.float32)])
    nb = (n + pad) // batch

    def body(_, xs):
        ob, db, tb = xs
        return None, traverse(bvh, ob, db, tb, stack_depth)

    _, rec = jax.lax.scan(
        body, None,
        (o.reshape(nb, batch, 3), d.reshape(nb, batch, 3),
         tm.reshape(nb, batch)))
    flat = jax.tree_util.tree_map(lambda a: a.reshape(nb * batch, *a.shape[2:]),
                                  rec)
    return jax.tree_util.tree_map(lambda a: a[:n], flat)
