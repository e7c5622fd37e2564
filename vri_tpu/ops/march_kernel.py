"""Pallas sphere-march kernel — the SDF traversal hot path.

TPU re-design of Brixelizer's ray traversal
(External/FidelityFX/include/FidelityFX/gpu/brixelizer/
ffx_brixelizer_trace_ops.h:98-285).  The reference walks a two-level AABB
tree with a per-cascade DDA and sphere-marches <=8 steps inside each brick;
the XLA formulation of that (ops/sdf_trace.py) is gather-bound: every march
step pays XLA's ~10 cycles/element dynamic-gather floor for the brick-map
and atlas fetches, which made GI ~60x off the frame budget in round 1.

This kernel removes the gather floor by re-shaping the *data* around the
TPU's one fast dynamic-access primitive — the per-lane lane-shuffle
(`take_along_axis` on an (8,128) vreg, ~2.5 cycles per masked 128-entry row,
measured).  Instead of the (N, R^3) brick map + (bricks, 8^3) atlas, the
kernel marches:

  * a per-cascade 16^3 **coarse cell grid** (cell = (R/16)^3 voxels) of u8
    chebyshev distances in cell units — the whole clipmap's skip structure
    is N*8 rows of 128 i32 (u8 x4 packed), gathered every step by a
    statically unrolled masked-row loop (~2.5 cyc/row);
  * per-cell **surface-voxel bit words** (s^3 bits, s = R/16): gathered once
    on cell entry (gated behind a block-level `lax.cond`), after which the
    in-cell DDA tests voxel bits with pure register arithmetic — zero
    further memory traffic until the ray leaves the cell.

Hit precision is one voxel (the bit marks voxels whose brick SDF dips below
~1.5 texels): the approximate tier used for occlusion/shadow and GI-gather
rays, where the existing XLA trilinear march (`sdf_trace.march`) remains the
quality path for primary/debug rays.  Payload mirrors FfxBrixelizerHitRaw
{t, brick_id, uvw, iter_count} (trace_ops.h:54-59); the brick id is
recovered with one XLA gather from the hit voxel.

Rays are processed in (8, 128) = 1024-lane blocks, one block per Pallas grid
step, all lanes lock-step in a single `while_loop` with per-lane active
masks — the TPU's wavefront.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vri_tpu.config import SDFConfig
from vri_tpu.ops.sdf import SDFCascades, cascade_origin
from vri_tpu.ops.sdf_trace import BIG, SDFHit

_SHAPE = (8, 128)


def supports(config: SDFConfig) -> bool:
    r = config.cascade_resolution
    return r % 16 == 0 and r // 16 in (1, 2, 4)


def _gather_u4(tab, flat):
    """flat (8,128) i32 in [0, rows*1024) -> u4 value per lane.

    4-bit packing (8 cells per i32 word) halves the masked-row loop vs
    the u8 layout — this gather runs EVERY march step, so its row count
    is the kernel's dominant per-step memory cost."""
    rows = tab.shape[0]
    row = flat >> 10
    col = (flat >> 3) & 127
    nib = flat & 7
    val = jnp.zeros(_SHAPE, jnp.int32)
    for rr in range(rows):
        g = jnp.take_along_axis(jnp.broadcast_to(tab[rr:rr + 1], _SHAPE),
                                col, axis=1)
        val = jnp.where(row == rr, g, val)
    return (val >> (nib * 4)) & 15


def _gather_i32(tab, flat):
    """flat (8,128) i32 in [0, rows*128) -> i32 value per lane."""
    rows = tab.shape[0]
    row = flat >> 7
    col = flat & 127
    val = jnp.zeros(_SHAPE, jnp.int32)
    for rr in range(rows):
        g = jnp.take_along_axis(jnp.broadcast_to(tab[rr:rr + 1], _SHAPE),
                                col, axis=1)
        val = jnp.where(row == rr, g, val)
    return val


_RAYF = ("ox", "oy", "oz", "dx", "dy", "dz", "t0", "tmax", "tent", "tgrace")


def _load_consts(meta_ref, n_cas):
    """Per-cascade scalars from SMEM: voxel size + grid origin."""
    vs = [meta_ref[0, i] for i in range(n_cas)]
    return dict(
        vs=vs,
        ogx=[meta_ref[0, 16 + i] for i in range(n_cas)],
        ogy=[meta_ref[0, 32 + i] for i in range(n_cas)],
        ogz=[meta_ref[0, 48 + i] for i in range(n_cas)],
        inv_vs=[1.0 / v for v in vs],
        vs_coarse=vs[-1],
    )


def _march_step(rays, c, marched, coarse, f0, f1, k, *, n_cas: int, r: int,
                s: int):
    """One lock-step march step over (8,128) lanes.

    ``rays``: dict of the 10 per-ray fields (_RAYF).  ``c``: march state
    dict (t, act, hv, w0, w1, cell, it).  ``marched``: bool mask of lanes
    taking a step (callers apply budget/activity policy).  Pure function —
    shared verbatim by the block kernel and the streaming kernel so their
    per-ray trajectories are bit-identical.
    """
    ox, oy, oz = rays["ox"], rays["oy"], rays["oz"]
    dx, dy, dz = rays["dx"], rays["dy"], rays["dz"]
    tmax, tent, tgrace = rays["tmax"], rays["tent"], rays["tgrace"]
    vs, inv_vs = k["vs"], k["inv_vs"]
    ogx, ogy, ogz = k["ogx"], k["ogy"], k["ogz"]
    vs_coarse = k["vs_coarse"]
    log2s = {1: 0, 2: 1, 4: 2}[s]
    rf = jnp.float32(r)

    act_in = marched
    t = c["t"]
    px = ox + dx * t
    py = oy + dy * t
    pz = oz + dz * t
    # finest containing cascade (unrolled; finest checked last -> wins)
    cas = jnp.full(_SHAPE, n_cas, jnp.int32)
    lx = jnp.zeros(_SHAPE, jnp.float32)
    ly = jnp.zeros(_SHAPE, jnp.float32)
    lz = jnp.zeros(_SHAPE, jnp.float32)
    vsl = jnp.full(_SHAPE, vs_coarse, jnp.float32)
    for i in reversed(range(n_cas)):
        lxi = (px - ogx[i]) * inv_vs[i]
        lyi = (py - ogy[i]) * inv_vs[i]
        lzi = (pz - ogz[i]) * inv_vs[i]
        ins = ((lxi >= 0) & (lxi < rf) & (lyi >= 0) & (lyi < rf)
               & (lzi >= 0) & (lzi < rf))
        cas = jnp.where(ins, i, cas)
        lx = jnp.where(ins, lxi, lx)
        ly = jnp.where(ins, lyi, ly)
        lz = jnp.where(ins, lzi, lz)
        vsl = jnp.where(ins, vs[i], vsl)
    inside = cas < n_cas
    cas_c = jnp.minimum(cas, n_cas - 1)
    vx = jnp.clip(lx.astype(jnp.int32), 0, r - 1)
    vy = jnp.clip(ly.astype(jnp.int32), 0, r - 1)
    vz = jnp.clip(lz.astype(jnp.int32), 0, r - 1)
    ccx = vx >> log2s
    ccy = vy >> log2s
    ccz = vz >> log2s
    cflat = cas_c * 4096 + (ccz * 16 + ccy) * 16 + ccx
    cd = _gather_u4(coarse, cflat)
    near = inside & (cd == 0)

    # fine-bit words: fetched once per cell entry, block-gated
    need = act_in & near & (cflat != c["cell"])
    any_need = jnp.any(need)

    def fetch(args):
        w0, w1, cell = args
        nw0 = _gather_i32(f0, cflat)
        nw1 = _gather_i32(f1, cflat) if s ** 3 > 32 else nw0
        return (jnp.where(need, nw0, w0), jnp.where(need, nw1, w1),
                jnp.where(need, cflat, cell))

    w0, w1, cell = jax.lax.cond(
        any_need, fetch, lambda a: a, (c["w0"], c["w1"], c["cell"]))

    bx = vx & (s - 1)
    by = vy & (s - 1)
    bz = vz & (s - 1)
    bit = (bz * s + by) * s + bx
    word = jnp.where(bit < 32, w0, w1) if s ** 3 > 32 else w0
    occ_bit = (word >> (bit & 31)) & 1
    # tgrace: self-intersection grace — voxel-precision hits within a
    # couple of voxels of the ray start would be the ray's own surface
    hit_now = act_in & near & (occ_bit > 0) & (t >= tgrace)

    # distances (world units along the ray) to the voxel / cell exits
    def exit_t(lo_x, lo_y, lo_z, width):
        out = jnp.full(_SHAPE, BIG, jnp.float32)
        for d_ax, l_ax, lo_ax in ((dx, lx, lo_x), (dy, ly, lo_y),
                                  (dz, lz, lo_z)):
            tgt = jnp.where(d_ax > 0, lo_ax + width, lo_ax)
            safe = jnp.where(jnp.abs(d_ax) < 1e-9, 1e-9,
                             jnp.abs(d_ax))
            t_ax = jnp.abs(tgt - l_ax) * vsl / safe
            t_ax = jnp.where(jnp.abs(d_ax) < 1e-9, BIG, t_ax)
            out = jnp.minimum(out, t_ax)
        return jnp.maximum(out, 0.0)

    vox_exit = exit_t(vx.astype(jnp.float32), vy.astype(jnp.float32),
                      vz.astype(jnp.float32), 1.0)
    sw = jnp.float32(s)
    cell_exit = exit_t((ccx << log2s).astype(jnp.float32),
                       (ccy << log2s).astype(jnp.float32),
                       (ccz << log2s).astype(jnp.float32), sw)
    cell_w = vsl * sw
    # chebyshev skip: no surface cell within (cd-1) cells of this cell
    skip = jnp.maximum(cell_exit, (cd.astype(jnp.float32) - 1.0)
                       * cell_w) + 0.05 * vsl
    adv = jnp.where(near, vox_exit + 0.01 * vsl, skip)
    adv = jnp.where(inside, adv, vs_coarse)
    escaped = act_in & ~inside & (t > tent + 1e-3)

    new_t = t + adv
    over = new_t >= tmax
    act = (c["act"] > 0) & ~(act_in & (hit_now | over | escaped))
    hv = jnp.where(hit_now, cas_c * (r * r * r) + (vz * r + vy) * r + vx,
                   c["hv"])
    t_next = jnp.where(act_in & ~hit_now, new_t, t)
    return dict(t=t_next, act=act.astype(jnp.int32), hv=hv, w0=w0,
                w1=w1, cell=cell,
                it=c["it"] + act_in.astype(jnp.int32))


def _march_block_kernel(meta_ref, coarse_ref, f0_ref, f1_ref, ray_ref,
                        t_out, hv_out, it_out, act_out, *, n_cas: int,
                        r: int, s: int, max_steps: int):
    """Lock-step block kernel: one (8,128) ray block per grid step, all
    lanes in a single while_loop — pays the block's SLOWEST lane every
    step (see _march_stream_kernel for the divergence-immune variant)."""
    fld = lambda i: ray_ref[0, i]
    rays = {name: fld(i) for i, name in enumerate(_RAYF)}
    coarse = coarse_ref[:]
    f0 = f0_ref[:]
    f1 = f1_ref[:]
    k = _load_consts(meta_ref, n_cas)

    def cond(c):
        return jnp.any(c["act"] > 0) & (c["step"] < max_steps)

    def body(c):
        st = {kk: c[kk] for kk in ("t", "act", "hv", "w0", "w1", "cell",
                                   "it")}
        st = _march_step(rays, st, c["act"] > 0, coarse, f0, f1, k,
                         n_cas=n_cas, r=r, s=s)
        st["step"] = c["step"] + 1
        return st

    init = dict(t=rays["t0"],
                act=(rays["t0"] < rays["tmax"]).astype(jnp.int32),
                hv=jnp.full(_SHAPE, -1, jnp.int32),
                w0=jnp.zeros(_SHAPE, jnp.int32),
                w1=jnp.zeros(_SHAPE, jnp.int32),
                cell=jnp.full(_SHAPE, -1, jnp.int32),
                it=jnp.zeros(_SHAPE, jnp.int32), step=jnp.int32(0))
    c = jax.lax.while_loop(cond, body, init)
    t_out[0] = c["t"]
    hv_out[0] = c["hv"]
    it_out[0] = c["it"]
    act_out[0] = c["act"]   # budget-exhausted rays: resumable (march_compact)


def _march_stream_kernel(meta_ref, coarse_ref, f0_ref, f1_ref, ray_ref,
                         t_out, hv_out, it_out, act_out, *, n_cas: int,
                         r: int, s: int, max_steps: int, q: int,
                         srv: int):
    """Persistent-lane streaming march — divergence-immune wavefront.

    The lock-step block kernel pays each (8,128) block's SLOWEST lane
    every step: on the production GI ray set the per-block max averages
    ~3.5x the mean iteration count, and reordering rays cannot fix it
    (direction-octant sort recovers 8%; only the unknowable per-ray step
    count sorts well — tools/probe_march_order.py).  This kernel makes
    each lane a persistent worker with its own queue of ``q`` rays
    (ray i of slot j lives at flat index j*1024 + lane): every ``srv``
    steps a SERVICE point retires finished lanes (recording their
    outputs through a q-masked select) and refills them from their queue
    in-register — no extra pallas dispatches, no host-side compaction.
    Total block-steps approach sum(it)/1024 (the reordering oracle)
    instead of sum-of-block-maxima.

    Bit-exact vs the block kernel: _march_step is shared, a ray's
    trajectory depends only on its own fields, the per-ray step budget
    is enforced identically, and the cell-word cache resets on refill.
    Equivalent of the reference's indirect-dispatch ray continuation
    (ffx_brixelizer wavefront passes) re-shaped for lock-step vectors.
    """
    rays0 = {name: ray_ref[0, i] for i, name in enumerate(_RAYF)}
    coarse = coarse_ref[:]
    f0 = f0_ref[:]
    f1 = f1_ref[:]
    k = _load_consts(meta_ref, n_cas)
    qshape = (q, 8, 128)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, qshape, 0)

    def service(c):
        """Retire finished lanes into the (q,8,128) outputs; refill from
        each lane's queue.  A lane is 'finished' when its ray stopped
        (act==0) or exhausted the per-ray budget (it >= max_steps)."""
        fin = ((c["act"] == 0) | (c["it"] >= max_steps)) & (c["done"] == 0)
        # --- record: one q-masked select per output -------------------
        selq = (q_iota == c["qi"][None]) & fin[None]
        bcast = lambda a: jnp.broadcast_to(a[None], qshape)
        out_t = jnp.where(selq, bcast(c["t"]), c["out_t"])
        out_hv = jnp.where(selq, bcast(c["hv"]), c["out_hv"])
        out_it = jnp.where(selq, bcast(c["it"]), c["out_it"])
        out_act = jnp.where(selq, bcast(c["act"]), c["out_act"])
        # --- advance + refill -----------------------------------------
        qi = jnp.where(fin, c["qi"] + 1, c["qi"])
        refill = fin & (qi < q)
        done = jnp.where(fin & (qi >= q), 1, c["done"])
        new = {name: c[name] for name in _RAYF}
        for j in range(1, q):   # slot 0 is loaded at init
            sel = refill & (qi == j)
            for i, name in enumerate(_RAYF):
                new[name] = jnp.where(sel, ray_ref[0, j * 10 + i],
                                      new[name])
        out = dict(new)
        out.update(
            t=jnp.where(refill, new["t0"], c["t"]),
            act=jnp.where(refill,
                          (new["t0"] < new["tmax"]).astype(jnp.int32),
                          c["act"]),
            hv=jnp.where(refill, -1, c["hv"]),
            w0=c["w0"], w1=c["w1"],
            cell=jnp.where(refill, -1, c["cell"]),
            it=jnp.where(refill, 0, c["it"]),
            qi=qi, done=done, out_t=out_t, out_hv=out_hv,
            out_it=out_it, out_act=out_act, step=c["step"])
        return out

    def cond(c):
        live = jnp.any((c["done"] == 0))
        return live & (c["step"] < q * (max_steps + srv) + srv)

    def body(c):
        rays = {name: c[name] for name in _RAYF}
        st = {kk: c[kk] for kk in ("t", "act", "hv", "w0", "w1", "cell",
                                   "it")}
        for _ in range(srv):
            marched = (st["act"] > 0) & (st["it"] < max_steps)
            st = _march_step(rays, st, marched, coarse, f0, f1, k,
                             n_cas=n_cas, r=r, s=s)
        c2 = dict(c)
        c2.update(st)
        c2["step"] = c["step"] + srv
        return service(c2)

    init = dict(rays0)
    init.update(
        t=rays0["t0"],
        act=(rays0["t0"] < rays0["tmax"]).astype(jnp.int32),
        hv=jnp.full(_SHAPE, -1, jnp.int32),
        w0=jnp.zeros(_SHAPE, jnp.int32),
        w1=jnp.zeros(_SHAPE, jnp.int32),
        cell=jnp.full(_SHAPE, -1, jnp.int32),
        it=jnp.zeros(_SHAPE, jnp.int32),
        qi=jnp.zeros(_SHAPE, jnp.int32),
        done=jnp.zeros(_SHAPE, jnp.int32),
        out_t=jnp.zeros(qshape, jnp.float32),
        out_hv=jnp.full(qshape, -1, jnp.int32),
        out_it=jnp.zeros(qshape, jnp.int32),
        out_act=jnp.zeros(qshape, jnp.int32),
        step=jnp.int32(0))
    c = jax.lax.while_loop(cond, body, init)
    t_out[0] = c["out_t"]
    hv_out[0] = c["out_hv"]
    it_out[0] = c["out_it"]
    act_out[0] = c["out_act"]


def finest_voxel_size(sdf: SDFCascades, points: jnp.ndarray,
                      config: SDFConfig) -> jnp.ndarray:
    """Voxel size of the finest cascade containing each point — pure
    arithmetic (no grid gathers), for bias/grace computations."""
    n_cas = config.num_cascades
    r = config.cascade_resolution
    org = cascade_origin(sdf.center, sdf.voxel_size, r)        # (N, 3)
    local = (points[:, None, :] - org[None]) / sdf.voxel_size[None, :, None]
    inside = jnp.all((local >= 0) & (local < r), axis=-1)      # (M, N)
    vs = jnp.where(inside, sdf.voxel_size[None, :], jnp.inf).min(axis=-1)
    return jnp.where(jnp.isfinite(vs), vs, sdf.voxel_size[-1])


def _entry(sdf: SDFCascades, origins, dirs, t_max, config: SDFConfig,
           grace_voxels: float):
    """Clipmap-entry setup shared by all phases: (t_init, t_enter,
    t_grace) per ray, with misses encoded as t_init > t_max."""
    r = config.cascade_resolution
    m = origins.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (m,))
    t_grace = grace_voxels * finest_voxel_size(sdf, origins, config)
    vs_c = sdf.voxel_size[-1]
    lo = cascade_origin(sdf.center[-1], vs_c, r)
    hi = lo + r * vs_c
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    t0s = (lo - origins) * inv_d
    t1s = (hi - origins) * inv_d
    t_enter = jnp.minimum(t0s, t1s).max(-1)
    t_exit = jnp.maximum(t0s, t1s).min(-1)
    t_init = jnp.clip(jnp.maximum(t_enter + 1e-4, 1e-3), None, t_max)
    never = t_exit < jnp.maximum(t_enter, 0.0)
    t_init = jnp.where(never, t_max + 1.0, t_init)  # never-active encoding
    return t_init, t_max, t_enter, t_grace


def _run(sdf: SDFCascades, origins, dirs, t_init, t_max, t_enter, t_grace,
         *, config: SDFConfig, max_steps: int, interpret: bool):
    """One kernel dispatch over all rays; resumable: pass the previous
    phase's ``t`` as ``t_init`` to continue a march exactly (the per-cell
    word cache re-fetches on entry; everything else is a pure function of
    t).  Returns flat (t, hv, it, act)."""
    n_cas = config.num_cascades
    r = config.cascade_resolution
    s = r // 16
    m = origins.shape[0]
    mp = ((m + 1023) // 1024) * 1024
    pad = mp - m

    def field(a, fill=0.0):
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad \
            else a
        return a.reshape(-1, 8, 128)

    rays = jnp.stack([
        field(origins[:, 0]), field(origins[:, 1]), field(origins[:, 2]),
        field(dirs[:, 0]), field(dirs[:, 1]), field(dirs[:, 2]),
        field(t_init, fill=1.0), field(t_max, fill=0.0),
        field(t_enter, fill=0.0), field(t_grace, fill=0.0)],
        axis=1)                                       # (Bk, 10, 8, 128)
    nblk = rays.shape[0]

    origins_c = cascade_origin(sdf.center, sdf.voxel_size, r)   # (N, 3)
    meta = jnp.zeros((1, 128), jnp.float32)
    meta = meta.at[0, 0:n_cas].set(sdf.voxel_size)
    meta = meta.at[0, 16:16 + n_cas].set(origins_c[:, 0])
    meta = meta.at[0, 32:32 + n_cas].set(origins_c[:, 1])
    meta = meta.at[0, 48:48 + n_cas].set(origins_c[:, 2])

    kernel = functools.partial(_march_block_kernel, n_cas=n_cas, r=r, s=s,
                               max_steps=max_steps)
    t, hv, it, act = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nblk, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(meta, sdf.march_coarse, sdf.march_fine0, sdf.march_fine1, rays)

    flat = lambda a: a.reshape(-1)[:m]
    return flat(t), flat(hv), flat(it), flat(act) > 0


def _run_stream(sdf: SDFCascades, origins, dirs, t_init, t_max, t_enter,
                t_grace, *, config: SDFConfig, max_steps: int,
                interpret: bool, q: int, srv: int):
    """One streaming-kernel dispatch (persistent lanes, per-lane ray
    queues of depth ``q``, service every ``srv`` steps).  Returns flat
    (t, hv, it, act) — bit-identical to :func:`_run`."""
    n_cas = config.num_cascades
    r = config.cascade_resolution
    s = r // 16
    m = origins.shape[0]
    blk = 1024 * q
    mp = ((m + blk - 1) // blk) * blk
    pad = mp - m

    def field(a, fill=0.0):
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad \
            else a
        return a.reshape(-1, q, 8, 128)

    fields = [
        field(origins[:, 0]), field(origins[:, 1]), field(origins[:, 2]),
        field(dirs[:, 0]), field(dirs[:, 1]), field(dirs[:, 2]),
        field(t_init, fill=1.0), field(t_max, fill=0.0),
        field(t_enter, fill=0.0), field(t_grace, fill=0.0)]
    # slot-major interleave: ray_ref[0, j*10 + i] = field i of queue slot j
    rays = jnp.stack(fields, axis=2).reshape(-1, q * 10, 8, 128)
    nblk = rays.shape[0]

    origins_c = cascade_origin(sdf.center, sdf.voxel_size, r)
    meta = jnp.zeros((1, 128), jnp.float32)
    meta = meta.at[0, 0:n_cas].set(sdf.voxel_size)
    meta = meta.at[0, 16:16 + n_cas].set(origins_c[:, 0])
    meta = meta.at[0, 32:32 + n_cas].set(origins_c[:, 1])
    meta = meta.at[0, 48:48 + n_cas].set(origins_c[:, 2])

    kernel = functools.partial(_march_stream_kernel, n_cas=n_cas, r=r, s=s,
                               max_steps=max_steps, q=q, srv=srv)
    t, hv, it, act = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q * 10, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, q, 8, 128), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nblk, q, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, q, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nblk, q, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nblk, q, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(meta, sdf.march_coarse, sdf.march_fine0, sdf.march_fine1, rays)

    flat = lambda a: a.reshape(-1)[:m]
    return flat(t), flat(hv), flat(it), flat(act) > 0


@functools.partial(jax.jit, static_argnames=("config", "max_steps",
                                             "interpret", "payload",
                                             "grace_voxels"))
def march(sdf: SDFCascades, origins: jnp.ndarray, dirs: jnp.ndarray,
          t_max, *, config: SDFConfig, max_steps: int | None = None,
          interpret: bool | None = None, payload: bool = True,
          grace_voxels: float = 1.75) -> SDFHit:
    """Kernel-accelerated sphere march (voxel-precision hits).

    Drop-in for :func:`sdf_trace.march` on the approximate tier: same SDFHit
    payload, hits land on the surface voxel rather than the trilinear
    zero-crossing (error <= ~1 voxel of the sampled cascade).  Hits within
    ``grace_voxels`` local voxels of the ray start are ignored (the ray's
    own surface voxel band).  ``payload=False`` skips the brick/uvw
    recovery gathers — occlusion rays only need hit/t.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    max_steps = max_steps or config.march_max_steps
    m = origins.shape[0]
    r = config.cascade_resolution
    t_init, t_max, t_enter, t_grace = _entry(sdf, origins, dirs, t_max,
                                             config, grace_voxels)
    t, hv, it, _ = _run(sdf, origins, dirs, t_init, t_max, t_enter, t_grace,
                        config=config, max_steps=max_steps,
                        interpret=interpret)
    return _payload(sdf, config, origins, dirs, t, hv, it, payload)


def _payload(sdf: SDFCascades, config: SDFConfig, origins, dirs, t, hv, it,
             payload: bool) -> SDFHit:
    m = origins.shape[0]
    r = config.cascade_resolution
    n_cas = config.num_cascades
    hit = hv >= 0
    hv_c = jnp.maximum(hv, 0)
    r3 = r * r * r
    cas = hv_c // r3
    voxel = jnp.where(hit, hv_c, -1)
    if not payload:   # occlusion tier: no brick/uvw recovery gathers
        return SDFHit(t=jnp.where(hit, t, BIG), hit=hit, iterations=it,
                      cascade=jnp.where(hit, cas, -1),
                      brick=jnp.where(hit, 0, -1),
                      uvw=jnp.zeros((m, 3), jnp.float32), voxel=voxel)
    # brick id at the hit voxel: hv already IS the flat brick_map index
    # (cas-major).  Either gather form (scalar or 8-wide row) sits at the
    # same ~6.5 ms floor at 540p (hit voxels are random across the 2M-entry
    # map); the production GI path therefore keys its shading fetch on
    # ``voxel`` directly (SDFCascades.voxel_shade) and XLA dead-code-
    # eliminates this gather — it survives for debug views and tests.
    bm8 = sdf.brick_map.reshape(-1, 8)
    brick = jnp.take_along_axis(bm8[hv_c >> 3], (hv_c & 7)[:, None],
                                axis=1)[:, 0]
    brick = jnp.where(hit, brick, -1)
    # uvw: fractional position within the hit voxel.  Cascade-indexed
    # smalls resolve by unrolled one-hot selects — n_cas wheres are
    # vector ops; 518k-element gathers from (n_cas,) tables are not.
    p_hit = origins + dirs * t[:, None]
    orgs = cascade_origin(sdf.center, sdf.voxel_size, r)
    vs_hit = jnp.full((m,), float(1.0), jnp.float32)
    org_hit = jnp.zeros((m, 3), jnp.float32)
    for i in range(n_cas):
        sel = cas == i
        vs_hit = jnp.where(sel, sdf.voxel_size[i], vs_hit)
        org_hit = jnp.where(sel[:, None], orgs[i], org_hit)
    local = (p_hit - org_hit) / vs_hit[:, None]
    uvw = jnp.where(hit[:, None],
                    local - jnp.floor(local), 0.0)
    return SDFHit(t=jnp.where(hit, t, BIG), hit=hit, iterations=it,
                  cascade=jnp.where(hit, cas, -1), brick=brick, uvw=uvw,
                  voxel=voxel)


@functools.partial(jax.jit, static_argnames=("config", "max_steps",
                                             "interpret", "payload",
                                             "grace_voxels", "queue",
                                             "service_every"))
def march_stream(sdf: SDFCascades, origins: jnp.ndarray, dirs: jnp.ndarray,
                 t_max, *, config: SDFConfig, max_steps: int | None = None,
                 interpret: bool | None = None, payload: bool = True,
                 grace_voxels: float = 1.75, queue: int = 32,
                 service_every: int = 2) -> SDFHit:
    """Streaming persistent-lane march — bit-exact, divergence-immune.

    Same contract as :func:`march`; dispatches _march_stream_kernel (each
    lane owns a ``queue``-deep ray queue and refills itself in-kernel at
    ``service_every``-step service points).  Falls back to the block
    kernel when the ray count is too small to fill the lane queues.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    max_steps = max_steps or config.march_max_steps
    m = origins.shape[0]
    if m < 1024 * queue:
        return march(sdf, origins, dirs, t_max, config=config,
                     max_steps=max_steps, interpret=interpret,
                     payload=payload, grace_voxels=grace_voxels)
    t_init, t_max, t_enter, t_grace = _entry(sdf, origins, dirs, t_max,
                                             config, grace_voxels)
    t, hv, it, _ = _run_stream(sdf, origins, dirs, t_init, t_max, t_enter,
                               t_grace, config=config, max_steps=max_steps,
                               interpret=interpret, q=queue,
                               srv=service_every)
    return _payload(sdf, config, origins, dirs, t, hv, it, payload)


@functools.partial(jax.jit, static_argnames=("config", "max_steps",
                                             "interpret", "payload",
                                             "grace_voxels", "phase1_steps",
                                             "compact_div"))
def march_compact(sdf: SDFCascades, origins: jnp.ndarray, dirs: jnp.ndarray,
                  t_max, *, config: SDFConfig, max_steps: int | None = None,
                  interpret: bool | None = None, payload: bool = True,
                  grace_voxels: float = 1.75, phase1_steps: int = 24,
                  compact_div: int = 4) -> SDFHit:
    """Wavefront-compacted kernel march — exact, ~40% fewer block steps.

    The lock-step (8,128) block pays its SLOWEST lane every step: GI
    gather rays average ~16 steps but per-block maxima average ~59
    (measured at 540p on the kitchen scene) — 3.7x paid-for-idle.  The
    standard wavefront fix: march everyone ``phase1_steps``, gather the
    still-active tail (budget-exhausted rays, ~the slowest eighth) into
    an m/``compact_div`` buffer and finish it there, then run a full-width
    cleanup phase that is a no-op unless the tail overflowed the buffer —
    so the result is EXACTLY the single-phase march for any input.
    Resume is exact because a ray's march state is a pure function of t
    (the per-cell word cache re-fetches on entry).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    max_steps = max_steps or config.march_max_steps
    m = origins.shape[0]
    if m < 4096 or max_steps <= phase1_steps:
        return march(sdf, origins, dirs, t_max, config=config,
                     max_steps=max_steps, interpret=interpret,
                     payload=payload, grace_voxels=grace_voxels)
    t_init, t_max, t_enter, t_grace = _entry(sdf, origins, dirs, t_max,
                                             config, grace_voxels)
    t, hv, it, act = _run(sdf, origins, dirs, t_init, t_max, t_enter,
                          t_grace, config=config, max_steps=phase1_steps,
                          interpret=interpret)

    cap = ((m // compact_div) + 1023) // 1024 * 1024
    idx = jnp.argsort(~act)[:cap]          # active rays first, stable
    sel = lambda a: a[idx]
    t2, hv2, it2, act2 = _run(
        sdf, sel(origins), sel(dirs),
        # inactive padding lanes resume past t_max -> never active
        jnp.where(sel(act), sel(t), sel(t_max) + 1.0),
        sel(t_max), sel(t_enter), sel(t_grace), config=config,
        max_steps=max_steps - phase1_steps, interpret=interpret)
    upd = sel(act)
    # actives that did NOT fit the compacted buffer (only when > cap rays
    # survived phase 1) — the cleanup phase finishes exactly these
    act_over = act.at[idx].set(False)
    t = t.at[idx].set(jnp.where(upd, t2, sel(t)))
    hv = hv.at[idx].set(jnp.where(upd, hv2, sel(hv)))
    it = it.at[idx].set(jnp.where(upd, it2 + phase1_steps, sel(it)))

    # exactness cleanup: with no overflow every block's while_loop exits
    # on its first check (all lanes start past t_max)
    t3, hv3, it3, _ = _run(
        sdf, origins, dirs,
        jnp.where(act_over, t, t_max + 1.0),
        t_max, t_enter, t_grace, config=config,
        max_steps=max_steps - phase1_steps, interpret=interpret)
    t = jnp.where(act_over, t3, t)
    hv = jnp.where(act_over, hv3, hv)
    it = jnp.where(act_over, it3 + it, it)
    return _payload(sdf, config, origins, dirs, t, hv, it, payload)
