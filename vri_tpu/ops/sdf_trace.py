"""Sphere-marched ray traversal of the SDF cascades.

The TPU re-design of Brixelizer's trace
(gpu/brixelizer/ffx_brixelizer_trace_ops.h:98-285): the reference walks a
two-level AABB tree with a DDA per cascade and sphere-marches <=8 steps
inside each hit brick, keeping cascade selection wave-uniform.  On TPU the
idiomatic formulation is a fully vectorized hybrid DDA / sphere march: every
ray samples the *finest cascade containing its current point*; voxels with a
brick are sphere-marched on the trilinear-sampled truncated distance, empty
voxels are skipped by stepping to the voxel exit (a one-cell DDA step, which
can never jump over geometry because bricks are allocated for every
geometry-intersecting voxel plus a one-voxel apron).  All rays advance in
lock-step inside one ``lax.while_loop``; XLA's native gather handles the
atlas fetch.

Hit payload mirrors FfxBrixelizerHitRaw {t, brick_id, uvw, iter_count}
(ffx_brixelizer_trace_ops.h:54-59); normals come from the SDF gradient
(central differences), like FfxBrixelizerGetHitNormal (:294+).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from vri_tpu.config import SDFConfig
from vri_tpu.ops.sdf import SDFCascades, cascade_origin

BIG = 3.0e38


@flax.struct.dataclass
class SDFHit:
    t: jnp.ndarray           # (M,) f32 — BIG on miss
    hit: jnp.ndarray         # (M,) bool
    iterations: jnp.ndarray  # (M,) i32
    cascade: jnp.ndarray     # (M,) i32 — cascade sampled at the hit
    brick: jnp.ndarray       # (M,) i32 — atlas brick at the hit
    uvw: jnp.ndarray         # (M, 3) f32 — position within the voxel [0,1)
    # flat hit-voxel id (cas * R^3 + voxel), -1 on miss — the key into
    # voxel-indexed tables (SDFCascades.voxel_shade); the kernel march
    # produces it for free, the XLA march leaves it None
    voxel: jnp.ndarray | None = None


def _sample(sdf: SDFCascades, p: jnp.ndarray, config: SDFConfig,
            dirs: jnp.ndarray | None = None, trilinear: bool = True):
    """Sample the cascade set at world points p (M, 3).

    Returns (d_world, cascade, brick, uvw, inside_any, exit_t):
      d_world — truncated distance where a brick exists, else BIG;
      exit_t — world-space distance along ``dirs`` to the current voxel's
      exit face (0 when dirs is None).

    ``trilinear=False`` samples the nearest texel (one gathered element
    instead of 32) and subtracts a half-texel diagonal so the value stays a
    conservative sphere-march bound — the marching loops use this; quality
    paths (debug views, gradients) keep trilinear.
    """
    n_cas = config.num_cascades
    r = config.cascade_resolution
    bsz = config.brick_size
    m = p.shape[0]

    # cascade selection is pure arithmetic (no gathers): the finest cascade
    # whose grid contains the point.  TPU per-index gather cost dominates
    # this function, so everything below gathers exactly once per point.
    vs_all = sdf.voxel_size                       # (N,)
    org_all = cascade_origin(sdf.center, vs_all, r)          # (N, 3)
    local_all = (p[:, None, :] - org_all[None]) / vs_all[None, :, None]
    inside_all = jnp.all((local_all >= 0) & (local_all < r), axis=-1)  # (m,N)
    ncol = jnp.arange(n_cas, dtype=jnp.int32)
    cas = jnp.min(jnp.where(inside_all, ncol[None, :], n_cas), axis=-1)
    chosen = cas < n_cas
    cas_c = jnp.minimum(cas, n_cas - 1)

    vs = vs_all[cas_c]                                        # (m,)
    local = jnp.take_along_axis(local_all, cas_c[:, None, None],
                                axis=1)[:, 0, :]              # (m, 3)
    vox = jnp.floor(local).astype(jnp.int32)
    vox_c = jnp.clip(vox, 0, r - 1)
    brick = sdf.brick_map[cas_c, vox_c[:, 2], vox_c[:, 1], vox_c[:, 0]]
    frac = local - vox_c.astype(jnp.float32)      # [0,1) within voxel

    b_idx = jnp.maximum(brick, 0)
    if trilinear:
        tc = frac * bsz - 0.5
        t0 = jnp.floor(tc)
        fr = tc - t0
        t0i = t0.astype(jnp.int32)
        # two contiguous (2, B)-row gathers instead of eight point gathers
        iz0 = jnp.clip(t0i[:, 2], 0, bsz - 1)
        iz1 = jnp.clip(t0i[:, 2] + 1, 0, bsz - 1)
        iy0 = jnp.clip(t0i[:, 1], 0, bsz - 1)
        iy1 = jnp.clip(t0i[:, 1] + 1, 0, bsz - 1)
        rows = jnp.stack([sdf.atlas[b_idx, iz0, iy0],
                          sdf.atlas[b_idx, iz0, iy1],
                          sdf.atlas[b_idx, iz1, iy0],
                          sdf.atlas[b_idx, iz1, iy1]], axis=1)    # (m, 4, B)
        if rows.dtype == jnp.uint8:
            rows = rows.astype(jnp.float32) * (1.0 / 255.0)
        ix0 = jnp.clip(t0i[:, 0], 0, bsz - 1)
        ix1 = jnp.clip(t0i[:, 0] + 1, 0, bsz - 1)
        c0 = jnp.take_along_axis(rows, ix0[:, None, None], axis=2)[:, :, 0]
        c1 = jnp.take_along_axis(rows, ix1[:, None, None], axis=2)[:, :, 0]
        fx, fy, fz = fr[:, 0], fr[:, 1], fr[:, 2]
        dx = c0 * (1 - fx)[:, None] + c1 * fx[:, None]            # (m, 4)
        d0 = dx[:, 0] * (1 - fy) + dx[:, 1] * fy
        d1 = dx[:, 2] * (1 - fy) + dx[:, 3] * fy
        d01v = d0 * (1 - fz) + d1 * fz                # normalized [0,1]
    else:
        ti = jnp.clip((frac * bsz).astype(jnp.int32), 0, bsz - 1)
        d01v = sdf.atlas[b_idx, ti[:, 2], ti[:, 1], ti[:, 0]]
        if d01v.dtype == jnp.uint8:
            d01v = d01v.astype(jnp.float32) * (1.0 / 255.0)
        # conservative: value holds at the texel center, point is within
        # half a texel diagonal of it
        d01v = jnp.maximum(
            d01v - 0.8660254 / (config.truncation_voxels * bsz), 0.0)

    trunc_w = config.truncation_voxels * vs
    has_brick = (brick >= 0) & chosen
    d_best = jnp.where(has_brick, d01v * trunc_w, BIG)

    if dirs is not None:
        # distance (world) along the ray to this voxel's exit planes;
        # axes the ray doesn't move along never produce an exit
        safe_d = jnp.where(jnp.abs(dirs) < 1e-9,
                           jnp.where(dirs < 0, -1e-9, 1e-9), dirs)
        target = jnp.where(dirs > 0, vox_c.astype(jnp.float32) + 1.0,
                           vox_c.astype(jnp.float32))
        t_ax = (target - local) * vs[:, None] / safe_d
        t_ax = jnp.where(jnp.abs(dirs) < 1e-9, BIG, t_ax)
        exit_t = jnp.maximum(jnp.min(t_ax, axis=-1), 0.0)
    else:
        exit_t = jnp.zeros((m,), jnp.float32)

    cas_best = jnp.where(chosen, cas_c, -1)
    brick_best = jnp.where(chosen, brick, -1)
    uvw_best = jnp.where(chosen[:, None], frac, 0.0)
    return d_best, cas_best, brick_best, uvw_best, chosen, exit_t


def _march_loop(sdf, config, approx, origins, dirs, t_max, t_enter, state,
                max_steps):
    """Lock-step march loop over whatever ray set ``state`` describes."""
    vs_c = sdf.voxel_size[-1]

    def cond(s):
        return jnp.any(s["active"]) & (s["step"] < max_steps)

    def body(s):
        p = origins + dirs * s["t"][:, None]
        d, cas, brick, uvw, inside, exit_t = _sample(sdf, p, config, dirs,
                                                     trilinear=not approx)
        vs_here = jnp.where(cas >= 0, sdf.voxel_size[jnp.maximum(cas, 0)],
                            vs_c)
        texel = vs_here / config.brick_size
        eps_w = config.march_epsilon * texel
        has_brick = brick >= 0
        hit_now = s["active"] & inside & has_brick & (d < eps_w)
        # outside every cascade after entering: the ray left the clipmap
        escaped = s["active"] & ~inside & (s["t"] > t_enter + 1e-3)
        # brick voxel: sphere step; empty voxel: skip the chebyshev
        # empty-space distance encoded in the brick map (at least to the
        # voxel exit)
        sphere = jnp.maximum(d * 0.9, config.march_min_step * texel)
        esd = jnp.maximum(-brick, 1).astype(jnp.float32)
        skip = jnp.maximum(exit_t, (esd - 1.0) * vs_here)
        dda = skip + 0.05 * vs_here
        adv = jnp.where(has_brick, sphere, dda)
        adv = jnp.where(inside, adv, vs_c)       # outside: coarse stride
        new_t = s["t"] + adv
        over = new_t >= t_max
        active = s["active"] & ~hit_now & ~over & ~escaped
        return dict(
            t=jnp.where(s["active"], jnp.where(hit_now, s["t"], new_t),
                        s["t"]),
            active=active,
            hit=s["hit"] | hit_now,
            it=s["it"] + s["active"].astype(jnp.int32),
            cascade=jnp.where(hit_now, cas, s["cascade"]),
            brick=jnp.where(hit_now, brick, s["brick"]),
            uvw=jnp.where(hit_now[:, None], uvw, s["uvw"]),
            step=s["step"] + 1,
        )

    return jax.lax.while_loop(cond, body, state)


_RAY_FIELDS = ("t", "active", "hit", "it", "cascade", "brick", "uvw")


@functools.partial(jax.jit, static_argnames=("config", "max_steps",
                                              "approx", "compact"))
def march(sdf: SDFCascades, origins: jnp.ndarray, dirs: jnp.ndarray,
          t_max, *, config: SDFConfig, max_steps: int | None = None,
          approx: bool = False, compact: bool = False) -> SDFHit:
    """Sphere march rays (M, 3) through the cascades.

    ``approx=True`` uses nearest-texel sampling (one gathered element per
    step instead of 32): hits may trigger up to ~2 texels early, so use it
    for occlusion/gather rays where that only slightly fattens contacts —
    not for primary visibility.  On TPU the approximate tier dispatches to
    the Pallas march kernel (ops/march_kernel.py) when the cascade
    resolution supports it and ``config.kernel_march`` is set — ~2 orders
    of magnitude cheaper per step than the XLA gather loop.

    ``compact=True`` runs a short full-width stage, then gathers the
    surviving rays into a quarter-width buffer for the remaining budget (the
    lock-step loop otherwise pays for every lane until the slowest ray
    finishes).  A final full-width cleanup loop preserves exactness when
    more than a quarter of the rays survive.
    """
    if approx and config.kernel_march and jax.default_backend() == "tpu":
        from vri_tpu.ops import march_kernel

        if march_kernel.supports(config):
            # kernel steps are voxel-granular (a 4-voxel cell costs up to
            # ~6 iterations): scale the budget, its per-step cost is tiny
            ks = (max_steps or config.march_max_steps) * 2 + 16
            fn = (march_kernel.march_compact if compact
                  else march_kernel.march_stream if config.stream_march
                  else march_kernel.march)
            return fn(sdf, origins, dirs, t_max, config=config,
                      max_steps=ks)
    m = origins.shape[0]
    max_steps = max_steps or config.march_max_steps
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (m,))

    # coarsest cascade bounds: rays starting outside skip to entry
    vs_c = sdf.voxel_size[-1]
    r = config.cascade_resolution
    lo = cascade_origin(sdf.center[-1], vs_c, r)
    hi = lo + r * vs_c
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    t0s = (lo - origins) * inv_d
    t1s = (hi - origins) * inv_d
    t_enter = jnp.minimum(t0s, t1s).max(-1)
    t_exit = jnp.maximum(t0s, t1s).min(-1)
    t_init = jnp.clip(jnp.maximum(t_enter + 1e-4, 1e-3), None, t_max)
    never = t_exit < jnp.maximum(t_enter, 0.0)

    state = dict(
        t=t_init,
        active=~never & (t_init < t_max),
        hit=jnp.zeros((m,), bool),
        it=jnp.zeros((m,), jnp.int32),
        cascade=jnp.full((m,), -1, jnp.int32),
        brick=jnp.full((m,), -1, jnp.int32),
        uvw=jnp.zeros((m, 3), jnp.float32),
        step=jnp.int32(0),
    )

    if not compact or m < 512:
        s = _march_loop(sdf, config, approx, origins, dirs, t_max, t_enter,
                        state, max_steps)
    else:
        k1 = min(8, max_steps)
        s = _march_loop(sdf, config, approx, origins, dirs, t_max, t_enter,
                        state, k1)
        cap = m // 4
        idx = jnp.argsort(~s["active"])[:cap]    # surviving rays first
        sub = {k: s[k][idx] for k in _RAY_FIELDS}
        sub["step"] = jnp.int32(0)
        sub = _march_loop(sdf, config, approx, origins[idx], dirs[idx],
                          t_max[idx], t_enter[idx], sub, max_steps - k1)
        for k in _RAY_FIELDS:
            s[k] = s[k].at[idx].set(sub[k])
        # exactness cleanup: if more than cap rays survived stage 1, finish
        # them full-width (exits after one check when none are active)
        s["step"] = jnp.int32(0)
        s = _march_loop(sdf, config, approx, origins, dirs, t_max, t_enter,
                        s, max_steps - k1)

    return SDFHit(t=jnp.where(s["hit"], s["t"], BIG), hit=s["hit"],
                  iterations=s["it"], cascade=s["cascade"], brick=s["brick"],
                  uvw=s["uvw"])


@functools.partial(jax.jit, static_argnames=("config",))
def normal(sdf: SDFCascades, p: jnp.ndarray, *, config: SDFConfig
           ) -> jnp.ndarray:
    """SDF gradient via central differences (FfxBrixelizerGetHitNormal
    analog). h = half a texel of the finest cascade at p."""
    _, cas, _, _, _, _ = _sample(sdf, p, config)
    vs = jnp.where(cas >= 0, sdf.voxel_size[jnp.maximum(cas, 0)],
                   sdf.voxel_size[-1])
    h = (0.5 * vs / config.brick_size)[:, None]
    grads = []
    for ax in range(3):
        e = jnp.zeros((1, 3), jnp.float32).at[0, ax].set(1.0)
        dp = _sample(sdf, p + e * h, config)[0]
        dm = _sample(sdf, p - e * h, config)[0]
        # clamp: points just outside brick coverage sample BIG
        dp = jnp.minimum(dp, 1e3)
        dm = jnp.minimum(dm, 1e3)
        grads.append(dp - dm)
    g = jnp.stack(grads, axis=-1)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnames=("config", "max_steps"))
def occlusion(sdf: SDFCascades, origins: jnp.ndarray, dirs: jnp.ndarray,
              t_max, *, config: SDFConfig, max_steps: int | None = None
              ) -> jnp.ndarray:
    """Shadow factor in [0,1]: 0 = fully blocked (hard via sphere march)."""
    if config.kernel_march and jax.default_backend() == "tpu":
        from vri_tpu.ops import march_kernel

        if march_kernel.supports(config):
            ks = (max_steps or config.march_max_steps) * 2 + 16
            fn = (march_kernel.march_compact if config.compact_march
                  else march_kernel.march_stream if config.stream_march
                  else march_kernel.march)
            rec = fn(sdf, origins, dirs, t_max, config=config,
                     max_steps=ks, payload=False)
            return 1.0 - rec.hit.astype(jnp.float32)
    rec = march(sdf, origins, dirs, t_max, config=config,
                max_steps=max_steps, approx=config.approx_occlusion,
                compact=config.compact_march)
    return 1.0 - rec.hit.astype(jnp.float32)
