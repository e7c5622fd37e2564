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


def _sample(sdf: SDFCascades, p: jnp.ndarray, config: SDFConfig,
            dirs: jnp.ndarray | None = None):
    """Sample the cascade set at world points p (M, 3).

    Returns (d_world, cascade, brick, uvw, inside_any, exit_t):
      d_world — trilinear truncated distance where a brick exists, else BIG;
      exit_t — world-space distance along ``dirs`` to the current voxel's
      exit face (0 when dirs is None).
    """
    n_cas = config.num_cascades
    r = config.cascade_resolution
    bsz = config.brick_size
    m = p.shape[0]

    d_best = jnp.full((m,), BIG, jnp.float32)
    cas_best = jnp.full((m,), -1, jnp.int32)
    brick_best = jnp.full((m,), -1, jnp.int32)
    uvw_best = jnp.zeros((m, 3), jnp.float32)
    exit_best = jnp.zeros((m,), jnp.float32)
    chosen = jnp.zeros((m,), bool)

    # finest-first: once a ray is inside a cascade, coarser ones are skipped
    for n in range(n_cas):
        vs = sdf.voxel_size[n]
        org = cascade_origin(sdf.center[n], vs, r)
        local = (p - org) / vs                     # voxel coords (x, y, z)
        vox = jnp.floor(local).astype(jnp.int32)
        inside = jnp.all((vox >= 0) & (vox < r), axis=-1)
        take = inside & ~chosen
        vox_c = jnp.clip(vox, 0, r - 1)
        brick = sdf.brick_map[n, vox_c[:, 2], vox_c[:, 1], vox_c[:, 0]]
        frac = local - vox_c.astype(jnp.float32)   # [0,1) within voxel

        # trilinear sample of the brick's (B,B,B) texel grid
        tc = frac * bsz - 0.5
        t0 = jnp.floor(tc)
        fr = tc - t0
        t0i = t0.astype(jnp.int32)
        b_idx = jnp.maximum(brick, 0)

        def tap(dx, dy, dz):
            ix = jnp.clip(t0i[:, 0] + dx, 0, bsz - 1)
            iy = jnp.clip(t0i[:, 1] + dy, 0, bsz - 1)
            iz = jnp.clip(t0i[:, 2] + dz, 0, bsz - 1)
            return sdf.atlas[b_idx, iz, iy, ix]

        if sdf.atlas.dtype == jnp.uint8:
            raw_tap = tap
            tap = lambda dx, dy, dz: \
                raw_tap(dx, dy, dz).astype(jnp.float32) * (1.0 / 255.0)
        fx, fy, fz = fr[:, 0], fr[:, 1], fr[:, 2]
        d00 = tap(0, 0, 0) * (1 - fx) + tap(1, 0, 0) * fx
        d10 = tap(0, 1, 0) * (1 - fx) + tap(1, 1, 0) * fx
        d01_ = tap(0, 0, 1) * (1 - fx) + tap(1, 0, 1) * fx
        d11 = tap(0, 1, 1) * (1 - fx) + tap(1, 1, 1) * fx
        d0 = d00 * (1 - fy) + d10 * fy
        d1 = d01_ * (1 - fy) + d11 * fy
        d01v = d0 * (1 - fz) + d1 * fz             # normalized [0,1]

        trunc_w = config.truncation_voxels * vs
        has_brick = brick >= 0
        d_world = jnp.where(has_brick, d01v * trunc_w, BIG)

        if dirs is not None:
            # distance (world) along the ray to this voxel's exit planes;
            # axes the ray doesn't move along never produce an exit
            safe_d = jnp.where(jnp.abs(dirs) < 1e-9,
                               jnp.where(dirs < 0, -1e-9, 1e-9), dirs)
            target = jnp.where(dirs > 0, vox_c.astype(jnp.float32) + 1.0,
                               vox_c.astype(jnp.float32))
            t_ax = (target - local) * vs / safe_d
            t_ax = jnp.where(jnp.abs(dirs) < 1e-9, BIG, t_ax)
            exit_t = jnp.maximum(jnp.min(t_ax, axis=-1), 0.0)
        else:
            exit_t = jnp.zeros((m,), jnp.float32)

        d_best = jnp.where(take, d_world, d_best)
        cas_best = jnp.where(take, n, cas_best)
        brick_best = jnp.where(take, brick, brick_best)
        uvw_best = jnp.where(take[:, None], frac, uvw_best)
        exit_best = jnp.where(take, exit_t, exit_best)
        chosen = chosen | take

    return d_best, cas_best, brick_best, uvw_best, chosen, exit_best


@functools.partial(jax.jit, static_argnames=("config", "max_steps"))
def march(sdf: SDFCascades, origins: jnp.ndarray, dirs: jnp.ndarray,
          t_max, *, config: SDFConfig, max_steps: int | None = None
          ) -> SDFHit:
    """Sphere march rays (M, 3) through the cascades."""
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

    def cond(s):
        return jnp.any(s["active"]) & (s["step"] < max_steps)

    def body(s):
        p = origins + dirs * s["t"][:, None]
        d, cas, brick, uvw, inside, exit_t = _sample(sdf, p, config, dirs)
        vs_here = jnp.where(cas >= 0, sdf.voxel_size[jnp.maximum(cas, 0)],
                            vs_c)
        texel = vs_here / config.brick_size
        eps_w = config.march_epsilon * texel
        has_brick = brick >= 0
        hit_now = s["active"] & inside & has_brick & (d < eps_w)
        # outside every cascade after entering: the ray left the clipmap
        escaped = s["active"] & ~inside & (s["t"] > t_enter + 1e-3)
        # brick voxel: sphere step; empty voxel: DDA step to voxel exit
        sphere = jnp.maximum(d * 0.9, config.march_min_step * texel)
        dda = exit_t + 0.05 * vs_here
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

    s = jax.lax.while_loop(cond, body, state)
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
    rec = march(sdf, origins, dirs, t_max, config=config,
                max_steps=max_steps)
    return 1.0 - rec.hit.astype(jnp.float32)
