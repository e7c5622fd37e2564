"""The lightloop: shadowed direct lighting + 1-bounce SDF-marched diffuse GI.

This implements the pass the reference scaffolds but leaves stubbed — its
frame loop reserves Material/GBuffer/Lighting passes (Source/RenderPass.cpp:
1023-1029) and builds the Brixelizer cascades that were *intended* to drive a
GI lightloop.  Design:

  * direct: Lambertian over the light array with SDF-marched hard shadows
    (ops/sdf_trace.occlusion) — no triangle shadow rays on the hot path.
  * indirect: per pixel, one (or S) cosine-weighted hemisphere sample is
    sphere-marched through the cascades; at the hit, radiance is estimated
    from the per-brick shading cache (albedo + normal captured from the
    nearest surface at build time — ops/sdf.py) lit by the same lights with
    one more SDF shadow test.  With cosine-weighted sampling the Monte Carlo
    estimator is simply ``albedo_pixel * L_in`` averaged over samples.
  * misses add a small sky term.

Everything is one jitted dataflow; progressive rendering accumulates frames
(see passes/frame.py) with a per-frame RNG key folded from the frame index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vri_tpu.config import SDFConfig
from vri_tpu.ops import sdf_trace
from vri_tpu.ops.sdf import SDFCascades
from vri_tpu.ops.shading import GBuffer
from vri_tpu.registry import SceneBuffers

# plain tuple: this module may be imported inside a trace, so no
# module-level jnp arrays (they would leak tracers)
SKY = (0.02, 0.025, 0.035)   # default when no DomeLight is authored


def cosine_sample_hemisphere(normal: jnp.ndarray, u1: jnp.ndarray,
                             u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted direction about ``normal`` (N, 3)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    # orthonormal basis around the normal (branchless Frisvad)
    n = normal
    sign = jnp.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = jnp.stack([1.0 + sign * n[:, 0] ** 2 * a, sign * b, -sign * n[:, 0]],
                  axis=-1)
    bt = jnp.stack([b, sign + n[:, 1] ** 2 * a, -n[:, 1]], axis=-1)
    return (t * x[:, None] + bt * y[:, None] + n * z[:, None])


def _light_arrays(scene: SceneBuffers):
    nl = scene.light_position.shape[0]
    live = (jnp.arange(nl) < scene.num_lights).astype(jnp.float32)
    return (scene.light_position, scene.light_color,
            scene.light_intensity * live, scene.light_type)


def surface_bias(points: jnp.ndarray, cascades: SDFCascades,
                 config: SDFConfig) -> jnp.ndarray:
    """Per-point shadow-ray offset: ~6 texels of the cascade containing the
    point.  The truncated field's zero level sits on the surface and the
    march's hit epsilon is ~1 texel, so rays must start several texels clear
    of the surface or everything self-shadows.  (Pure arithmetic — only the
    containing cascade's voxel size is needed, no grid gathers.)"""
    from vri_tpu.ops import march_kernel

    return 0.75 * march_kernel.finest_voxel_size(cascades, points, config)


def shadow_occlusion(points: jnp.ndarray, normals: jnp.ndarray,
                     scene: SceneBuffers, cascades: SDFCascades,
                     config: SDFConfig, shadow_steps: int | None = None
                     ) -> jnp.ndarray:
    """SDF-marched per-(point, light) visibility factors (N, L)."""
    shadow_steps = shadow_steps or config.shadow_steps
    lp, lc, li, lt = _light_arrays(scene)
    n_pts, n_lights = points.shape[0], lp.shape[0]
    is_distant = (lt == 1)[None, :]
    to_l = jnp.where(is_distant[..., None], lp[None, :, :],
                     lp[None, :, :] - points[:, None, :])
    dist = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(dist, 1e-12)[..., None]
    bias = surface_bias(points, cascades, config)[:, None]
    shadow_span = (cascades.voxel_size[-1] * config.cascade_resolution)
    t_max = jnp.where(is_distant, shadow_span, dist - 2.0 * bias)
    o = jnp.broadcast_to(points[:, None, :] + normals[:, None, :]
                         * bias[..., None], (n_pts, n_lights, 3)).reshape(-1, 3)
    return sdf_trace.occlusion(
        cascades, o, wi.reshape(-1, 3),
        t_max=jnp.maximum(t_max.reshape(-1), 1e-3),
        config=config, max_steps=shadow_steps).reshape(n_pts, n_lights)


def direct_radiance_analytic(points: jnp.ndarray, normals: jnp.ndarray,
                             scene: SceneBuffers, occ: jnp.ndarray,
                             light_radius: float = 0.1) -> jnp.ndarray:
    """The non-marched half of direct lighting: N.L, falloff, colors —
    cheap math that stays full-rate when shadows march at reduced rate."""
    lp, lc, li, lt = _light_arrays(scene)
    is_distant = (lt == 1)[None, :]
    to_l = jnp.where(is_distant[..., None], lp[None, :, :],
                     lp[None, :, :] - points[:, None, :])
    dist = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(dist, 1e-12)[..., None]
    ndotl = jnp.maximum(jnp.sum(normals[:, None, :] * wi, axis=-1), 0.0)
    falloff = jnp.where(is_distant, 1.0,
                        1.0 / jnp.maximum(dist * dist, light_radius ** 2))
    irr = li[None, :] * ndotl * occ * falloff
    return (irr[..., None] * lc[None, :, :]).sum(axis=1)


def direct_radiance(points: jnp.ndarray, normals: jnp.ndarray,
                    scene: SceneBuffers, cascades: SDFCascades,
                    config: SDFConfig, shadow_steps: int | None = None,
                    light_radius: float = 0.1,
                    return_visibility: bool = False):
    """Incoming direct radiance (N, 3) at surface points, SDF-shadowed.
    ``light_radius`` clamps the inverse-square falloff (fireflies when a
    bounce lands next to a light)."""
    occ = shadow_occlusion(points, normals, scene, cascades, config,
                           shadow_steps)
    out = direct_radiance_analytic(points, normals, scene, occ, light_radius)
    if return_visibility:
        return out, occ
    return out


def direct_radiance_cached(points: jnp.ndarray, normals: jnp.ndarray,
                           scene: SceneBuffers, cascades: SDFCascades,
                           config: SDFConfig,
                           light_radius: float = 0.1) -> jnp.ndarray:
    """Direct radiance with *baked* per-brick shadow visibility: analytic
    N.L and falloff per pixel, shadows gathered from brick_light_vis (one
    voxel lookup — no marching).  Shadow edges quantize to the voxel size;
    pair with the SDF presets whose finest voxels are small."""
    from vri_tpu.ops import sdf_trace

    lp, lc, li, lt = _light_arrays(scene)
    is_distant = (lt == 1)[None, :]
    to_l = jnp.where(is_distant[..., None], lp[None, :, :],
                     lp[None, :, :] - points[:, None, :])
    dist = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(dist, 1e-12)[..., None]
    ndotl = jnp.maximum(jnp.sum(normals[:, None, :] * wi, axis=-1), 0.0)
    # the point's voxel brick supplies the visibility term
    bias = surface_bias(points, cascades, config)[:, None]
    _, _, brick, _, _, _ = sdf_trace._sample(
        cascades, points + normals * bias, config, trilinear=False)
    vis = cascades.brick_light_vis[jnp.maximum(brick, 0)]
    vis = jnp.where((brick >= 0)[:, None], vis, 1.0)
    falloff = jnp.where(is_distant, 1.0,
                        1.0 / jnp.maximum(dist * dist, light_radius ** 2))
    irr = li[None, :] * ndotl * vis * falloff
    return (irr[..., None] * lc[None, :, :]).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("config", "samples",
                                             "gi_steps", "shadow_steps",
                                             "gi_clamp", "use_cache"))
def lightloop(gb: GBuffer, scene: SceneBuffers, cascades: SDFCascades,
              key: jax.Array, *, config: SDFConfig, samples: int = 1,
              gi_steps: int | None = None, shadow_steps: int | None = None,
              gi_clamp: float = 4.0, use_cache: bool = False) -> jnp.ndarray:
    """Full shading: emissive + albedo * (direct + 1-bounce GI).
    ``gi_clamp`` bounds each bounce sample's radiance (firefly control)."""
    gi_steps = gi_steps or config.gi_steps
    shadow_steps = shadow_steps or config.shadow_steps
    n = gb.position.shape[0]
    if config.cached_shadows and use_cache:
        direct = direct_radiance_cached(gb.position, gb.normal, scene,
                                        cascades, config)
    else:
        direct = direct_radiance(gb.position, gb.normal, scene, cascades,
                                 config, shadow_steps=shadow_steps)

    if samples == 0:   # direct-only (SDF-shadowed) fast path
        color = gb.emissive + gb.albedo * direct
        return jnp.where(gb.valid[:, None], color, 0.0)

    indirect = indirect_radiance(gb, scene, cascades, key, config=config,
                                 samples=samples, gi_steps=gi_steps,
                                 gi_clamp=gi_clamp, use_cache=use_cache)
    color = gb.emissive + gb.albedo * (direct + indirect)
    return jnp.where(gb.valid[:, None], color, 0.0)


def indirect_radiance(gb: GBuffer, scene: SceneBuffers,
                      cascades: SDFCascades, key, *, config: SDFConfig,
                      samples: int = 1, gi_steps: int | None = None,
                      shadow_steps: int | None = None, gi_clamp: float = 4.0,
                      use_cache: bool = False) -> jnp.ndarray:
    """Incoming 1-bounce diffuse irradiance estimate (N, 3)."""
    gi_steps = gi_steps or config.gi_steps
    n = gb.position.shape[0]
    if samples <= 0:
        # deterministic direct-only tier (lightloop early-outs before the
        # bounce for samples=0; callers composing indirect themselves get
        # zeros, NOT the 0/0 NaN the mean below would produce)
        return jnp.zeros((n, 3))
    bias = surface_bias(gb.position, cascades, config)[:, None]
    gi_range = (cascades.voxel_size[-1] * config.cascade_resolution
                * config.gi_range_factor)

    indirect = jnp.zeros((n, 3))
    for s in range(samples):
        u = jax.random.uniform(jax.random.fold_in(key, s), (n, 2))
        wi = cosine_sample_hemisphere(gb.normal, u[:, 0], u[:, 1])
        o = gb.position + gb.normal * bias
        rec = sdf_trace.march(cascades, o, wi, t_max=gi_range,
                              config=config, max_steps=gi_steps,
                              approx=config.approx_occlusion,
                              compact=config.compact_march)
        hit_p = o + wi * jnp.minimum(rec.t, gi_range)[:, None]
        # ONE row gather for the whole per-hit shading payload (albedo,
        # normal, cached irradiance, emissive) — four separate per-index
        # gathers at 2M GI rays measured ~15 ms/frame — block-transposed
        # for the field extraction (naive column slices of the
        # lane-padded rows cost a full pass each, ops/rowgather.py).
        # Keyed on the hit VOXEL when the bake precomputed voxel_shade:
        # that removes the brick_map indirection (a second dependent
        # random gather, ~6.5 ms/frame at 540p) from the frame.
        from vri_tpu.ops.rowgather import gather_rows

        if cascades.voxel_shade is not None and rec.voxel is not None:
            shv = gather_rows(cascades.voxel_shade,
                              jnp.maximum(rec.voxel, 0))
            # table rows are bf16 (latency lever, ops/sdf.py); shading
            # math runs in f32
            sh = lambda k: shv(k).astype(jnp.float32)
        else:
            shade_tab = jnp.concatenate(
                [cascades.brick_albedo, cascades.brick_normal,
                 cascades.brick_irradiance, cascades.brick_emissive,
                 jnp.zeros((cascades.brick_albedo.shape[0], 4),
                           cascades.brick_albedo.dtype)], axis=1)
            sh = gather_rows(shade_tab.astype(jnp.float32),
                             jnp.maximum(rec.brick, 0))
        alb_hit = jnp.stack([sh(0), sh(1), sh(2)], axis=-1)
        n_hit = jnp.stack([sh(3), sh(4), sh(5)], axis=-1)
        # two-sided surface cache: face the incoming ray
        n_hit = jnp.where(jnp.sum(n_hit * wi, axis=-1, keepdims=True) > 0,
                          -n_hit, n_hit)
        if use_cache:
            # radiance cache: irradiance baked per brick at build time
            l_hit = jnp.stack([sh(6), sh(7), sh(8)], axis=-1)
        else:
            hit_bias = surface_bias(hit_p, cascades, config)[:, None]
            l_hit = direct_radiance(hit_p + n_hit * hit_bias, n_hit, scene,
                                    cascades, config,
                                    shadow_steps=shadow_steps)
        # emissive surfaces (area lights) contribute directly at the hit
        emis_hit = jnp.stack([sh(9), sh(10), sh(11)], axis=-1)
        bounce = jnp.minimum(alb_hit * l_hit + emis_hit, gi_clamp)
        sky = scene.sky_color   # DomeLight ambient (default SKY constant)
        contrib = jnp.where(rec.hit[:, None], bounce, sky)
        indirect = indirect + contrib
    return indirect / samples


def sdf_debug_color(mode: int, rec: sdf_trace.SDFHit,
                    cascades: SDFCascades, config: SDFConfig,
                    max_dist: float = 10.0) -> jnp.ndarray:
    """False-color views of an SDF march, mirroring Brixelizer's debug
    output modes distance/uvw/iterations/grad/brick-id/cascade-id
    (ffx_brixelizer_host_gpu_shared.h:86-93)."""
    from vri_tpu.config import DebugMode
    from vri_tpu.ops.shading import _id_color

    hit = rec.hit[:, None]
    if mode == DebugMode.SDF_DISTANCE:
        z = jnp.clip(rec.t / max_dist, 0.0, 1.0)[:, None]
        c = jnp.repeat(1.0 - z, 3, -1)
    elif mode == DebugMode.SDF_UVW:
        c = rec.uvw
    elif mode == DebugMode.SDF_ITERATIONS:
        it = (rec.iterations.astype(jnp.float32)
              / config.march_max_steps)[:, None]
        c = jnp.concatenate([it, 1.0 - it, jnp.zeros_like(it)], -1)
        return c  # iteration heat shown for misses too
    elif mode == DebugMode.SDF_GRAD:
        n = cascades.brick_normal[jnp.maximum(rec.brick, 0)]
        c = n * 0.5 + 0.5
    elif mode == DebugMode.SDF_BRICK_ID:
        c = _id_color(rec.brick)
    elif mode == DebugMode.SDF_CASCADE_ID:
        c = _id_color(rec.cascade * 7 + 3)
    else:
        raise ValueError(f"not an SDF debug mode: {mode}")
    return jnp.where(hit, c, 0.0)
