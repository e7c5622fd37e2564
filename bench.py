"""Benchmark: primary visibility throughput (Mrays/s/chip) at
Kitchen-Set-representative scale (~49k triangles, 1920x1080) via the
sort-built exact-list Pallas rasterizer, plus the production GI frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline = BASELINE.json north star (>=200 Mrays/s/chip primary visibility);
the reference itself publishes no numbers (BASELINE.md).  "extra" carries
the secondary numbers the VERDICT tracks: the small-scene (3k) and stress
(111k) raster points and the 1080p production GI frame / 135-row band
(v5e-8 per-chip proxy) times.

Timing notes: through the axon tunnel, per-dispatch overhead is ~5 ms and
block_until_ready does not synchronize with device execution, so the frame
loop runs INSIDE one jit (lax.fori_loop with a data dependency between
iterations) and a single scalar readback fences the measurement — this
times the device pipeline itself, exactly what a production frame loop
(frames enqueued back-to-back) pays per frame.
"""

import json
import sys
import time


def _progress(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

import jax

# Persist compiles (the axon tunnel recompiles are minutes); TPU-only — CPU
# AOT cache entries are machine-feature-sensitive.
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ITERS = 30
HEIGHT, WIDTH = 1080, 1920


def _raster_ms(tess: int) -> float:
    """In-jit per-frame ms for the PRODUCTION visibility pass (the same
    dispatch the renderer uses: binned lists <=16k tris, sorted exact
    emission beyond) on the kitchen-stress scene at the given
    tessellation level.  The full HitRecord (ids + resolved source
    barycentrics) is consumed so the attribute resolve cannot be
    dead-code-eliminated out of the measurement; overflow is asserted
    zero so the number is never taken from a partial frame."""
    from vri_tpu.config import RenderConfig
    from vri_tpu.hydra.delegate import RenderDelegate
    from vri_tpu.ops import rasterize
    from vri_tpu.passes import frame as frame_mod
    from vri_tpu.registry import bake_world
    from vri_tpu.usd import scenes

    _progress(f"raster tess={tess}: scene sync")
    d = RenderDelegate(RenderConfig(width=WIDTH, height=HEIGHT))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)
    # production dispatch parity (frame._visibility_raster): the sorted
    # work-list kernel + USD doubleSided backface culling (these meshes
    # are single-sided solids per the USD spec default; the reference
    # would render them two-sided — VK_CULL_MODE_NONE, Common.cpp:333)
    fn = rasterize.rasterize_sorted
    cs = frame_mod._cull_sign(scene)

    hit0, _ = fn(world, scene.tri_vertices, scene.num_faces, vp,
                 height=HEIGHT, width=WIDTH, cull_sign=cs)
    assert int(hit0.overflow) == 0, "raster capacity overflow in bench"

    @jax.jit
    def loop(v0):
        def body(i, v):
            hit, z = fn(world, scene.tri_vertices, scene.num_faces, v,
                        height=HEIGHT, width=WIDTH, cull_sign=cs)
            # data dependency XLA cannot elide: each frame consumes EVERY
            # element of every HitRecord field (full reductions, not
            # element taps — slice propagation through elementwise/gather
            # chains once silently deleted 40% of a measurement).  The
            # sums are sanitized (INF at misses) and folded in at 1e-20
            # scale: numerically a no-op on vp, but opaque to XLA.
            s = (jnp.sum(hit.u) + jnp.sum(hit.v)
                 + jnp.sum(hit.tri.astype(jnp.float32))
                 + jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))
                 + jnp.sum(jnp.where(jnp.isfinite(z), z, 0.0)))
            return vp + jnp.tanh(s * 1e-20) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, v0)

    _progress(f"raster tess={tess}: compiling loop")
    _ = np.asarray(loop(vp))                      # warm / compile
    _progress(f"raster tess={tess}: timing")
    t0 = time.time()
    _ = np.asarray(loop(vp))
    return (time.time() - t0 - 0.04) / ITERS      # 0.04 = readback RTT


def _gi_ms() -> dict:
    """1080p production GI frame (gi_scale=2, temporal, 1spp) and the
    135-row band (the v5e-8 per-chip row-shard proxy), both in-jit."""
    from vri_tpu.config import RenderConfig, SDFConfig
    from vri_tpu.passes import frame as frame_mod
    from vri_tpu.renderer import Renderer
    from vri_tpu.usd import scenes

    _progress("gi: scene + cascades setup")
    cfg = RenderConfig(width=WIDTH, height=HEIGHT,
                       sdf=SDFConfig.preset("room"))
    r = Renderer(cfg)
    r.load_stage(scenes.kitchen_stress(num_objects=256))
    cascades = r.ensure_cascades()
    scene = r.scene
    fp = frame_mod.FrameParams.from_camera(r.camera, HEIGHT)
    key = jax.random.PRNGKey(0)

    def bench(h, band, iters=10):
        st0 = frame_mod.init_temporal(h, WIDTH, 2)

        @jax.jit
        def loop(st):
            def body(i, carry):
                st, acc = carry
                aovs, st2 = frame_mod.render_frame_gi_temporal(
                    scene, fp, cascades, jax.random.fold_in(key, i), st,
                    height=h, width=WIDTH, config=cfg.sdf,
                    backend="raster", samples=1, use_cache=True,
                    gi_scale=2, band=band)
                # full-reduction consumption (see _raster_ms note)
                return st2, acc + jnp.sum(aovs["color"]) * 1e-20
            return jax.lax.fori_loop(0, iters, body, (st, jnp.zeros(())))

        _progress(f"gi bench h={h}: compiling")
        _ = np.asarray(loop(st0)[1])
        _progress(f"gi bench h={h}: timing")
        t0 = time.time()
        _ = np.asarray(loop(st0)[1])
        return (time.time() - t0 - 0.04) / iters * 1e3

    def bench_fullrate(iters=5):
        # quality tier: full-res 1spp GI, no temporal reuse
        @jax.jit
        def loop(k0):
            def body(i, carry):
                k, acc = carry
                k2 = jax.random.fold_in(k, i)
                aovs = frame_mod.render_frame_gi(
                    scene, fp, cascades, k2, height=HEIGHT, width=WIDTH,
                    config=cfg.sdf, backend="raster", samples=1,
                    use_cache=True, gi_scale=1)
                return k2, acc + jnp.sum(aovs["color"]) * 1e-20
            return jax.lax.fori_loop(0, iters, body, (k0, jnp.zeros(())))
        _progress("gi fullrate: compiling")
        _ = np.asarray(loop(key)[1])
        _progress("gi fullrate: timing")
        t0 = time.time()
        _ = np.asarray(loop(key)[1])
        return (time.time() - t0 - 0.04) / iters * 1e3

    def bench_sdf():
        # full cascade build + bounded dirty-instance update (the
        # reference runs AS maintenance inside every frame,
        # RenderPass.cpp:919-1010).  One jitted call each; reading back
        # a scalar output fences the whole computation.
        from vri_tpu.ops import sdf as sdf_mod
        from vri_tpu.ops import sdf_build
        from vri_tpu.registry import bake_world

        world = bake_world(scene)
        # the renderer's DEMAND-SCALED caps (zero dropped refs); the
        # BuildState list shapes derive from them, so the animated path
        # must use the same effective config
        eff = getattr(r, "_sdf_cfg_effective", None) or cfg.sdf
        centers = sdf_mod.default_centers(eff, r._cascade_focus)

        def build():
            cas, st = sdf_build.build_for_scene(scene, world, centers,
                                                eff)
            _ = np.asarray(cas.num_bricks)
            return cas, st
        _progress("sdf build: compiling")
        build()                                    # warm / compile
        _progress("sdf build: timing")
        t0 = time.time()
        cas, st = build()
        build_ms = (time.time() - t0 - 0.04) * 1e3

        # dirty the SMALLEST instance (a prop): instance 0 is the room
        # shell, whose AABB covers the whole stage and (correctly)
        # overflows the bounded-update caps
        ni = int(scene.num_instances)
        ext = (np.asarray(scene.instance_aabb_hi)
               - np.asarray(scene.instance_aabb_lo))[:ni].max(-1)
        k = int(np.argmin(ext))
        dirty_inst = np.zeros((scene.instance_transform.shape[0],), bool)
        dirty_inst[k] = True
        dirty_tri = jnp.asarray(dirty_inst)[scene.tri_instance]
        cap = 64
        dlo = np.full((cap, 3), 3.0e38, np.float32)
        dhi = np.full((cap, 3), -3.0e38, np.float32)
        dlo[0] = dlo[1] = np.asarray(scene.instance_aabb_lo[k])
        dhi[0] = dhi[1] = np.asarray(scene.instance_aabb_hi[k])

        def update():
            cas2, _, needs_full = sdf_build.update_for_scene(
                cas, st, scene, world, dirty_tri, jnp.asarray(dlo),
                jnp.asarray(dhi), eff)
            assert int(np.asarray(needs_full)) == 0
            _ = np.asarray(cas2.num_bricks)
        _progress("sdf update: compiling")
        update()                                   # warm / compile
        _progress("sdf update: timing")
        t0 = time.time()
        update()
        update_ms = (time.time() - t0 - 0.04) * 1e3
        return build_ms, update_ms, cas, st, eff

    def bench_anim(cas, st, eff, h, band, iters=5, shard_proxy=None):
        """ANIMATED production frame: bounded SDF update + radiance
        re-bake + temporal GI frame in ONE in-jit step per iteration —
        the reference's per-frame ffxBrixelizerUpdate inside the frame
        budget (RenderPass.cpp:919-1010).  Moves the smallest prop on an
        oscillating path; capacity fallbacks are carried out of the loop
        and asserted zero."""
        from vri_tpu.ops import sdf as sdf_mod

        # the loop's carry must match render_frame_gi_dynamic's output
        # structure (baked cascades carry voxel_shade); bake the seed
        cas = sdf_mod.bake_brick_lighting(cas, scene, config=eff,
                                          alive=st.alive)
        ni = int(scene.num_instances)
        ext = (np.asarray(scene.instance_aabb_hi)
               - np.asarray(scene.instance_aabb_lo))[:ni].max(-1)
        k = int(np.argmin(ext))
        tf0 = scene.instance_transform
        lo0 = jnp.asarray(scene.instance_aabb_lo[k])
        hi0 = jnp.asarray(scene.instance_aabb_hi[k])
        dirty_tri = scene.tri_instance == k
        st_t0 = frame_mod.init_temporal(h, WIDTH, 2)

        def offset(i):
            ph = 0.7 * (i.astype(jnp.float32) + 1.0)
            return jnp.stack([0.03 * jnp.sin(ph), jnp.float32(0.0),
                              0.03 * jnp.cos(ph)])

        @jax.jit
        def loop(cas0, st0):
            def body(i, carry):
                cas_c, st_c, ts, acc, nf_acc = carry
                off = offset(i)
                prev = offset(i - 1) * (i > 0)
                tf = tf0.at[k, :3, 3].add(off)
                scene_i = scene.replace(instance_transform=tf)
                dlo = jnp.full((64, 3), 3.0e38, jnp.float32)
                dhi = jnp.full((64, 3), -3.0e38, jnp.float32)
                dlo = dlo.at[0].set(lo0 + prev).at[1].set(lo0 + off)
                dhi = dhi.at[0].set(hi0 + prev).at[1].set(hi0 + off)
                aovs, ts2, cas2, st2, nf = frame_mod.render_frame_gi_dynamic(
                    scene_i, fp, cas_c, st_c,
                    jax.random.fold_in(key, i), ts, dirty_tri, dlo, dhi,
                    height=h, width=WIDTH, config=eff,
                    backend="raster", samples=1, use_cache=True,
                    gi_scale=2, band=band, shard_proxy=shard_proxy)
                return (cas2, st2, ts2,
                        acc + jnp.sum(aovs["color"]) * 1e-20,
                        nf_acc + nf)
            _, _, _, acc, nf = jax.lax.fori_loop(
                0, iters, body, (cas0, st0, st_t0, jnp.zeros(()),
                                 jnp.zeros((), jnp.int32)))
            return acc, nf
        _progress(f"anim h={h}: compiling")
        acc, nf = loop(cas, st)
        _ = np.asarray(acc)
        assert int(np.asarray(nf)) == 0, "bounded update overflowed"
        _progress(f"anim h={h}: timing")
        t0 = time.time()
        acc, nf = loop(cas, st)
        _ = np.asarray(acc)
        return (time.time() - t0 - 0.04) / iters * 1e3

    # accumulate progressively so one failing section cannot discard the
    # numbers already measured
    out = {}
    out["gi_1080p_ms"] = round(bench(HEIGHT, None), 1)
    out["gi_band135_ms"] = round(bench(136, (472, HEIGHT)), 1)
    out["gi_fullrate_ms"] = round(bench_fullrate(), 1)
    try:
        build_ms, update_ms, cas, st, eff = bench_sdf()
        out["sdf_build_ms"] = round(build_ms, 1)
        out["sdf_update_ms"] = round(update_ms, 1)
        # SDF completeness (VERDICT r4 #3/#8): demand-scaled caps must
        # build the bench scene with ZERO dropped refs
        out["sdf_list_drops"] = int(np.asarray(st.list_overflow))
        out["sdf_caps"] = [eff.cell_list_cap, eff.global_list_cap]
    except Exception as e:                         # pragma: no cover
        out["sdf_error"] = repr(e)[:200]
        return out
    try:
        out["gi_anim_ms"] = round(bench_anim(cas, st, eff, HEIGHT, None),
                                  1)
        out["gi_anim_band_ms"] = round(
            bench_anim(cas, st, eff, 136, (472, HEIGHT)), 1)
        # v5e-8 per-chip proxy of the SHARDED animated path (tiling.
        # render_frame_tiled_dynamic, parity-tested vs replicated):
        # update emit + bake march run one device's 1/8 slice
        out["gi_anim_band8_ms"] = round(
            bench_anim(cas, st, eff, 136, (472, HEIGHT), shard_proxy=8),
            1)
    except Exception as e:                         # pragma: no cover
        out["gi_anim_error"] = repr(e)[:200]
    return out


def _city_ms() -> dict:
    """Beyond-bench city stage (1.35M instanced tris, 4,501 instances):
    the production culled/compacted full-rate visibility frame (VERDICT
    r4 #8: carry the city row every round).  Heavy: USD authoring +
    sync ~40 s + one compile (persistent-cache backed)."""
    from vri_tpu.config import RenderConfig, SceneLimits
    from vri_tpu.hydra.delegate import RenderDelegate
    from vri_tpu.passes import frame as frame_mod
    from vri_tpu.registry import bake_world
    from vri_tpu.usd import scenes

    _progress("city: authoring + sync")
    stage = scenes.city_stress(num_buildings=4500, tess=5, num_protos=24)
    lim = SceneLimits(max_instances=8192, max_vertices=1 << 22,
                      max_faces=1 << 22)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, limits=lim,
                       lod_tau=0.75, lod_levels=3, lod_min_faces=64)
    d = RenderDelegate(cfg)
    d.populate(stage)
    scene = d.sync()
    world = bake_world(scene)
    fp = frame_mod.FrameParams.from_camera(d.camera, HEIGHT)

    def one(v):
        fpv = fp.replace(view_proj=v)
        hit = frame_mod._visibility_raster(
            scene, world, fpv, HEIGHT, WIDTH, lod_tau=0.0,
            cull_instances=True, compact_cap=1 << 20)
        return (jnp.sum(hit.u)
                + jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0))
                + jnp.sum(hit.tri.astype(jnp.float32)), hit.overflow)

    @jax.jit
    def loop(v0):
        def body(i, carry):
            v, ov = carry
            s, o = one(v)
            return v + jnp.tanh(s * 1e-20) * 1e-20, ov + o
        return jax.lax.fori_loop(0, 3, body,
                                 (v0, jnp.zeros((), jnp.int32)))

    vp = jnp.asarray(fp.view_proj)
    _progress("city: compiling")
    out = loop(vp)
    _ = np.asarray(out[0])
    _progress("city: timing")
    t0 = time.time()
    out = loop(vp)
    _ = np.asarray(out[0])
    return {"city_fullrate_ms": round((time.time() - t0 - 0.04) / 3 * 1e3,
                                      1),
            "city_overflow": int(np.asarray(out[1]))}


def main():
    extra = {}
    per_frame = _raster_ms(tess=4)                # ~49k triangles
    mrays = HEIGHT * WIDTH / per_frame / 1e6
    extra["raster_49k_ms"] = round(per_frame * 1e3, 2)
    for tess, label in ((1, "raster_3k"), (6, "raster_111k")):
        try:
            ms = _raster_ms(tess=tess)
            extra[label + "_mrays"] = round(HEIGHT * WIDTH / ms / 1e6, 1)
        except Exception as e:                     # pragma: no cover
            extra[label + "_mrays"] = f"error: {e}"
    try:
        extra.update(_gi_ms())
    except Exception as e:                         # pragma: no cover
        extra["gi_error"] = repr(e)[:200]
    try:
        extra.update(_city_ms())
    except Exception as e:                         # pragma: no cover
        extra["city_error"] = repr(e)[:200]

    baseline = 200.0  # Mrays/s/chip north-star target
    print(json.dumps({
        "metric": "primary visibility Mrays/s/chip (kitchen-stress 49k "
                  "tris, 1080p, sorted Pallas raster)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
