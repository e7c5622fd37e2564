"""Multi-host scaling: a 2-D (hosts, tiles) mesh with DCN-aware layout.

SURVEY §2.4's multi-host design point: chips within a host sit on ICI;
hosts talk over DCN (slow, high-latency).  The layout rules baked in here:

  * **Framebuffer rows shard over BOTH axes** — rendering is
    embarrassingly parallel, so the (hosts*tiles)-way row split crosses no
    interconnect at all during a frame.
  * **Per-frame stats** psum over both axes (one small scalar vector —
    the only per-frame DCN traffic).
  * **Scene deltas ride DCN once per sync, not per frame**: each host
    syncs its own partition of the stage (disjoint instance ranges) and
    :func:`merge_scene_partitions` psums the zero-filled pools — one
    all-reduce whose payload is the *delta*, after which every host
    renders from a replicated scene.  (The reference is single-GPU; this
    tier has no counterpart to port.)
  * **SDF halo traffic stays on the ICI axis**: cascade z-slabs shard over
    ``tiles`` only (parallel/halo.py); the ``hosts`` axis replicates
    cascades so brick-plane ppermutes never touch DCN.

On real hardware the mesh comes from ``jax.distributed.initialize`` +
``jax.devices()`` laid out host-major; tests and the driver dryrun shape
the same code over virtual CPU devices.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vri_tpu.config import SDFConfig
from vri_tpu.passes import frame as frame_mod
from vri_tpu.passes.frame import FrameParams
from vri_tpu.registry import SceneBuffers


def make_mesh_2d(n_hosts: int, chips_per_host: Optional[int] = None,
                 axes=("hosts", "tiles")) -> Mesh:
    """(hosts, tiles) mesh, host-major so each row of the mesh is one
    host's ICI domain.  ``jax.devices()`` already enumerates host-major
    under ``jax.distributed``; on a single process the split is virtual."""
    devs = jax.devices()
    chips = chips_per_host or len(devs) // n_hosts
    need = n_hosts * chips
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(n_hosts, chips), axes)


def merge_scene_partitions(scene: SceneBuffers, host_instance: jnp.ndarray,
                           mesh: Mesh) -> SceneBuffers:
    """One DCN all-reduce turns per-host partial scenes into the replicated
    scene every chip renders from.

    Contract: every host syncs the same stage *layout* (slot assignments,
    counts, materials, lights — identical everywhere), but only the pool
    rows of instances it owns need be authoritative; ``host_instance``
    (I,) i32 maps each instance slot to its owning host.  Inside the merge
    each mesh row masks the per-vertex / per-face / per-instance pools to
    the rows it owns, so the psum over the ``hosts`` axis reconstructs the
    full scene regardless of what stale/garbage data a host carried in
    other hosts' rows — and a fully-replicated input (the single-process
    case) merges to itself instead of being multiplied by n_hosts.
    Shared fields (materials, lights, counts) pass through unchanged,
    keeping integer dtypes intact.
    """
    hosts_axis = mesh.axis_names[0]

    def merge(scene, host_instance):
        h = jax.lax.axis_index(hosts_axis)
        own_inst = host_instance == h                       # (I,) bool
        own_vert = own_inst[scene.vertex_instance]          # (V,) bool
        own_face = own_inst[scene.tri_instance]             # (F,) bool

        # which ownership mask partitions each pool.  Under shared-
        # prototype instancing the prototype pools (positions/tri_uv/
        # tri_face) are stage LAYOUT — identical on every host — so they
        # pass through; the expanded index arrays partition per owner.
        proto = scene.tri_proto is not None
        by_mask = {
            "vertex_instance": own_vert,
            "tri_vertices": own_face,
            "tri_instance": own_face,
            "instance_transform": own_inst, "instance_material": own_inst,
            "instance_face_offset": own_inst,
            "instance_face_count": own_inst,
            "instance_double_sided": own_inst,
            "instance_aabb_lo": own_inst, "instance_aabb_hi": own_inst,
        }
        if proto:
            by_mask["vertex_proto"] = own_vert
            by_mask["tri_proto"] = own_face
        else:
            by_mask["positions"] = own_vert
            by_mask["tri_uv"] = own_face
            by_mask["tri_face"] = own_face

        def one(name, a):
            if a is None or (hasattr(a, "size") and a.size == 0):
                return a    # zero-size pools (e.g. no textures) pass through
            own = by_mask.get(name)
            if own is None:
                return a    # identical on every host: pass through as-is
            m = own.reshape(own.shape + (1,) * (a.ndim - own.ndim))
            if a.dtype == jnp.bool_:    # psum has no pred reduction
                s = jax.lax.psum(
                    jnp.where(m, a, False).astype(jnp.int32), hosts_axis)
                return s > 0
            return jax.lax.psum(jnp.where(m, a, jnp.zeros((), a.dtype)),
                                hosts_axis)

        out = {f: one(f, getattr(scene, f))
               for f in scene.__dataclass_fields__}
        return SceneBuffers(**out)

    return shard_map(merge, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                     check_vma=False)(scene, host_instance)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "height", "width", "config",
                                    "gi", "samples", "backend", "use_cache"))
def render_frame_tiled_2d(scene: SceneBuffers, frame: FrameParams, cascades,
                          key, *, mesh: Mesh, height: int, width: int,
                          config: SDFConfig, gi: bool = True,
                          samples: int = 1, backend: str = "raster",
                          use_cache: bool = True) -> Dict[str, jnp.ndarray]:
    """The production frame with rows sharded over hosts x chips.

    Identical per-shard body to ``tiling.render_frame_tiled`` — the band
    index is the flattened (host, chip) position — with stats psum'd over
    both axes.  No other collective runs during a frame, so DCN carries
    only the stats vector.
    """
    from vri_tpu.ops import gi as gi_mod
    from vri_tpu.ops import shading
    from vri_tpu.ops.intersect import gather_triangles, trace_brute
    from vri_tpu.registry import bake_world

    hosts_axis, tiles_axis = mesh.axis_names
    n_dev = mesh.shape[hosts_axis] * mesh.shape[tiles_axis]
    assert height % n_dev == 0, f"height {height} % devices {n_dev} != 0"
    band_h = height // n_dev
    n_tiles = mesh.shape[tiles_axis]

    def shard_fn(scene, frame, cascades, key):
        host = jax.lax.axis_index(hosts_axis)
        chip = jax.lax.axis_index(tiles_axis)
        dev = host * n_tiles + chip
        world = bake_world(scene)
        # rays for this band (global row = dev * band_h + local)
        from vri_tpu.ops import raygen
        ndc_full = raygen.pixel_ndc(height, width)
        y0 = dev * band_h
        ndc = jax.lax.dynamic_slice_in_dim(ndc_full, y0, band_h, 0)
        p = jnp.concatenate(
            [ndc, jnp.full(ndc.shape[:-1] + (1,), 0.02, jnp.float32),
             jnp.ones(ndc.shape[:-1] + (1,), jnp.float32)], axis=-1)
        q = p @ frame.inv_view_proj.T
        p_near = q[..., :3] / q[..., 3:4]
        q2 = (p.at[..., 2].set(0.98)) @ frame.inv_view_proj.T
        p_far = q2[..., :3] / q2[..., 3:4]
        d = p_far - p_near
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(frame.eye, d.shape).reshape(-1, 3)
        d = d.reshape(-1, 3)

        if backend.startswith("raster"):
            # production raster tier selector, same as the single-chip
            # and 1-D sharded paths (VERDICT r4 #5)
            variant, caps_scale = frame_mod._raster_variant(backend)
            hit = frame_mod._visibility_raster(
                scene, world, frame, band_h, width, variant=variant,
                caps_scale=caps_scale, y0=dev * band_h,
                proj_height=height)
        else:
            v0, e1, e2 = gather_triangles(world, scene.tri_vertices)
            hit = trace_brute(o, d, v0, e1, e2, scene.num_faces,
                              cull_sign=frame_mod._cull_sign(scene))
        gb = shading.resolve_gbuffer(scene, world, hit, o, d)
        if backend == "raster":
            t = jnp.linalg.norm(gb.position - frame.eye[None, :], axis=-1)
            gb = gb.replace(depth=jnp.where(gb.valid, t, jnp.float32(3e38)))
        if gi:
            dev_key = jax.random.fold_in(key, dev)
            color = gi_mod.lightloop(gb, scene, cascades, dev_key,
                                     config=config, samples=samples,
                                     use_cache=use_cache)
        else:
            color = shading.shade_direct(gb, scene)
        rays = jnp.asarray(o.shape[0], jnp.float32)
        hits = gb.valid.sum().astype(jnp.float32)
        stats = jax.lax.psum(jax.lax.psum(jnp.stack([rays, hits]),
                                          tiles_axis), hosts_axis)
        return (color.reshape(band_h, width, 3),
                gb.depth.reshape(band_h, width),
                gb.instance.reshape(band_h, width),
                stats)

    color, depth, inst, stats = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P((hosts_axis, tiles_axis)),
                   P((hosts_axis, tiles_axis)),
                   P((hosts_axis, tiles_axis)), P()),
        check_vma=False,
    )(scene, frame, cascades, key)
    return {"color": color, "depth": depth, "instance_id": inst,
            "stats": stats}
