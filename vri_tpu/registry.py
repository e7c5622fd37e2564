"""Resource registry: synced prims -> packed device arrays.

TPU-native equivalent of the reference's ``ResourceRegistry``
(Source/ResourceRegistry.cpp): where the reference bump-allocates host pools
(ResourceRegistry.cpp:501-534), copies them to Vulkan device buffers in an
async commit (:251-459) and exposes them to shaders through 4096-entry
bindless descriptor arrays (:9-77,139-249), this registry packs every synced
mesh into one structure-of-arrays pool per attribute, pads pools to static
capacities, and ships them to the TPU as a single :class:`SceneBuffers`
pytree.  "Bindless access" becomes integer-indexed ``jnp.take`` gathers —
XLA's native strength — and the per-draw-item ``DrawItemMetaData`` buffer
(Include/ResourceRegistry.h:30-36) becomes the instance_* arrays.

Geometry is kept in *object space* with per-instance transforms; world-space
vertex positions are derived on device by a single jitted gather+matmul
(`bake_world`), so a transform-only edit re-uploads one (I,4,4) array instead
of the vertex pool (the reference re-records and re-bakes its AS instead,
Source/RenderPass.cpp:808-888).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from vri_tpu.config import RenderConfig, SceneLimits
from vri_tpu.hydra.material import MaterialDesc, default_material
from vri_tpu.ops import texture as texture_mod

log = logging.getLogger("vri_tpu")


@flax.struct.dataclass
class SceneBuffers:
    """Packed scene, fully device-resident. Shapes are padded capacities;
    live element counts are device scalars used for masking."""

    # geometry pools (object space).  Two layouts:
    #   flat  (vertex_proto/tri_proto None): positions/tri_uv/tri_face are
    #         per-EXPANDED-vertex/face — every instance owns its copies.
    #   proto (shared-prototype instancing): positions (Vp,3) / tri_uv
    #         (Fp,3,2) / tri_face (Fp,) are PROTOTYPE pools packed once;
    #         vertex_proto/tri_proto map the expanded index space onto
    #         them.  A 10k-instance stage with a 1k-vert prototype packs
    #         1k verts of geometry + integer index arrays (the reference
    #         analog: per-draw-item metadata over shared buffers,
    #         Include/ResourceRegistry.h:30-36).
    positions: jnp.ndarray          # (V|Vp, 3) f32
    vertex_instance: jnp.ndarray    # (V,)  i32
    tri_vertices: jnp.ndarray       # (F, 3) i32 — global EXPANDED vert ids
    tri_uv: jnp.ndarray             # (F|Fp, 3, 2) f32 per-corner st
    tri_instance: jnp.ndarray       # (F,)  i32
    tri_face: jnp.ndarray           # (F|Fp,) i32 authored-face id
    # instances (the DrawItemMetaData analog)
    instance_transform: jnp.ndarray  # (I, 4, 4) f32 object->world
    instance_material: jnp.ndarray   # (I,) i32
    instance_face_offset: jnp.ndarray  # (I,) i32
    instance_face_count: jnp.ndarray   # (I,) i32
    instance_aabb_lo: jnp.ndarray    # (I, 3) f32 world-space AABB
    instance_aabb_hi: jnp.ndarray    # (I, 3) f32
    # materials
    mat_base_color: jnp.ndarray      # (M, 3) f32
    mat_emissive: jnp.ndarray        # (M, 3) f32
    mat_roughness: jnp.ndarray       # (M,) f32
    mat_metallic: jnp.ndarray        # (M,) f32
    mat_texture: jnp.ndarray         # (M,) i32 texture slot or -1
    textures: jnp.ndarray            # (S, T, T, 4) f32 RGBA
    # lights
    light_position: jnp.ndarray      # (L, 3) f32 (direction TO a distant light)
    light_color: jnp.ndarray         # (L, 3) f32
    light_intensity: jnp.ndarray     # (L,) f32
    light_type: jnp.ndarray          # (L,) i32 — 0 point, 1 distant
    sky_color: jnp.ndarray           # (3,) f32 — DomeLight ambient term
    # live counts (device scalars — masking, not shapes)
    num_vertices: jnp.ndarray        # () i32
    num_faces: jnp.ndarray           # () i32
    num_instances: jnp.ndarray       # () i32
    num_lights: jnp.ndarray         # () i32
    #: (M,) f32 alpha-cutout threshold per material (0 = opaque)
    mat_cutoff: Optional[jnp.ndarray] = None
    #: precomputed mip pyramid (ops/texture.MipAtlas) — scene-static, built
    #: once at commit so jitted frames never rebuild the reduction chain
    mip_atlas: Optional[object] = None
    #: (V,) i32 expanded-vertex -> prototype-vertex (None = flat layout)
    vertex_proto: Optional[jnp.ndarray] = None
    #: (F,) i32 expanded-face -> prototype-face (None = flat layout)
    tri_proto: Optional[jnp.ndarray] = None
    #: (I,) bool — USD doubleSided per instance (None = all two-sided).
    #: Single-sided instances backface-cull in every visibility path
    #: (frame._cull_sign); the reference ignores doubleSided
    #: (VK_CULL_MODE_NONE, Common.cpp:333) — we follow the USD spec.
    instance_double_sided: Optional[jnp.ndarray] = None
    # Discrete LOD chains (None = no LOD packed).  The face pools hold
    # [base faces of all instances | LOD faces of all instances | pad];
    # ``num_faces`` stays the BASE count so the SDF build / BVH / brute
    # paths see full-rate geometry untouched, while primary visibility
    # passes ``num_faces_total`` plus a per-face mask from
    # ops/lod.select_lod.  LOD triangles reference a SUBSET of the base
    # vertex pool (QEM subset placement) so no vertex grows.
    #: (F,) i32 LOD level of each face (0 = full geometry)
    tri_lod: Optional[jnp.ndarray] = None
    #: (I, L+1) f32 object-space geometric deviation per level (inf = absent)
    instance_lod_error: Optional[jnp.ndarray] = None
    #: () i32 face count including LOD levels
    num_faces_total: Optional[jnp.ndarray] = None
    #: STATIC length of the base-face prefix of the expanded face pools
    #: (the packing is [base | LOD tail | pad]); lets base_view() slice a
    #: chains-free pool without a device round-trip.  None = no chains.
    base_pool_len: Optional[int] = flax.struct.field(pytree_node=False,
                                                     default=None)

    def base_view(self) -> "SceneBuffers":
        """Chains-free view of the scene: the expanded face pools sliced
        to the base-geometry prefix, for consumers whose cost scales
        with the POOL rather than the live count — the SDF builder's
        pair emission allocates ``mult * pool`` rows, and the
        LOD-expanded city pool (~2.7M slots) made it allocate ~50M-pair
        arrays and crash the TPU worker (VERDICT r4 #6; the workaround
        previously lived in tools/bench_scale.py).  The raster keeps the
        full pool (LOD selection needs the chains); SDF / BVH / brute
        consume this view.  Zero-copy semantics are XLA's problem — the
        slices are static prefixes."""
        if self.tri_lod is None or self.base_pool_len is None:
            return self
        n = self.base_pool_len
        return self.replace(
            tri_vertices=self.tri_vertices[:n],
            tri_instance=self.tri_instance[:n],
            tri_uv=(self.tri_uv[:n] if self.tri_proto is None
                    else self.tri_uv),
            tri_face=(self.tri_face[:n] if self.tri_proto is None
                      else self.tri_face),
            tri_proto=(None if self.tri_proto is None
                       else self.tri_proto[:n]),
            tri_lod=None, instance_lod_error=None, num_faces_total=None,
            base_pool_len=None)


def bake_world(scene: SceneBuffers) -> jnp.ndarray:
    """Derive world-space vertex positions: gather each vertex's instance
    matrix and transform.  One fused gather + (V,3)x(3,3) contraction — this
    is the TPU replacement for the per-draw push-constant MVP of the
    reference's visibility pass (Source/RenderPass.cpp:642-664).  Under
    shared-prototype instancing the object-space position comes through
    the vertex_proto indirection (one extra 3-wide row gather)."""
    m = scene.instance_transform[scene.vertex_instance]       # (V, 4, 4)
    pos = scene.positions if scene.vertex_proto is None \
        else scene.positions[scene.vertex_proto]
    p = jnp.einsum("vij,vj->vi", m[:, :3, :3], pos,
                   preferred_element_type=jnp.float32) + m[:, :3, 3]
    return p


@dataclasses.dataclass
class MeshRecord:
    """Host-side synced mesh (one reference 'draw item request',
    ResourceRegistry.cpp:501-521)."""

    path: str
    points: np.ndarray          # (P, 3) f32 object space
    tris: np.ndarray            # (T, 3) i32 local vertex ids
    tri_face: np.ndarray        # (T,)  i32
    uvs: np.ndarray             # (T, 3, 2) f32
    transform: np.ndarray       # (4, 4) f32
    material_path: Optional[str]
    extent: np.ndarray          # (2, 3) f32 object-space AABB
    #: records sharing a prototype key share geometry in the packed pools
    #: (points/tris/uvs must be the same arrays); None = own geometry
    proto: Optional[str] = None
    #: USD doubleSided semantics (spec default: single-sided).  Direct
    #: (non-USD) constructions default to two-sided — the reference's
    #: VK_CULL_MODE_NONE behavior (Common.cpp:333); the Hydra delegate
    #: sets the authored value so single-sided meshes backface-cull.
    double_sided: bool = True


@dataclasses.dataclass
class LightRecord:
    path: str
    position: np.ndarray    # position (point) or unit direction TO the light
    color: np.ndarray
    intensity: float
    kind: int = 0           # 0 point, 1 distant (directional), 2 dome


class ResourceRegistry:
    """Accumulates synced prims and commits them to device arrays."""

    def __init__(self, config: RenderConfig):
        self.config = config
        self.limits: SceneLimits = config.limits
        self._meshes: Dict[str, MeshRecord] = {}
        self._materials: Dict[str, MaterialDesc] = {}
        self._material_hash_to_slot: Dict[int, int] = {}
        self._lights: Dict[str, LightRecord] = {}
        self._order: List[str] = []          # stable instance ordering
        self._geometry_dirty = True
        self._transforms_dirty = True
        self._materials_dirty = True
        self._lights_dirty = True
        self._scene: Optional[SceneBuffers] = None
        # bounded-update bookkeeping (ops/sdf_build.update_cascades): which
        # instances moved since the last commit, and what the last commit
        # amounted to ("full" | "transforms" | "lights" | "none")
        self._dirty_paths: set = set()
        self.last_update: Dict = {"kind": "none"}
        # LOD chain cache: geometry content hash -> [(tri_ids, vmap, err)]
        self._lod_cache: Dict[bytes, list] = {}

    # -- push API (mirrors PushDrawItemRequest / PushMaterialRequest) -------

    def push_mesh(self, rec: MeshRecord) -> None:
        if rec.path not in self._meshes:
            self._order.append(rec.path)
            self._geometry_dirty = True
        else:
            old = self._meshes[rec.path]
            # any per-face array difference requires a repack: uvs/tri_face
            # feed the packed tri_uv/tri_face pools, so a primvar-only edit
            # (DirtyBits.PRIMVAR resync) must also mark geometry dirty
            def _same(a, b):
                return a is b or (a.shape == b.shape and np.array_equal(a, b))
            if not (_same(old.points, rec.points)
                    and _same(old.tris, rec.tris)
                    and _same(old.uvs, rec.uvs)
                    and _same(old.tri_face, rec.tri_face)
                    and old.proto == rec.proto):
                self._geometry_dirty = True
            if old.material_path != rec.material_path:
                self._geometry_dirty = True
            if not np.array_equal(old.transform, rec.transform):
                self._dirty_paths.add(rec.path)
        self._transforms_dirty = True
        self._meshes[rec.path] = rec

    def update_transform(self, path: str, transform: np.ndarray) -> None:
        rec = self._meshes.get(path)
        if rec is not None:
            if not np.array_equal(rec.transform, transform):
                self._dirty_paths.add(path)
            rec.transform = np.asarray(transform, np.float32)
            self._transforms_dirty = True

    def remove_mesh(self, path: str) -> None:
        if path in self._meshes:
            del self._meshes[path]
            self._order.remove(path)
            self._geometry_dirty = True

    def push_material(self, desc: MaterialDesc) -> None:
        old = self._materials.get(desc.path)
        if old is None or old.content_hash() != desc.content_hash():
            self._materials_dirty = True
        self._materials[desc.path] = desc

    def push_light(self, rec: LightRecord) -> None:
        self._lights[rec.path] = rec
        self._lights_dirty = True

    # -- commit -------------------------------------------------------------

    def commit(self) -> SceneBuffers:
        """Pack host records into (padded) pools and upload what changed.

        The reference's `_Commit` drains its queues into device buffers and
        rebuilds descriptors (ResourceRegistry.cpp:251-459); here a full
        repack happens only when topology/geometry changed — transform or
        light edits update just those arrays.
        """
        if self._scene is None or self._geometry_dirty or self._materials_dirty:
            self._scene = self._full_pack()
            self.last_update = {"kind": "full"}
        else:
            kind = "none"
            if self._transforms_dirty:
                # snapshot moved instances' OLD world AABBs before the
                # replace — the bounded SDF update must dirty both the old
                # and the new positions (ops/sdf_build.update_cascades)
                ids = sorted(self._order.index(p) for p in self._dirty_paths
                             if p in self._meshes)
                old_lo = np.asarray(self._scene.instance_aabb_lo)[ids]
                old_hi = np.asarray(self._scene.instance_aabb_hi)[ids]
                tr, lo, hi = self._pack_transforms()
                self._scene = self._scene.replace(
                    instance_transform=jnp.asarray(tr),
                    instance_aabb_lo=jnp.asarray(lo),
                    instance_aabb_hi=jnp.asarray(hi))
                kind = "transforms"
                self.last_update = {
                    "kind": kind, "dirty_instances": ids,
                    "old_lo": old_lo, "old_hi": old_hi,
                    "new_lo": np.asarray(lo)[ids],
                    "new_hi": np.asarray(hi)[ids]}
            if self._lights_dirty:
                lp, lc, li, lt, nl, sky = self._pack_lights()
                self._scene = self._scene.replace(
                    light_position=jnp.asarray(lp), light_color=jnp.asarray(lc),
                    light_intensity=jnp.asarray(li),
                    light_type=jnp.asarray(lt),
                    num_lights=jnp.asarray(nl, jnp.int32),
                    sky_color=jnp.asarray(sky))
                if kind == "none":
                    self.last_update = {"kind": "lights"}
            if kind == "none" and not self._lights_dirty:
                self.last_update = {"kind": "none"}
        self._geometry_dirty = self._transforms_dirty = False
        self._materials_dirty = self._lights_dirty = False
        self._dirty_paths.clear()
        return self._scene

    # -- packing internals ---------------------------------------------------

    def _material_slots(self) -> Dict[Optional[str], int]:
        """Assign material slots, dedup by content hash (reference:
        TryFindDeviceMaterialIndex, ResourceRegistry.cpp:347-357)."""
        slots: Dict[Optional[str], int] = {None: 0}
        packed: List[MaterialDesc] = [default_material()]
        hash_to_slot: Dict[int, int] = {packed[0].content_hash(): 0}
        for path in sorted(self._materials):
            desc = self._materials[path]
            h = desc.content_hash()
            if h in hash_to_slot:
                slots[path] = hash_to_slot[h]
            else:
                if len(packed) >= self.limits.max_materials:
                    log.warning("material table full (%d); %s -> default",
                                self.limits.max_materials, path)
                    slots[path] = 0
                    continue
                hash_to_slot[h] = len(packed)
                slots[path] = len(packed)
                packed.append(desc)
        self._packed_materials = packed
        return slots

    def _pack_transforms(self):
        n = len(self._order)
        cap = max(_round_up(n, 8), 8)
        tr = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
        lo = np.zeros((cap, 3), np.float32)
        hi = np.zeros((cap, 3), np.float32)
        for i, path in enumerate(self._order):
            rec = self._meshes[path]
            tr[i] = rec.transform
            corners = _aabb_corners(rec.extent)
            wc = corners @ rec.transform[:3, :3].T + rec.transform[:3, 3]
            lo[i], hi[i] = wc.min(0), wc.max(0)
        return tr, lo, hi

    def _pack_lights(self):
        # exact capacity: every padded light slot costs a full SDF shadow
        # march per pixel in the lightloop, so no padding quantum here
        # DomeLights become the ambient sky term (UsdLux standard schema;
        # the reference's sky is a constant in the shader) instead of a
        # shadow-marched light slot
        direct = {p: r for p, r in self._lights.items() if r.kind != 2}
        sky = np.asarray((0.02, 0.025, 0.035), np.float32)  # default sky
        domes = [r for r in self._lights.values() if r.kind == 2]
        if domes:
            sky = np.sum([r.color * r.intensity for r in domes], axis=0) \
                .astype(np.float32)
        n = len(direct)
        cap = max(n, 1)
        lp = np.zeros((cap, 3), np.float32)
        lc = np.ones((cap, 3), np.float32)
        li = np.zeros((cap,), np.float32)
        lt = np.zeros((cap,), np.int32)
        for i, path in enumerate(sorted(direct)):
            rec = direct[path]
            lp[i], lc[i], li[i] = rec.position, rec.color, rec.intensity
            lt[i] = rec.kind
        return lp, lc, li, lt, n, sky

    def _lod_chain(self, rec: MeshRecord) -> list:
        """Discrete LOD chain for one mesh: [(src_tri_ids, vmap, err), ...]
        for levels 1..lod_levels.  Levels chain off the previous level's
        output (composed vertex maps keep everything in the ORIGINAL
        index space — QEM subset placement, native/src/vri_lod.cpp) so
        the cost stays linear in the mesh size; the deviation estimate is
        always measured against the original surface.  Cached by
        geometry content hash across commits."""
        import hashlib

        from vri_tpu.runtime import native as native_rt

        cfg = self.config
        nt = len(rec.tris)
        key = hashlib.blake2b(
            rec.points.tobytes() + rec.tris.tobytes()
            + bytes([cfg.lod_levels]) + str(cfg.lod_ratio).encode(),
            digest_size=16).digest()
        hit = self._lod_cache.get(key)
        if hit is not None:
            return hit
        chain = []
        tris_cur = np.ascontiguousarray(rec.tris, np.int32)
        ids_cur = np.arange(nt, dtype=np.int32)
        vmap_c = np.arange(len(rec.points), dtype=np.int32)
        for lvl in range(1, cfg.lod_levels + 1):
            target = max(int(round(nt * cfg.lod_ratio ** lvl)), 16)
            if len(ids_cur) <= max(target, 24):
                break
            ids_rel, vmap_l, _ = native_rt.simplify_qem(
                rec.points, tris_cur, target)
            if len(ids_rel) >= 0.9 * len(ids_cur):
                break                      # lock-bound: no real progress
            ids_cur = ids_cur[ids_rel]
            vmap_c = vmap_l[vmap_c]
            tris_cur = vmap_l[tris_cur][ids_rel]
            err = native_rt._deviation(
                np.ascontiguousarray(rec.points, np.float32),
                np.ascontiguousarray(rec.tris, np.int32), vmap_c)
            chain.append((ids_cur.copy(), vmap_c.copy(), float(err)))
        self._lod_cache[key] = chain
        return chain

    def _full_pack(self) -> SceneBuffers:
        lim = self.limits
        slots = self._material_slots()

        total_v = sum(len(m.points) for m in (self._meshes[p] for p in self._order))
        total_f = sum(len(m.tris) for m in (self._meshes[p] for p in self._order))

        # LOD chains per unique geometry (cached across commits); the whole
        # feature degrades to off when the chains would blow the face cap
        n_levels = self.config.lod_levels
        lod_chains: Dict[str, list] = {}
        lod_f_expanded = 0
        if n_levels > 0:
            proto_of0 = {p: (self._meshes[p].proto or p) for p in self._order}
            for p in self._order:
                k = proto_of0[p]
                if k not in lod_chains:
                    rec = self._meshes[p]
                    lod_chains[k] = (
                        self._lod_chain(rec)
                        if len(rec.tris) >= self.config.lod_min_faces else [])
                lod_f_expanded += sum(len(ids) for ids, _, _ in lod_chains[k])
            if total_f + lod_f_expanded > lim.max_faces:
                log.warning(
                    "LOD chains (%d faces) would exceed the face cap %d; "
                    "packing without LOD", total_f + lod_f_expanded,
                    lim.max_faces)
                lod_chains = {}
                lod_f_expanded = 0
                n_levels = 0
            elif lod_f_expanded == 0:     # every mesh below lod_min_faces
                lod_chains = {}
                n_levels = 0

        V = lim.padded_vertices(total_v)
        F = lim.padded_faces(total_f + lod_f_expanded)
        if total_v > V or total_f + lod_f_expanded > F:
            raise ValueError(
                f"scene exceeds limits: {total_v} verts (cap {V}), "
                f"{total_f} faces (cap {F})")

        n_inst = len(self._order)
        icap = max(_round_up(max(n_inst, 1), 8), 8)
        if n_inst > lim.max_instances:
            raise ValueError(f"{n_inst} instances exceed cap {lim.max_instances}")
        inst_material = np.zeros((icap,), np.int32)
        inst_face_offset = np.zeros((icap,), np.int32)
        inst_face_count = np.zeros((icap,), np.int32)
        inst_double_sided = np.ones((icap,), np.bool_)

        # prototype dedup: records sharing a proto key pack geometry ONCE
        # (reference analog: per-item metadata over shared buffers,
        # Include/ResourceRegistry.h:30-36); unique-geometry scenes take
        # the flat layout with no indirection arrays at all
        proto_of = {p: (self._meshes[p].proto or p) for p in self._order}
        proto_keys = list(dict.fromkeys(proto_of.values()))
        shared = len(proto_keys) < n_inst

        tri_lod = np.zeros((F,), np.int32) if n_levels else None
        lod_err = (np.full((icap, n_levels + 1), np.inf, np.float32)
                   if n_levels else None)
        if lod_err is not None:
            lod_err[:, 0] = 0.0

        if not shared:
            positions = np.zeros((V, 3), np.float32)
            vertex_instance = np.zeros((V,), np.int32)
            tri_vertices = np.zeros((F, 3), np.int32)
            tri_uv = np.zeros((F, 3, 2), np.float32)
            tri_instance = np.zeros((F,), np.int32)
            tri_face = np.zeros((F,), np.int32)
            vertex_proto = tri_proto = None

            voff = foff = 0
            inst_voff = np.zeros((icap,), np.int64)
            for i, path in enumerate(self._order):
                rec = self._meshes[path]
                nv, nf = len(rec.points), len(rec.tris)
                positions[voff:voff + nv] = rec.points
                vertex_instance[voff:voff + nv] = i
                tri_vertices[foff:foff + nf] = rec.tris + voff
                tri_uv[foff:foff + nf] = rec.uvs
                tri_instance[foff:foff + nf] = i
                tri_face[foff:foff + nf] = rec.tri_face
                inst_material[i] = slots.get(rec.material_path, 0)
                inst_double_sided[i] = rec.double_sided
                inst_face_offset[i] = foff
                inst_face_count[i] = nf
                inst_voff[i] = voff
                voff += nv
                foff += nf
            # padding faces are degenerate (all-zero verts of instance 0)

            # LOD tail: decimated levels appended AFTER every base face so
            # num_faces (= total_f) keeps the SDF/BVH/brute paths on base
            # geometry; LOD faces reference base vertices (subset placement)
            for i, path in enumerate(self._order):
                rec = self._meshes[path]
                for lvl, (ids, vmap, err) in enumerate(
                        lod_chains.get(proto_of[path], []), start=1):
                    nfl = len(ids)
                    tri_vertices[foff:foff + nfl] = \
                        vmap[rec.tris[ids]] + inst_voff[i]
                    tri_uv[foff:foff + nfl] = rec.uvs[ids]
                    tri_face[foff:foff + nfl] = rec.tri_face[ids]
                    tri_instance[foff:foff + nfl] = i
                    tri_lod[foff:foff + nfl] = lvl
                    lod_err[i, lvl] = err
                    foff += nfl
        else:
            # prototype pools (packed once per unique proto); LOD levels of
            # each proto are appended to the proto-level face pools and
            # expanded per instance exactly like base faces
            first = {}
            for p in self._order:
                first.setdefault(proto_of[p], self._meshes[p])
            pv_off, pf_off, pf_lod_off = {}, {}, {}
            vp = fp_ = 0
            for k in proto_keys:
                rec = first[k]
                pv_off[k] = vp
                pf_off[k] = fp_
                vp += len(rec.points)
                fp_ += len(rec.tris)
            for k in proto_keys:           # LOD proto faces after all base
                offs = []
                for ids, _, _ in lod_chains.get(k, []):
                    offs.append(fp_)
                    fp_ += len(ids)
                pf_lod_off[k] = offs
            Vp = max(_round_up(vp, lim.pad), lim.pad)
            Fp = max(_round_up(fp_, lim.pad), lim.pad)
            positions = np.zeros((Vp, 3), np.float32)
            tri_uv = np.zeros((Fp, 3, 2), np.float32)
            tri_face = np.zeros((Fp,), np.int32)
            proto_tris = np.zeros((Fp, 3), np.int32)   # proto-local ids
            for k in proto_keys:
                rec = first[k]
                vo, fo = pv_off[k], pf_off[k]
                positions[vo:vo + len(rec.points)] = rec.points
                tri_uv[fo:fo + len(rec.tris)] = rec.uvs
                tri_face[fo:fo + len(rec.tris)] = rec.tri_face
                proto_tris[fo:fo + len(rec.tris)] = rec.tris
                for off, (ids, vmap, _err) in zip(
                        pf_lod_off[k], lod_chains.get(k, [])):
                    tri_uv[off:off + len(ids)] = rec.uvs[ids]
                    tri_face[off:off + len(ids)] = rec.tri_face[ids]
                    proto_tris[off:off + len(ids)] = vmap[rec.tris[ids]]

            vertex_instance = np.zeros((V,), np.int32)
            vertex_proto = np.zeros((V,), np.int32)
            tri_vertices = np.zeros((F, 3), np.int32)
            tri_instance = np.zeros((F,), np.int32)
            tri_proto = np.zeros((F,), np.int32)
            voff = foff = 0
            inst_voff = np.zeros((icap,), np.int64)
            for i, path in enumerate(self._order):
                rec = self._meshes[path]
                k = proto_of[path]
                nv, nf = len(rec.points), len(rec.tris)
                vertex_instance[voff:voff + nv] = i
                vertex_proto[voff:voff + nv] = np.arange(
                    pv_off[k], pv_off[k] + nv, dtype=np.int32)
                tri_vertices[foff:foff + nf] = \
                    proto_tris[pf_off[k]:pf_off[k] + nf] + voff
                tri_instance[foff:foff + nf] = i
                tri_proto[foff:foff + nf] = np.arange(
                    pf_off[k], pf_off[k] + nf, dtype=np.int32)
                inst_material[i] = slots.get(rec.material_path, 0)
                inst_double_sided[i] = rec.double_sided
                inst_face_offset[i] = foff
                inst_face_count[i] = nf
                inst_voff[i] = voff
                voff += nv
                foff += nf
            for i, path in enumerate(self._order):   # expanded LOD tail
                k = proto_of[path]
                for lvl, (off, (ids, vmap, err)) in enumerate(
                        zip(pf_lod_off[k], lod_chains.get(k, [])), start=1):
                    nfl = len(ids)
                    tri_vertices[foff:foff + nfl] = \
                        proto_tris[off:off + nfl] + inst_voff[i]
                    tri_instance[foff:foff + nfl] = i
                    tri_proto[foff:foff + nfl] = np.arange(
                        off, off + nfl, dtype=np.int32)
                    tri_lod[foff:foff + nfl] = lvl
                    lod_err[i, lvl] = err
                    foff += nfl
            log.info("proto pack: %d instances share %d prototypes "
                     "(%d proto verts for %d expanded)",
                     n_inst, len(proto_keys), vp, total_v)

        transforms, aabb_lo, aabb_hi = self._pack_transforms()
        assert transforms.shape[0] == icap

        mats = self._packed_materials
        mcap = max(_round_up(len(mats), 8), 8)
        base = np.zeros((mcap, 3), np.float32)
        emis = np.zeros((mcap, 3), np.float32)
        rough = np.full((mcap,), 0.8, np.float32)
        metal = np.zeros((mcap,), np.float32)
        cutoff = np.zeros((mcap,), np.float32)
        tex_slot = np.full((mcap,), -1, np.int32)
        tex_list: List[np.ndarray] = []
        for i, m in enumerate(mats):
            base[i], emis[i] = m.base_color, m.emissive
            rough[i], metal[i] = m.roughness, m.metallic
            cutoff[i] = getattr(m, "opacity_threshold", 0.0)
            if m.texture is not None:
                tex = m.texture.astype(np.float32)
                if tex.shape[-1] == 3:      # RGB source: alpha = 1
                    tex = np.concatenate(
                        [tex, np.ones(tex.shape[:-1] + (1,), np.float32)],
                        axis=-1)
                tex_slot[i] = len(tex_list)
                tex_list.append(tex)
        T = lim.texture_res
        if tex_list:
            textures = np.stack(tex_list)
        else:
            # zero-size slot dim: a STATIC signal that lets the resolve
            # skip texture sampling entirely (8 gather taps/pixel saved)
            textures = np.ones((0, T, T, 4), np.float32)

        lp, lc, li, lt, nl, sky = self._pack_lights()

        scene = SceneBuffers(
            positions=jnp.asarray(positions),
            vertex_instance=jnp.asarray(vertex_instance),
            tri_vertices=jnp.asarray(tri_vertices),
            tri_uv=jnp.asarray(tri_uv),
            tri_instance=jnp.asarray(tri_instance),
            tri_face=jnp.asarray(tri_face),
            instance_transform=jnp.asarray(transforms),
            instance_material=jnp.asarray(inst_material),
            instance_double_sided=jnp.asarray(inst_double_sided),
            instance_face_offset=jnp.asarray(inst_face_offset),
            instance_face_count=jnp.asarray(inst_face_count),
            instance_aabb_lo=jnp.asarray(aabb_lo),
            instance_aabb_hi=jnp.asarray(aabb_hi),
            mat_base_color=jnp.asarray(base),
            mat_emissive=jnp.asarray(emis),
            mat_roughness=jnp.asarray(rough),
            mat_metallic=jnp.asarray(metal),
            mat_texture=jnp.asarray(tex_slot),
            mat_cutoff=jnp.asarray(cutoff),
            textures=jnp.asarray(textures),
            mip_atlas=texture_mod.build_mip_atlas(jnp.asarray(textures)),
            light_position=jnp.asarray(lp),
            light_color=jnp.asarray(lc),
            light_intensity=jnp.asarray(li),
            light_type=jnp.asarray(lt),
            num_vertices=jnp.asarray(total_v, jnp.int32),
            num_faces=jnp.asarray(total_f, jnp.int32),
            num_instances=jnp.asarray(n_inst, jnp.int32),
            num_lights=jnp.asarray(nl, jnp.int32),
            sky_color=jnp.asarray(sky),
            vertex_proto=(None if vertex_proto is None
                          else jnp.asarray(vertex_proto)),
            tri_proto=(None if tri_proto is None
                       else jnp.asarray(tri_proto)),
            tri_lod=(None if tri_lod is None else jnp.asarray(tri_lod)),
            instance_lod_error=(None if lod_err is None
                                else jnp.asarray(lod_err)),
            num_faces_total=(None if tri_lod is None else jnp.asarray(
                total_f + lod_f_expanded, jnp.int32)),
            base_pool_len=(None if tri_lod is None
                           else min(F, _round_up(total_f, lim.pad))),
        )
        log.info("registry commit: %d instances, %d verts (cap %d), "
                 "%d tris (cap %d), %d materials, %d textures, %d lights",
                 n_inst, total_v, V, total_f, F, len(mats), len(tex_list), nl)
        return scene

    # -- stats (reference: ImGui VRAM display, Main.cpp:231-237) ------------

    def device_bytes(self) -> int:
        if self._scene is None:
            return 0
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(self._scene))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _aabb_corners(extent: np.ndarray) -> np.ndarray:
    lo, hi = extent
    return np.array([[x, y, z] for x in (lo[0], hi[0])
                     for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                    np.float32)
