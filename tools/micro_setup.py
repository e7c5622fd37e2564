"""triangle_setup_clipped micro: take_along_axis corner rotation vs
roll-select (3-way where over rolled corners; constant-table source
barycentrics).  take_along_axis lowers to a per-element gather chain."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp

from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
TESS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
scene = d.sync()
world = bake_world(scene)
vp0 = jnp.asarray(d.camera.view_proj)
print("faces:", int(scene.num_faces))


def setup_roll(world_verts, tri_vertices, num_faces, view_proj,
               height, width, w_eps=1e-4, extra_cap=None):
    f = tri_vertices.shape[0]
    v = world_verts
    clip = jnp.concatenate([v, jnp.ones_like(v[:, :1])], axis=1) @ view_proj.T
    c = clip[tri_vertices]

    w = c[..., 3]
    inside = w > w_eps
    n_in = inside.sum(axis=1)
    idx_in = jnp.argmax(inside, axis=1)
    idx_out = jnp.argmax(~inside, axis=1)
    rot = jnp.where(n_in == 1, idx_in,
                    jnp.where(n_in == 2, (idx_out + 1) % 3, 0))

    # roll-select rotation: rot==1 -> [1,2,0], rot==2 -> [2,0,1]
    sel = rot[:, None, None]
    r1 = jnp.roll(c, -1, axis=1)
    r2 = jnp.roll(c, -2, axis=1)
    cr = jnp.where(sel == 1, r1, jnp.where(sel == 2, r2, c))
    # constant-table source barycentrics per rotation
    bt = jnp.asarray([[[0., 0.], [1., 0.], [0., 1.]],
                      [[1., 0.], [0., 1.], [0., 0.]],
                      [[0., 1.], [0., 0.], [1., 0.]]], jnp.float32)
    br = jnp.where(sel == 1, bt[1], jnp.where(sel == 2, bt[2], bt[0]))
    br = jnp.broadcast_to(br, (f, 3, 2))
    wr = cr[..., 3]

    def lerp_to_plane(pa, pb, wa, wb):
        t = (w_eps - wa) / jnp.where(jnp.abs(wb - wa) > 1e-20, wb - wa, 1.0)
        t = jnp.clip(t, 0.0, 1.0)[..., None]
        return pa + (pb - pa) * t

    A, B, C = cr[:, 0], cr[:, 1], cr[:, 2]
    bA, bB, bC = br[:, 0], br[:, 1], br[:, 2]
    wA, wB, wC = wr[:, 0], wr[:, 1], wr[:, 2]
    posb_A = jnp.concatenate([A, bA], -1)
    posb_B = jnp.concatenate([B, bB], -1)
    posb_C = jnp.concatenate([C, bC], -1)
    P_ab = lerp_to_plane(posb_A, posb_B, wA, wB)
    P_ac = lerp_to_plane(posb_A, posb_C, wA, wC)
    P_bc = lerp_to_plane(posb_B, posb_C, wB, wC)

    full = jnp.stack([posb_A, posb_B, posb_C], axis=1)
    one_in = jnp.stack([posb_A, P_ab, P_ac], axis=1)
    two_in_1 = jnp.stack([posb_A, posb_B, P_bc], axis=1)
    two_in_2 = jnp.stack([posb_A, P_bc, P_ac], axis=1)

    sel3 = n_in[:, None, None]
    out1 = jnp.where(sel3 == 3, full,
                     jnp.where(sel3 == 2, two_in_1,
                               jnp.where(sel3 == 1, one_in, full)))
    out2 = two_in_2
    valid1 = (n_in >= 1)
    valid2 = (n_in == 2)

    in_range = jnp.arange(f) < num_faces
    clip_overflow = jnp.int32(0)
    live2 = valid2 & in_range
    idx2 = jnp.nonzero(live2, size=extra_cap, fill_value=f)[0].astype(jnp.int32)
    ok2 = idx2 < f
    safe2 = jnp.minimum(idx2, f - 1)
    tri6 = jnp.concatenate([out1, out2[safe2]], axis=0)
    valid = jnp.concatenate([valid1 & in_range, ok2])
    src_id = jnp.concatenate([jnp.arange(f, dtype=jnp.int32), safe2])
    clip_overflow = jnp.maximum(
        jnp.sum(live2.astype(jnp.int32)) - extra_cap, 0)

    cpos = tri6[..., :4]
    bary = tri6[..., 4:6]
    wv = jnp.maximum(cpos[..., 3], w_eps)
    inv_w = 1.0 / wv
    ndc = cpos[..., :3] * inv_w[..., None]
    tx = (ndc[..., 0] * 0.5 + 0.5) * width
    ty = (0.5 - ndc[..., 1] * 0.5) * height
    tz = ndc[..., 2]
    area = ((tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0])
            - (ty[:, 1] - ty[:, 0]) * (tx[:, 2] - tx[:, 0]))
    valid &= jnp.abs(area) > 1e-12
    return (tx, ty, tz, inv_w, bary[..., 0], bary[..., 1], src_id, valid,
            clip_overflow)


extra = max(scene.tri_vertices.shape[0] // 16, 256)

# parity check
o1 = jax.jit(lambda vp: R.triangle_setup_clipped(
    world, scene.tri_vertices, scene.num_faces, vp, H, W,
    extra_cap=extra))(vp0)
o2 = jax.jit(lambda vp: setup_roll(
    world, scene.tri_vertices, scene.num_faces, vp, H, W,
    extra_cap=extra))(vp0)
for i, (a, b) in enumerate(zip(o1, o2)):
    a, b = np.asarray(a), np.asarray(b)
    if a.dtype == bool or a.dtype == np.int32:
        assert (a == b).all(), f"field {i} mismatch"
    else:
        m = np.abs(a - b).max()
        assert m == 0.0, f"field {i} max abs diff {m}"
print("parity: exact")


def bench(label, fn, iters=30):
    jfn = jax.jit(fn)
    _ = jax.device_get(jfn(vp0)[0])

    @jax.jit
    def loop(v0):
        def body(i, v):
            out = jfn(vp0 + 0.0 * v)
            return v + 0.0 * (out[0].sum() + out[2].sum() + out[3].sum()
                              + out[4].sum() + out[5].sum())
        return jax.lax.fori_loop(0, iters, body, v0)

    _ = np.asarray(loop(jnp.float32(0)))
    t0 = time.time()
    _ = np.asarray(loop(jnp.float32(0)))
    print(f"{label:22s} {(time.time()-t0-0.04)/iters*1e3:7.2f} ms")


bench("take_along_axis", lambda vp: R.triangle_setup_clipped(
    world, scene.tri_vertices, scene.num_faces, vp, H, W, extra_cap=extra))
bench("roll-select", lambda vp: setup_roll(
    world, scene.tri_vertices, scene.num_faces, vp, H, W, extra_cap=extra))
