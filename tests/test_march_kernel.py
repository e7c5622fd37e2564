"""Pallas march kernel vs the XLA trilinear march (ops/sdf_trace.py).

The kernel is the approximate (occlusion/GI) tier: hits at voxel precision
from the coarse-cell tables.  Parity requirements: conservative (no
punch-through past surfaces the reference hits), high hit agreement, and
sub-voxel-scale t agreement away from grazing rays.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.ops import march_kernel, sdf_trace
from vri_tpu.renderer import Renderer
from vri_tpu.usd import scenes

CFG = SDFConfig(num_cascades=2, cascade_resolution=16, brick_size=8,
                max_bricks=4096, base_voxel_size=0.15, truncation_voxels=3.0,
                max_triangles_per_brick=16, march_max_steps=48)


@pytest.fixture(scope="module")
def cornell_cascades():
    r = Renderer(RenderConfig(width=32, height=32, sdf=CFG))
    r.load_stage(scenes.cornell_box())
    return r.ensure_cascades()


def _rays(cascades, m=1024, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.85, 0.85, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # production rays start biased off surfaces; drop origins inside the
    # surface voxel band
    dist = np.asarray(sdf_trace._sample(cascades, jnp.asarray(o), CFG)[0])
    keep = dist > 1.2 * CFG.base_voxel_size
    return jnp.asarray(o[keep]), jnp.asarray(d[keep])


class TestMarchKernelParity:
    def test_supports(self):
        assert march_kernel.supports(CFG)
        assert not march_kernel.supports(
            SDFConfig(cascade_resolution=48))

    def test_tables_match_brick_map(self, cornell_cascades):
        """Coarse cdist==0 exactly where a cell contains surface voxels."""
        cas = cornell_cascades
        mc = np.asarray(cas.march_coarse)
        bm = np.asarray(cas.brick_map)
        r = CFG.cascade_resolution
        s = r // 16
        occ = bm >= 0
        for n in range(CFG.num_cascades):
            cell_occ = occ[n].reshape(16, s, 16, s, 16, s).any(
                axis=(1, 3, 5))
            for cz, cy, cx in [(0, 0, 0), (8, 8, 8), (15, 3, 7), (4, 12, 9)]:
                cflat = n * 4096 + (cz * 16 + cy) * 16 + cx
                # u4 packing: 8 cells per i32 word (1024 cells per row)
                word = mc[cflat >> 10, (cflat >> 3) & 127]
                cd = (word >> ((cflat & 7) * 4)) & 15
                if cell_occ[cz, cy, cx]:
                    # surface cells may be cd==0 or >0 when no *surface*
                    # voxel (occupied-but-far bricks in the apron)
                    assert cd >= 0
                else:
                    assert cd >= 1

    def test_hit_parity(self, cornell_cascades):
        cas = cornell_cascades
        o, d = _rays(cas)
        ref = sdf_trace.march(cas, o, d, t_max=10.0, config=CFG,
                              approx=True)
        ker = march_kernel.march(cas, o, d, t_max=10.0, config=CFG,
                                 max_steps=96, interpret=True,
                                 grace_voxels=0.0)
        rh, kh = np.asarray(ref.hit), np.asarray(ker.hit)
        rt, kt = np.asarray(ref.t), np.asarray(ker.t)
        assert (rh == kh).mean() > 0.95
        both = rh & kh
        # conservative: the kernel never punches through surfaces the
        # trilinear march hits (late hits beyond ~3 voxels are bugs)
        late = (kt[both] - rt[both]) > 3 * CFG.base_voxel_size
        assert late.mean() < 0.01
        # typical agreement within ~1.5 voxels (grazing-fattening tail ok)
        dt = np.abs(kt[both] - rt[both])
        assert np.median(dt) < 1.5 * CFG.base_voxel_size

    def test_payload_matches_full(self, cornell_cascades):
        cas = cornell_cascades
        o, d = _rays(cas, m=256, seed=1)
        full = march_kernel.march(cas, o, d, t_max=10.0, config=CFG,
                                  max_steps=96, interpret=True)
        occl = march_kernel.march(cas, o, d, t_max=10.0, config=CFG,
                                  max_steps=96, interpret=True,
                                  payload=False)
        np.testing.assert_array_equal(np.asarray(full.hit),
                                      np.asarray(occl.hit))
        np.testing.assert_allclose(np.asarray(full.t),
                                   np.asarray(occl.t))
        hit = np.asarray(full.hit)
        # payload recovery: hit voxels carry a live brick
        assert (np.asarray(full.brick)[hit] >= 0).all()

    def test_compact_is_exact(self, cornell_cascades):
        """march_compact == march bit-exactly (resume-by-t is lossless),
        including when the compacted buffer overflows (cleanup phase)."""
        cas = cornell_cascades
        rng = np.random.default_rng(7)
        m = 4608  # >= 4096 so the compacted path actually engages
        o = jnp.asarray(rng.uniform(-0.9, 0.9, (m, 3)).astype(np.float32))
        d = rng.normal(size=(m, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        ref = march_kernel.march(cas, o, d, t_max=10.0, config=CFG,
                                 max_steps=96, interpret=True)
        for div in (4, 64):  # 64: tail overflows the buffer -> cleanup
            cmp_ = march_kernel.march_compact(
                cas, o, d, t_max=10.0, config=CFG, max_steps=96,
                interpret=True, phase1_steps=8, compact_div=div)
            np.testing.assert_array_equal(np.asarray(ref.hit),
                                          np.asarray(cmp_.hit))
            np.testing.assert_allclose(np.asarray(ref.t),
                                       np.asarray(cmp_.t), rtol=0, atol=0)
            np.testing.assert_array_equal(np.asarray(ref.voxel),
                                          np.asarray(cmp_.voxel))

    def test_stream_is_exact(self, cornell_cascades):
        """march_stream == march bit-exactly: _march_step is shared, a
        ray's trajectory depends only on its own fields, and the per-ray
        step budget is enforced identically at service points."""
        cas = cornell_cascades
        rng = np.random.default_rng(11)
        m = 4096
        o = jnp.asarray(rng.uniform(-0.9, 0.9, (m, 3)).astype(np.float32))
        d = rng.normal(size=(m, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        ref = march_kernel.march(cas, o, d, t_max=10.0, config=CFG,
                                 max_steps=96, interpret=True)
        for q, srv in ((2, 3), (4, 2)):  # small queues so blocks engage
            st = march_kernel.march_stream(
                cas, o, d, t_max=10.0, config=CFG, max_steps=96,
                interpret=True, queue=q, service_every=srv)
            np.testing.assert_array_equal(np.asarray(ref.hit),
                                          np.asarray(st.hit))
            np.testing.assert_allclose(np.asarray(ref.t),
                                       np.asarray(st.t), rtol=0, atol=0)
            np.testing.assert_array_equal(np.asarray(ref.voxel),
                                          np.asarray(st.voxel))
            np.testing.assert_array_equal(np.asarray(ref.iterations),
                                          np.asarray(st.iterations))

    def test_stream_small_fallback(self, cornell_cascades):
        """Below 1024*queue rays march_stream must take the block path
        (queues cannot fill) and still return the exact result."""
        cas = cornell_cascades
        o, d = _rays(cas, m=256, seed=3)
        ref = march_kernel.march(cas, o, d, t_max=10.0, config=CFG,
                                 max_steps=96, interpret=True)
        st = march_kernel.march_stream(cas, o, d, t_max=10.0, config=CFG,
                                       max_steps=96, interpret=True,
                                       queue=32)
        np.testing.assert_array_equal(np.asarray(ref.hit),
                                      np.asarray(st.hit))
        np.testing.assert_allclose(np.asarray(ref.t), np.asarray(st.t),
                                   rtol=0, atol=0)

    def test_grace_prevents_self_occlusion(self, cornell_cascades):
        """Rays starting ~1 voxel off a wall, leaving it, must not hit it."""
        cas = cornell_cascades
        # floor of the cornell box is at y=-1; start just above, ray up.
        # Column near the front-left corner: no boxes overhead.
        m = 64
        x = np.linspace(-0.88, -0.78, m, dtype=np.float32)
        o = np.stack([x, np.full(m, -1.0 + 1.1 * CFG.base_voxel_size,
                                 np.float32), np.full(m, 0.8, np.float32)],
                     -1)
        d = np.broadcast_to(np.asarray([0.0, 1.0, 0.0], np.float32), (m, 3))
        ker = march_kernel.march(cas, jnp.asarray(o), jnp.asarray(d),
                                 t_max=0.5, config=CFG, max_steps=64,
                                 interpret=True)
        # nothing within 0.5 above the floor center: mostly misses
        assert np.asarray(ker.hit).mean() < 0.2
