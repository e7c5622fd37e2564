"""Isolate pass-1 work-list kernel cost: DMA/grid floor vs eval vs
finalize vs scratch init, at the 49k-scene work-list shape."""
import sys; sys.path.insert(0, "/root/repo")
import functools, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, TC = 1024, 128
NT = 2025
WCAP = 5313
NCHUNKS = 3288

rng = np.random.default_rng(0)
chunks = jnp.asarray(rng.standard_normal((NCHUNKS, 24, TC)).astype(np.float32))
# realistic work list: ~2.2 steps per tile
nsub = rng.integers(1, 4, NT)
cum = np.cumsum(nsub); offs = cum - nsub; total = cum[-1]
wt = np.full(WCAP, NT - 1, np.int32)
wc = np.zeros(WCAP, np.int32)
fl = np.zeros(WCAP, np.int32)
for t in range(NT):
    for k in range(nsub[t]):
        i = offs[t] + k
        if i >= WCAP: break
        wt[i] = t; wc[i] = min(t * 2 + k, NCHUNKS - 1)
        fl[i] = (1 if k == 0 else 0) | (2 if k == nsub[t] - 1 else 0) | 4
wt, wc, fl = map(jnp.asarray, (wt, wc, fl))

def make(variant):
    def kern(wt_ref, wc_ref, fl_ref, chunks_ref, z_row, pos_row,
             bz_ref, bp_ref):
        i = pl.program_id(0)
        f = fl_ref[i]
        if variant >= 1:
            @pl.when((f & 1) != 0)
            def _():
                bz_ref[:, :] = jnp.full((P, TC), 2.0, jnp.float32)
                bp_ref[:, :] = jnp.full((P, TC), -1.0, jnp.float32)
        if variant >= 2:
            @pl.when((f & 4) != 0)
            def _():
                rows = chunks_ref[0]
                fx0 = (wt_ref[i] % 15).astype(jnp.float32)
                ax = rows[0:1, :] - fx0; bx = rows[1:2, :] - fx0
                cx = rows[2:3, :] - fx0
                ay = rows[3:4, :]; by = rows[4:5, :]; cy = rows[5:6, :]
                az = rows[6:7, :]; bz = rows[7:8, :]; cz = rows[8:9, :]
                area = (bx-ax)*(cy-ay) - (by-ay)*(cx-ax)
                dead = (az >= 9.0) | (jnp.abs(area) <= 1e-12)
                inv = jnp.where(dead, 0.0, 1.0/jnp.where(dead, 1.0, area))
                ka1 = -(ay-cy)*inv; kb1 = (ax-cx)*inv
                kc1 = (cx*(ay-cy)-cy*(ax-cx))*inv
                ka2 = -(by-ay)*inv; kb2 = (bx-ax)*inv
                kc2 = (ax*(by-ay)-ay*(bx-ax))*inv
                dz1, dz2 = bz-az, cz-az
                kaz = ka1*dz1+ka2*dz2; kbz = kb1*dz1+kb2*dz2
                kcz = az+kc1*dz1+kc2*dz2
                pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
                py = 0.5 + (pix // TC).astype(jnp.float32)
                px = 0.5 + (pix % TC).astype(jnp.float32)
                l1 = px*ka1 + py*kb1 + kc1
                l2 = px*ka2 + py*kb2 + kc2
                z = px*kaz + py*kbz + kcz
                ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
                      & (l1+l2 <= 1.0) & (z <= 1.0))
                zm = jnp.where(ok, z, 2.0)
                prev = bz_ref[:, :]
                upd = zm < prev
                lane = jax.lax.broadcasted_iota(jnp.int32, (P, TC), 1) \
                    .astype(jnp.float32)
                posv = (wc_ref[i]*TC).astype(jnp.float32) + lane
                bz_ref[:, :] = jnp.where(upd, zm, prev)
                bp_ref[:, :] = jnp.where(upd, posv, bp_ref[:, :])
        if variant >= 3:
            @pl.when((f & 2) != 0)
            def _():
                bk = bz_ref[:, :]
                zmin = jnp.min(bk, axis=-1, keepdims=True)
                lane = jax.lax.broadcasted_iota(jnp.int32, (P, TC), 1)
                k = jnp.min(jnp.where(bk == zmin, lane, jnp.int32(2**30)),
                            axis=-1, keepdims=True)
                sel = lane == k
                posw = jnp.sum(jnp.where(sel, bp_ref[:, :], 0.0),
                               axis=-1, keepdims=True)
                hit = zmin <= 1.0
                z_row[...] = jnp.where(hit, zmin, 3e38).reshape(1, 1, P)
                pos_row[...] = jnp.where(hit, posw, -1.0) \
                    .astype(jnp.int32).reshape(1, 1, P)
        if variant == 0:
            @pl.when((f & 2) != 0)
            def _():
                z_row[...] = jnp.zeros((1, 1, P), jnp.float32)
                pos_row[...] = jnp.zeros((1, 1, P), jnp.int32)

    row = pl.BlockSpec((1, 1, P), lambda i, a, b, c: (a[i], 0, 0),
                       memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(WCAP,),
        in_specs=[pl.BlockSpec((1, 24, TC), lambda i, a, b, c: (b[i], 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[row, row],
        scratch_shapes=[pltpu.VMEM((P, TC), jnp.float32)] * 2,
    )
    @jax.jit
    def run(ch):
        z, pos = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((NT, 1, P), jnp.float32),
                       jax.ShapeDtypeStruct((NT, 1, P), jnp.int32)],
        )(wt, wc, fl, ch)
        return z[0, 0, 0] + pos[0, 0, 0].astype(jnp.float32)
    return run

for v, label in [(0, "floor: DMA+grid only"), (1, "+scratch init"),
                 (2, "+eval"), (3, "+finalize")]:
    run = make(v)
    _ = np.asarray(run(chunks))
    iters = 20
    @jax.jit
    def loop(ch):
        def body(i, acc):
            return run(ch + 0.0 * acc * 1e-30).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = np.asarray(loop(chunks))
    t0 = time.time()
    _ = np.asarray(loop(chunks))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"v{v} {label:24s}: {per:7.2f} ms ({per*1e3/WCAP:.2f} us/step)",
          flush=True)
