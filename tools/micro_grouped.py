"""Grouped-singleton raster step: pack G = 128/W tiles (each with <= W
pairs) into ONE kernel step.  The step's (P, 3TC) compute is the same as
a dense step but serves G tiles, so the per-tile cost drops ~Gx for the
sparse tiles that dominate the per-tile step floor (2040 tiles x ~2.9 us
= the kernel floor at every scene scale; tools/hist_tiles.py sizes the
eligible fraction).

Key pieces vs the dense work-list kernel:
  * constants fully baked per pair (ct = a(fx0-ox)+b(fy0-oy)+c in XLA):
    the kernel needs NO tile identity -> stateless singleton steps
  * per-block (W-lane) winner: suffix-min with masked pltpu.roll, then
    broadcast-back, then one-hot extraction of (z, sid) per group with
    two Precision.HIGHEST matmuls (exact for one-hot selection)
  * outputs (n_steps, G, P); XLA re-gathers rows to tile order
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 1024            # 8 x 128 pixel tile
TC = 128
NUM_CHUNKS = 2048


def kernel_grouped(W, wc_ref, chunks_ref, z_row, slot_row):
    G = TC // W
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, TC), 1)
    mask = jnp.int32(~127)

    rows = chunks_ref[0]                        # (8, 3TC)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    py = 0.5 + (pix // 128).astype(jnp.float32)
    px = 0.5 + (pix % 128).astype(jnp.float32)
    pixmat = jnp.concatenate([px, py], axis=1)
    rhs = rows[0:2]
    hi = rhs.astype(jnp.bfloat16)
    lo = (rhs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    pixb = pixmat.astype(jnp.bfloat16)
    out = (jnp.dot(pixb, hi, preferred_element_type=jnp.float32)
           + jnp.dot(pixb, lo, preferred_element_type=jnp.float32)
           + rows[2:3])                         # ct fully baked
    l1 = out[:, 0:TC]
    l2 = out[:, TC:2 * TC]
    z = out[:, 2 * TC:3 * TC]
    ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
          & (l1 + l2 <= 1.0) & (z <= 1.0))
    zm = jnp.where(ok, z, 2.0)
    key = (jax.lax.bitcast_convert_type(zm, jnp.int32) & mask) | lane

    # suffix min within W-blocks: lane at block offset k ends with
    # min over offsets [k, W)
    off = lane % W
    x = key
    s = 1
    while s < W:
        r = pltpu.roll(x, TC - s, axis=1)       # lane i <- x[i+s]
        x = jnp.where(off < (W - s), jnp.minimum(x, r), x)
        s *= 2
    # broadcast block min (offset 0) to all offsets
    s = 1
    while s < W:
        r = pltpu.roll(x, s, axis=1)            # lane i <- x[i-s]
        x = jnp.where((off >= s) & (off < 2 * s), r, x)
        s *= 2
    sel = key == x                              # one-hot winner per block
    z_win = jnp.where(sel, zm, 0.0)
    sid_win = jnp.where(sel, jnp.broadcast_to(rows[5:6, 0:TC], (P, TC)), 0.0)

    # one-hot block-indicator extraction on the MXU (HIGHEST = exact for
    # select-and-sum): (TC, G) x (P, TC) -> (G, P)
    sel_g = (jax.lax.broadcasted_iota(jnp.int32, (TC, G), 0) // W
             == jax.lax.broadcasted_iota(jnp.int32, (TC, G), 1)) \
        .astype(jnp.float32)
    zg = jax.lax.dot_general(sel_g, z_win, (((0,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    sg = jax.lax.dot_general(sel_g, sid_win, (((0,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    hit = zg <= 1.0
    z_row[...] = jnp.where(hit, zg, 3e38).reshape(1, G, P)
    slot_row[...] = jnp.where(hit, sg.astype(jnp.int32), -1) \
        .reshape(1, G, P)


def build_inputs(W, n_steps, seed=0):
    rng = np.random.default_rng(seed)
    wc = jnp.asarray(rng.integers(0, NUM_CHUNKS, n_steps).astype(np.int32))
    chunks = rng.random((NUM_CHUNKS, 8, 3 * TC), np.float32).astype(
        np.float32)
    chunks[:, 5] = np.repeat(
        rng.integers(0, 1 << 20, (NUM_CHUNKS, TC)), 3, axis=0
    ).reshape(NUM_CHUNKS, 3 * TC).astype(np.float32)  # sid rows
    return wc, jnp.asarray(chunks)


def call_grouped(W, n_steps, wc, chunks, interpret=False):
    G = TC // W
    row_spec = pl.BlockSpec((1, G, P), lambda i, wc_r: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, 8, 3 * TC), lambda i, wc_r: (wc_r[i], 0, 0),
                              memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_steps,),
        in_specs=[chunk_spec], out_specs=[row_spec] * 2)
    return pl.pallas_call(
        functools.partial(kernel_grouped, W), grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_steps, G, P), jnp.float32),
                   jax.ShapeDtypeStruct((n_steps, G, P), jnp.int32)],
        interpret=interpret,
    )(wc, chunks)


def check(W):
    """Reference-check one step against numpy on CPU interpret."""
    n = 4
    wc, chunks = build_inputs(W, n, seed=1)
    z, s = call_grouped(W, n, wc, chunks, interpret=True)
    z, s = np.asarray(z), np.asarray(s)
    ch = np.asarray(chunks)
    G = TC // W
    pix = np.arange(P)
    px = 0.5 + (pix % 128)
    py = 0.5 + (pix // 128)
    for i in range(n):
        rows = ch[int(np.asarray(wc)[i])]
        out = px[:, None] * rows[0][None, :] + py[:, None] * rows[1][None, :] \
            + rows[2][None, :]
        l1, l2, zz = out[:, :TC], out[:, TC:2 * TC], out[:, 2 * TC:]
        ok = (np.minimum(np.minimum(l1, l2), zz) >= 0) & (l1 + l2 <= 1) \
            & (zz <= 1)
        zm = np.where(ok, zz, 2.0)
        for g in range(G):
            blk = zm[:, g * W:(g + 1) * W]
            zmin = blk.min(axis=1)
            kwin = blk.argmin(axis=1)
            hit = zmin <= 1.0
            zref = np.where(hit, zmin, 3e38)
            sref = np.where(hit, rows[5][g * W + kwin].astype(np.int32), -1)
            # bf16 2-pass matmul reproduces the f32 product to ~2^-26 rel;
            # compare with tolerance on z, exactly on ids where unambiguous
            dz = np.abs(z[i, g] - zref) / np.maximum(np.abs(zref), 1e-6)
            assert (dz[hit] < 1e-5).all(), (i, g, dz[hit].max())
            m = hit & (np.sort(blk, axis=1)[:, 0]
                       < np.sort(blk, axis=1)[:, 1] - 1e-6
                       if W > 1 else hit)
            assert (s[i, g][m] == sref[m]).all(), (i, g)
    print(f"W={W}: correctness OK", flush=True)


def bench(W, n_steps):
    wc, chunks = build_inputs(W, n_steps)
    iters = 10

    @jax.jit
    def loop(c0):
        def body(i, c):
            z, s = call_grouped(W, n_steps, wc, c)
            return c + 0.0 * z[0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, c0)

    _ = np.asarray(loop(chunks)[0, 0, 0])
    t0 = time.time()
    _ = np.asarray(loop(chunks)[0, 0, 0])
    per = (time.time() - t0 - 0.04) / iters
    G = TC // W
    print(f"GROUPED W={W:3d} G={G:3d} n_steps={n_steps:5d}: "
          f"{per*1e3:7.2f} ms ({per/n_steps*1e6:5.2f} us/step, "
          f"{per/(n_steps*G)*1e6:5.2f} us/tile)", flush=True)


if __name__ == "__main__":
    if jax.default_backend() == "cpu":
        for W in (8, 16, 32):
            check(W)
    else:
        for W in (8, 16, 32, 64):
            for n in (128, 512, 2048):
                bench(W, n)
