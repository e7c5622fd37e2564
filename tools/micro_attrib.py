"""Mosaic-level attribution of the work-list kernel's per-step cost.

VERDICT r3 #1: the ~3-4.5 us/step fixed cost behind the 49k-tris raster
number was asserted to be irreducible physics but never broken down.
This tool times an ADDITIVE LADDER of kernel variants, all sharing the
production grid/specs (scalar-prefetched work list, (8, 3TC) f32 chunk
blocks, (P, 1) packed-key scratch), so successive deltas attribute one
step to:

  s0  grid + chunk DMA + row-write floor (no arithmetic)
  s1  + ONE bf16 matmul (P,2)x(2,3TC) + ct translate/add
  s2  + the production 3-term bf16 cascade (two more MXU passes + adds)
  s3  + coverage test chain (mins / cmps / and)
  s4  + packed-key build + cross-lane min + accumulate (no extraction)
  s5  + winner-slot extraction under any(upd)  == production gather mode

and then measures the candidate lever:

  s6  K=6 FUSED cascade: the hi/mid/lo coefficient splits ship as a
      pre-split (8, 3TC)-block bf16 operand and the MXU sums all three
      terms in its f32 accumulator in ONE pass -- removing two matmul
      passes, two (P,3TC) adds, and the in-kernel split, at +6KB/step
      DMA.  Same math, same terms, single f32 accumulation order.
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

NUM_TILES = 2025
NUM_CHUNKS = 2048
P, TC = 1024, 128
TILE_W = 128
NUM_TX = 15


def kernel(stage, wt_ref, wc_ref, fl_ref, chunks_ref, *rest):
    if stage >= 6:
        chunksb_ref = rest[0]
        rest = rest[1:]
    z_row, slot_row, best_ref, sid_ref = rest
    i = pl.program_id(0)
    fl = fl_ref[i]
    lane_bits = (TC - 1).bit_length()
    mask = jnp.int32(~((1 << lane_bits) - 1))
    miss = jnp.int32(1073741824)
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, TC), 1)

    @pl.when((fl & 4) != 0)
    def _():
        rows = chunks_ref[0]
        first = (fl & 1) != 0
        prev = jnp.where(first, jnp.full((P, 1), miss, jnp.int32),
                         best_ref[:, :])
        if stage == 0:
            # floor: consume the DMA'd block + write scratch, no math
            row = jnp.broadcast_to(
                jax.lax.bitcast_convert_type(rows[0:1, 0:1],
                                             jnp.int32), (P, 1))
            best_ref[:, :] = jnp.minimum(row, prev)
            return
        tile = wt_ref[i]
        fx0 = ((tile % NUM_TX) * TILE_W).astype(jnp.float32)
        fy0 = ((tile // NUM_TX) * (P // TILE_W)).astype(jnp.float32)
        dx = fx0 - rows[3:4]
        dy = fy0 - rows[4:5]
        ct = rows[0:1] * dx + rows[1:2] * dy + rows[2:3]
        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        py = 0.5 + (pix // TILE_W).astype(jnp.float32)
        px = 0.5 + (pix % TILE_W).astype(jnp.float32)
        if stage >= 6:
            # one K=6 pass: rhs rows [hi0 hi1 mid0 mid1 lo0 lo1] pre-split
            cols = jax.lax.broadcasted_iota(jnp.int32, (P, 6), 1)
            pm6 = jnp.where(cols % 2 == 1, py, px).astype(jnp.bfloat16)
            out = jnp.dot(pm6, chunksb_ref[0][0:6],
                          preferred_element_type=jnp.float32) + ct
        else:
            pixmat = jnp.concatenate([px, py], axis=1)
            pixb = pixmat.astype(jnp.bfloat16)
            rhs = rows[0:2]
            hi = rhs.astype(jnp.bfloat16)
            out = jnp.dot(pixb, hi, preferred_element_type=jnp.float32)
            if stage >= 2:
                r1 = rhs - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                out = (out
                       + jnp.dot(pixb, mid,
                                 preferred_element_type=jnp.float32)
                       + jnp.dot(pixb, lo,
                                 preferred_element_type=jnp.float32))
            out = out + ct
        if stage == 1 or stage == 2:
            row = (jax.lax.bitcast_convert_type(
                jnp.min(out, axis=-1, keepdims=True), jnp.int32) & mask)
            best_ref[:, :] = jnp.minimum(row, prev)
            return
        l1 = out[:, 0:TC]
        l2 = out[:, TC:2 * TC]
        z = out[:, 2 * TC:3 * TC]
        ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
              & (l1 + l2 <= 1.0) & (z <= 1.0))
        zm = jnp.where(ok, z, 2.0)
        if stage == 3:
            row = (jax.lax.bitcast_convert_type(
                jnp.min(zm, axis=-1, keepdims=True), jnp.int32) & mask)
            best_ref[:, :] = jnp.minimum(row, prev)
            return
        key = (jax.lax.bitcast_convert_type(zm, jnp.int32) & mask) | lane
        row = jnp.min(key, axis=-1, keepdims=True)
        upd = row < prev
        best_ref[:, :] = jnp.where(upd, row, prev)
        if stage == 4:
            return

        @pl.when(jnp.any(upd))
        def _():
            sel = lane == (row & ~mask)
            sel_ids = jnp.broadcast_to(rows[5:6, 0:TC], (P, TC))
            sid = jnp.sum(jnp.where(sel, sel_ids, 0.0), axis=-1,
                          keepdims=True)
            sid_ref[:, :] = jnp.where(upd, sid, sid_ref[:, :])

    @pl.when((fl & 2) != 0)
    def _():
        z1 = jax.lax.bitcast_convert_type(best_ref[:, :] & mask,
                                          jnp.float32)
        hit = z1 <= 1.0
        z_row[...] = jnp.where(hit, z1, 3e38).reshape(1, 1, P)
        slot_row[...] = jnp.where(hit, sid_ref[:, :].astype(jnp.int32),
                                  -1).reshape(1, 1, P)


def run(stage, n_work, label):
    rng = np.random.default_rng(0)
    wt = jnp.asarray(np.sort(rng.integers(0, NUM_TILES, n_work))
                     .astype(np.int32))
    wc = jnp.asarray(rng.integers(0, NUM_CHUNKS, n_work).astype(np.int32))
    wtn = np.asarray(wt)
    first = np.concatenate([[True], wtn[1:] != wtn[:-1]])
    last = np.concatenate([wtn[1:] != wtn[:-1], [True]])
    fl = jnp.asarray((first.astype(np.int32) + 2 * last.astype(np.int32)
                      + 4).astype(np.int32))
    chunks_np = rng.random((NUM_CHUNKS, 8, 3 * TC), np.float32)
    chunks = jnp.asarray(chunks_np)

    row_spec = pl.BlockSpec((1, 1, P), lambda i, a, b, c: (a[i], 0, 0),
                            memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, 8, 3 * TC),
                              lambda i, a, b, c: (b[i], 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [chunk_spec]
    args = [wt, wc, fl, chunks]
    if stage >= 6:
        # pre-split bf16 cascade operand (built once, as the template
        # builder would): rows [hi0 hi1 mid0 mid1 lo0 lo1 0 0]
        rhs = chunks_np[:, 0:2]                       # (NC, 2, 3TC)
        hi = rhs.astype(np.float32).astype(jnp.bfloat16)
        r1 = rhs - np.asarray(hi, np.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - np.asarray(mid, np.float32)).astype(jnp.bfloat16)
        cb = np.zeros((NUM_CHUNKS, 8, 3 * TC), dtype=hi.dtype)
        cb[:, 0:2] = hi
        cb[:, 2:4] = mid
        cb[:, 4:6] = lo
        chunksb = jnp.asarray(cb)
        in_specs.append(pl.BlockSpec((1, 8, 3 * TC),
                                     lambda i, a, b, c: (b[i], 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(chunksb)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_work,),
        in_specs=in_specs, out_specs=[row_spec] * 2,
        scratch_shapes=[pltpu.VMEM((P, 1), jnp.int32),
                        pltpu.VMEM((P, 1), jnp.float32)])

    def call(c):
        a = list(args)
        a[3] = c
        return pl.pallas_call(
            functools.partial(kernel, stage), grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.float32),
                       jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.int32)],
        )(*a)

    iters = 20

    @jax.jit
    def loop(c0):
        def body(i, c):
            z, s = call(c)
            return c + (jnp.sum(z[:2, 0, :2]) + jnp.sum(
                s[:2, 0, :2].astype(jnp.float32))) * 1e-30
        return jax.lax.fori_loop(0, iters, body, c0)

    _ = np.asarray(loop(chunks)[0, 0, 0])
    t0 = time.time()
    _ = np.asarray(loop(chunks)[0, 0, 0])
    per = (time.time() - t0 - 0.04) / iters
    print(f"s{stage} {label:34s} n={n_work}: {per*1e3:7.2f} ms "
          f"({per/n_work*1e6:5.2f} us/step)", flush=True)
    return per / n_work * 1e6


if __name__ == "__main__":
    n = 4096
    labels = {
        0: "floor (grid+DMA+rows)",
        1: "+1 bf16 matmul + ct",
        2: "+cascade (3-pass, production)",
        3: "+coverage test chain",
        4: "+packed key + reduce + store",
        5: "+extraction (== production)",
        6: "FUSED K=6 cascade (lever)",
    }
    res = {}
    for s in range(7):
        res[s] = run(s, n, labels[s])
    print("\ndeltas (us/step):")
    prev = 0.0
    for s in range(6):
        print(f"  {labels[s]:36s}: +{res[s] - prev:5.2f}")
        prev = res[s]
    print(f"\n  production total : {res[5]:5.2f} us/step")
    print(f"  fused K=6 total  : {res[6]:5.2f} us/step "
          f"({res[5] / max(res[6], 1e-9):.2f}x)")
