"""Per-step fixed vs marginal cost of the work-list kernel, and shape
variants: pixel-tile height (P) and chunk width (TC).

If the per-step cost is fixed-overhead-dominated (grid + 12KB chunk DMA +
row writes), doubling P or TC halves the step count for ~less-than-2x
per-step cost — the only lever left once lists are near 1 chunk/tile.
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


def kernel(P, TC, wt_ref, wc_ref, fl_ref, chunks_ref, z_row, slot_row,
           best_ref, sid_ref):
    i = pl.program_id(0)
    fl = fl_ref[i]

    @pl.when((fl & 1) != 0)
    def _():
        best_ref[:, :] = jnp.full((P, TC), 2.0, jnp.float32)

    @pl.when((fl & 4) != 0)
    def _():
        rows = chunks_ref[0]
        tile = wt_ref[i]
        fx0 = ((tile % 15) * 128).astype(jnp.float32)
        fy0 = ((tile // 15) * (P // 128)).astype(jnp.float32)
        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        py = 0.5 + (pix // 128).astype(jnp.float32)
        px = 0.5 + (pix % 128).astype(jnp.float32)
        pixmat = jnp.concatenate([px, py], axis=1)
        dx = fx0 - rows[3:4]
        dy = fy0 - rows[4:5]
        ct = rows[0:1] * dx + rows[1:2] * dy + rows[2:3]
        rhs = rows[0:2]
        hi = rhs.astype(jnp.bfloat16)
        lo = (rhs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pixb = pixmat.astype(jnp.bfloat16)
        out = (jnp.dot(pixb, hi, preferred_element_type=jnp.float32)
               + jnp.dot(pixb, lo, preferred_element_type=jnp.float32) + ct)
        l1 = out[:, 0:TC]
        l2 = out[:, TC:2 * TC]
        z = out[:, 2 * TC:3 * TC]
        ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
              & (l1 + l2 <= 1.0) & (z <= 1.0))
        zm = jnp.where(ok, z, 2.0)
        prev = best_ref[:, :]
        upd = zm < prev
        sid = jnp.broadcast_to(rows[5:6, 0:TC], (P, TC))
        best_ref[:, :] = jnp.where(upd, zm, prev)
        sid_ref[:, :] = jnp.where(upd, sid, sid_ref[:, :])

    @pl.when((fl & 2) != 0)
    def _():
        bk = best_ref[:, :]
        z = jnp.min(bk, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (P, TC), 1)
        k = jnp.min(jnp.where(bk == z, lane, jnp.int32(2 ** 30)),
                    axis=-1, keepdims=True)
        sid = jnp.sum(jnp.where(lane == k, sid_ref[:, :], 0.0),
                      axis=-1, keepdims=True)
        hit = z <= 1.0
        z_row[...] = jnp.where(hit, z, 3e38).reshape(1, 1, P)
        slot_row[...] = jnp.where(hit, sid.astype(jnp.int32), -1) \
            .reshape(1, 1, P)


def run(P, TC, n_work):
    rng = np.random.default_rng(0)
    wt = jnp.asarray(np.sort(rng.integers(0, NUM_TILES, n_work))
                     .astype(np.int32))
    wc = jnp.asarray(rng.integers(0, NUM_CHUNKS, n_work).astype(np.int32))
    wtn = np.asarray(wt)
    first = np.concatenate([[True], wtn[1:] != wtn[:-1]])
    last = np.concatenate([wtn[1:] != wtn[:-1], [True]])
    fl = jnp.asarray((first.astype(np.int32) + 2 * last.astype(np.int32)
                      + 4).astype(np.int32))
    chunks = jnp.asarray(rng.random((NUM_CHUNKS, 8, 3 * TC), np.float32))

    row_spec = pl.BlockSpec((1, 1, P), lambda i, a, b, c: (a[i], 0, 0),
                            memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, 8, 3 * TC), lambda i, a, b, c: (b[i], 0, 0),
                              memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_work,),
        in_specs=[chunk_spec], out_specs=[row_spec] * 2,
        scratch_shapes=[pltpu.VMEM((P, TC), jnp.float32),
                        pltpu.VMEM((P, TC), jnp.float32)])

    def call(c):
        return pl.pallas_call(
            functools.partial(kernel, P, TC), grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.float32),
                       jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.int32)],
        )(wt, wc, fl, c)

    iters = 10

    @jax.jit
    def loop(c0):
        def body(i, c):
            z, s = call(c)
            return c + 0.0 * z[0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, c0)

    _ = np.asarray(loop(chunks)[0, 0, 0])
    t0 = time.time()
    _ = np.asarray(loop(chunks)[0, 0, 0])
    per = (time.time() - t0 - 0.04) / iters
    print(f"P={P:5d} TC={TC:4d} n_work={n_work:6d}: {per*1e3:7.2f} ms "
          f"({per/n_work*1e6:5.2f} us/step)", flush=True)


if __name__ == "__main__":
    for P, TC in ((1024, 128), (1024, 256), (2048, 128), (2048, 256),
                  (4096, 128)):
        for n in (2048, 4096, 8192):
            run(P, TC, n)


# -- fused singleton variant: a step that is both first AND last for its
# tile computes + reduces inline, skipping all (P, TC) scratch traffic
# (init fill + accumulate RW + finalize read = ~2 MB VMEM per step)


def kernel_fused(P, TC, wt_ref, wc_ref, fl_ref, chunks_ref, z_row, slot_row,
                 best_ref, sid_ref):
    i = pl.program_id(0)
    fl = fl_ref[i]

    def compute(rows):
        tile = wt_ref[i]
        fx0 = ((tile % 15) * 128).astype(jnp.float32)
        fy0 = ((tile // 15) * (P // 128)).astype(jnp.float32)
        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        py = 0.5 + (pix // 128).astype(jnp.float32)
        px = 0.5 + (pix % 128).astype(jnp.float32)
        pixmat = jnp.concatenate([px, py], axis=1)
        dx = fx0 - rows[3:4]
        dy = fy0 - rows[4:5]
        ct = rows[0:1] * dx + rows[1:2] * dy + rows[2:3]
        rhs = rows[0:2]
        hi = rhs.astype(jnp.bfloat16)
        lo = (rhs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pixb = pixmat.astype(jnp.bfloat16)
        out = (jnp.dot(pixb, hi, preferred_element_type=jnp.float32)
               + jnp.dot(pixb, lo, preferred_element_type=jnp.float32) + ct)
        l1 = out[:, 0:TC]
        l2 = out[:, TC:2 * TC]
        z = out[:, 2 * TC:3 * TC]
        ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
              & (l1 + l2 <= 1.0) & (z <= 1.0))
        return jnp.where(ok, z, 2.0)

    def reduce_write(bk, sid_all):
        z = jnp.min(bk, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (P, TC), 1)
        k = jnp.min(jnp.where(bk == z, lane, jnp.int32(2 ** 30)),
                    axis=-1, keepdims=True)
        sid = jnp.sum(jnp.where(lane == k, sid_all, 0.0),
                      axis=-1, keepdims=True)
        hit = z <= 1.0
        z_row[...] = jnp.where(hit, z, 3e38).reshape(1, 1, P)
        slot_row[...] = jnp.where(hit, sid.astype(jnp.int32), -1) \
            .reshape(1, 1, P)

    @pl.when(fl == 7)                       # fused singleton
    def _():
        rows = chunks_ref[0]
        zm = compute(rows)
        sid = jnp.broadcast_to(rows[5:6, 0:TC], (P, TC))
        reduce_write(zm, sid)

    @pl.when((fl & 1 != 0) & (fl != 7))
    def _():
        best_ref[:, :] = jnp.full((P, TC), 2.0, jnp.float32)

    @pl.when((fl & 4 != 0) & (fl != 7))
    def _():
        rows = chunks_ref[0]
        zm = compute(rows)
        prev = best_ref[:, :]
        upd = zm < prev
        sid = jnp.broadcast_to(rows[5:6, 0:TC], (P, TC))
        best_ref[:, :] = jnp.where(upd, zm, prev)
        sid_ref[:, :] = jnp.where(upd, sid, sid_ref[:, :])

    @pl.when((fl & 2 != 0) & (fl != 7))
    def _():
        reduce_write(best_ref[:, :], sid_ref[:, :])


def run_fused(P, TC, n_work):
    rng = np.random.default_rng(0)
    wt = jnp.asarray(np.sort(rng.integers(0, NUM_TILES, n_work))
                     .astype(np.int32))
    wc = jnp.asarray(rng.integers(0, NUM_CHUNKS, n_work).astype(np.int32))
    wtn = np.asarray(wt)
    first = np.concatenate([[True], wtn[1:] != wtn[:-1]])
    last = np.concatenate([wtn[1:] != wtn[:-1], [True]])
    fl = jnp.asarray((first.astype(np.int32) + 2 * last.astype(np.int32)
                      + 4).astype(np.int32))
    nsing = int((np.asarray(fl) == 7).sum())
    chunks = jnp.asarray(rng.random((NUM_CHUNKS, 8, 3 * TC), np.float32))

    row_spec = pl.BlockSpec((1, 1, P), lambda i, a, b, c: (a[i], 0, 0),
                            memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, 8, 3 * TC), lambda i, a, b, c: (b[i], 0, 0),
                              memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_work,),
        in_specs=[chunk_spec], out_specs=[row_spec] * 2,
        scratch_shapes=[pltpu.VMEM((P, TC), jnp.float32),
                        pltpu.VMEM((P, TC), jnp.float32)])

    iters = 10

    @jax.jit
    def loop(c0):
        def body(i, c):
            z, s = pl.pallas_call(
                functools.partial(kernel_fused, P, TC), grid_spec=gs,
                out_shape=[
                    jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.float32),
                    jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.int32)],
            )(wt, wc, fl, c)
            return c + 0.0 * z[0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, c0)

    _ = np.asarray(loop(chunks)[0, 0, 0])
    t0 = time.time()
    _ = np.asarray(loop(chunks)[0, 0, 0])
    per = (time.time() - t0 - 0.04) / iters
    print(f"FUSED P={P} TC={TC} n_work={n_work} (singletons {nsing}): "
          f"{per*1e3:7.2f} ms ({per/n_work*1e6:5.2f} us/step)", flush=True)


# -- packed-key variant: EVERY step reduces to a (P, 1) packed
# depth|lane key + (P, 1) sid — scratch traffic drops from (P, TC) to
# (P, 1); the finalize becomes a trivial read (the binned kernel's
# int-key trick applied to the streaming walk; <= 2^-16 relative depth
# quantization for 7 lane bits)


def kernel_packed(P, TC, wt_ref, wc_ref, fl_ref, chunks_ref, z_row,
                  slot_row, best_ref, sid_ref):
    i = pl.program_id(0)
    fl = fl_ref[i]
    lane_bits = (TC - 1).bit_length()
    mask = jnp.int32(~((1 << lane_bits) - 1))
    miss = jnp.int32(1073741824)            # f32 2.0 bit pattern
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, TC), 1)

    def compute(rows):
        tile = wt_ref[i]
        fx0 = ((tile % 15) * 128).astype(jnp.float32)
        fy0 = ((tile // 15) * (P // 128)).astype(jnp.float32)
        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        py = 0.5 + (pix // 128).astype(jnp.float32)
        px = 0.5 + (pix % 128).astype(jnp.float32)
        pixmat = jnp.concatenate([px, py], axis=1)
        dx = fx0 - rows[3:4]
        dy = fy0 - rows[4:5]
        ct = rows[0:1] * dx + rows[1:2] * dy + rows[2:3]
        rhs = rows[0:2]
        hi = rhs.astype(jnp.bfloat16)
        lo = (rhs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pixb = pixmat.astype(jnp.bfloat16)
        out = (jnp.dot(pixb, hi, preferred_element_type=jnp.float32)
               + jnp.dot(pixb, lo, preferred_element_type=jnp.float32) + ct)
        l1 = out[:, 0:TC]
        l2 = out[:, TC:2 * TC]
        z = out[:, 2 * TC:3 * TC]
        ok = ((jnp.minimum(jnp.minimum(l1, l2), z) >= 0.0)
              & (l1 + l2 <= 1.0) & (z <= 1.0))
        return jnp.where(ok, z, 2.0)

    @pl.when((fl & 4) != 0)
    def _():
        rows = chunks_ref[0]
        zm = compute(rows)
        key = (jax.lax.bitcast_convert_type(zm, jnp.int32) & mask) | lane
        row = jnp.min(key, axis=-1, keepdims=True)          # (P, 1)
        sel = lane == (row & ~mask)
        sid_row = jnp.sum(jnp.where(
            sel, jnp.broadcast_to(rows[5:6, 0:TC], (P, TC)), 0.0),
            axis=-1, keepdims=True)                          # (P, 1)
        prev = jnp.where((fl & 1) != 0, jnp.full((P, 1), miss, jnp.int32),
                         best_ref[:, 0:1])
        upd = row < prev
        best = jnp.where(upd, row, prev)
        best_ref[:, 0:1] = best
        sid_ref[:, 0:1] = jnp.where(
            upd, sid_row, jnp.where((fl & 1) != 0, 0.0, sid_ref[:, 0:1]))

        @pl.when((fl & 2) != 0)
        def _():
            z1 = jax.lax.bitcast_convert_type(best & mask, jnp.float32)
            hit = z1 <= 1.0
            z_row[...] = jnp.where(hit, z1, 3e38).reshape(1, 1, P)
            slot_row[...] = jnp.where(
                hit, sid_ref[:, 0:1].astype(jnp.int32), -1) \
                .reshape(1, 1, P)


def run_packed(P, TC, n_work):
    rng = np.random.default_rng(0)
    wt = jnp.asarray(np.sort(rng.integers(0, NUM_TILES, n_work))
                     .astype(np.int32))
    wc = jnp.asarray(rng.integers(0, NUM_CHUNKS, n_work).astype(np.int32))
    wtn = np.asarray(wt)
    first = np.concatenate([[True], wtn[1:] != wtn[:-1]])
    last = np.concatenate([wtn[1:] != wtn[:-1], [True]])
    fl = jnp.asarray((first.astype(np.int32) + 2 * last.astype(np.int32)
                      + 4).astype(np.int32))
    chunks = jnp.asarray(rng.random((NUM_CHUNKS, 8, 3 * TC), np.float32))
    row_spec = pl.BlockSpec((1, 1, P), lambda i, a, b, c: (a[i], 0, 0),
                            memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, 8, 3 * TC), lambda i, a, b, c: (b[i], 0, 0),
                              memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_work,),
        in_specs=[chunk_spec], out_specs=[row_spec] * 2,
        scratch_shapes=[pltpu.VMEM((P, 1), jnp.int32),
                        pltpu.VMEM((P, 1), jnp.float32)])
    iters = 10

    @jax.jit
    def loop(c0):
        def body(i, c):
            z, s = pl.pallas_call(
                functools.partial(kernel_packed, P, TC), grid_spec=gs,
                out_shape=[
                    jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.float32),
                    jax.ShapeDtypeStruct((NUM_TILES, 1, P), jnp.int32)],
            )(wt, wc, fl, c)
            return c + 0.0 * z[0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, c0)

    _ = np.asarray(loop(chunks)[0, 0, 0])
    t0 = time.time()
    _ = np.asarray(loop(chunks)[0, 0, 0])
    per = (time.time() - t0 - 0.04) / iters
    print(f"PACKED P={P} TC={TC} n_work={n_work}: {per*1e3:7.2f} ms "
          f"({per/n_work*1e6:5.2f} us/step)", flush=True)


if __name__ == "__main__":
    for n in (2048, 4096, 8192):
        run_packed(1024, 128, n)
