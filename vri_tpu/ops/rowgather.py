"""Row-gather + field-extraction in TPU-friendly layout.

The framework's hot resolves all share one pattern: gather per-pixel rows
from a packed (table_len, K) f32 table (ONE vectorized row gather — 15
separate per-index gathers measured ~10x worse), then split the (N, K)
result into per-field (N,) columns.  The naive column slice is a
performance trap on TPU: the (N, K) result is lane-padded K -> 128, and
XLA lowers EVERY field slice as a full strided pass over the padded
buffer — 16 fields x 1.41 ms = 22.6 ms/frame at 1080p, measured, versus
~0.3 ms for the whole math that consumes them.

The fix: reshape the gathered rows to 128-pixel blocks and transpose once
to (N/128, K, 128) — with K a multiple of 8 this is tile-exact (no
padding), the transpose is a single pass, and each field becomes a FREE
major-dim plane slice.  ``jax.lax.optimization_barrier`` pins the
transposed buffer so XLA cannot re-fuse the transpose into every slice
(it does otherwise, recomputing it per field).

Measured on v5e at N = 2073600, K = 16 (tools trace + microbench):
naive slices 22.6 ms -> block-transpose + barrier ~1.7 ms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _field_accessor(rows: jnp.ndarray, n: int, k: int):
    """(Np, K) gathered rows -> free per-field (n,) accessor."""
    at = rows.reshape(-1, 128, k).transpose(0, 2, 1)   # (Np/128, K, 128)
    at = jax.lax.optimization_barrier(at)

    def fld(j: int) -> jnp.ndarray:
        out = at[:, j, :].reshape(-1)
        return out[:n] if out.shape[0] != n else out

    return fld


def gather_slices(flat: jnp.ndarray, starts: jnp.ndarray, k: int):
    """Contiguous k-element slices of a flat f32 buffer, one per start.

    The bilinear-tap pattern: two ADJACENT 8-field rows are one 64-byte
    contiguous span, so fetching them as a single 16-wide slice halves
    the row-gather count (gathers are per-row overhead-bound, not
    byte-bound).  ``starts`` are element offsets; slices must be in
    bounds.  Returns the same ``fld(j) -> (N,)`` accessor as
    :func:`gather_rows`.
    """
    n = starts.shape[0]
    pad = (-n) % 128
    if pad:
        starts = jnp.concatenate([starts, jnp.zeros((pad,), starts.dtype)])
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    rows = jax.lax.gather(flat, starts[:, None], dn, slice_sizes=(k,),
                          mode=jax.lax.GatherScatterMode.CLIP)
    rows = jax.lax.optimization_barrier(rows)
    return _field_accessor(rows, n, k)


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray):
    """Gather rows ``table[idx]`` and return a field accessor.

    ``table`` is (L, K) f32 (pad K to a multiple of 8 for tile-exact
    transposes); ``idx`` is (N,) int32.  Returns ``fld(k) -> (N,)`` —
    each call is a free plane slice of the one transposed buffer.
    """
    n = idx.shape[0]
    k = table.shape[1]
    pad = (-n) % 128
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    rows = table[idx]                                  # (Np, K)
    # pin the gather's natural row-major output before transposing:
    # without this barrier XLA propagates the transposed layout INTO the
    # gather, which then writes strided (measured 10.2 ms vs 3.7 ms for
    # an (N, 8) gather at 1080p)
    rows = jax.lax.optimization_barrier(rows)
    at = rows.reshape(-1, 128, k).transpose(0, 2, 1)   # (Np/128, K, 128)
    at = jax.lax.optimization_barrier(at)

    def fld(j: int) -> jnp.ndarray:
        out = at[:, j, :].reshape(-1)
        return out[:n] if pad else out

    return fld
