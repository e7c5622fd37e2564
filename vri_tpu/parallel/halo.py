"""ICI halo exchange for sharded SDF cascade bricks.

Multi-chip GI shards each cascade's volume data (brick map + per-voxel
payloads) into z-slabs, one per device on the ``tiles`` axis.  Rays marched
on one chip sample voxels near its slab boundary, so each slab carries
``halo`` ghost planes refreshed from its neighbors with
``jax.lax.ppermute`` (neighbor exchange over ICI — the TPU-idiomatic
replacement for the clipmap-scroll invalidation traffic the reference's
Brixelizer performs on one GPU, ffx_brixelizer_raw.h:268,
cascade_ops.h:569-595).

All functions here run *inside* ``shard_map`` over a 1-D mesh axis; the slab
arrays have shape (slab_z + 2*halo, R, R, ...) with the interior at
[halo : halo + slab_z].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exchange_halo(slab: jnp.ndarray, halo: int, axis_name: str
                  ) -> jnp.ndarray:
    """Refresh the ghost planes of a z-slab from its ring neighbors.

    slab: (slab_z + 2*halo, ...) per-device array (inside shard_map).
    Boundary devices wrap (the cascade volume is toroidal under clipmap
    scroll, like the reference's FFX_BRIXELIZER_CASCADE_WRAP_MASK
    addressing).
    """
    n = jax.lax.axis_size(axis_name)
    interior = slab[halo:-halo] if halo else slab
    # send my low interior planes to the left neighbor's high ghost, etc.
    low = interior[:halo]
    high = interior[-halo:]
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(high, axis_name, right)   # neighbor i-1's top
    from_right = jax.lax.ppermute(low, axis_name, left)    # neighbor i+1's bottom
    return jnp.concatenate([from_left, interior, from_right], axis=0)


def scroll_slab(slab: jnp.ndarray, shift: int, halo: int, axis_name: str
                ) -> jnp.ndarray:
    """Apply a clipmap scroll of ``shift`` voxels along z to a sharded
    volume: roll the interior through the ring (ppermute moves whole planes
    between devices), then refresh halos.

    Equivalent (tested) to ``jnp.roll(global_volume, -shift, axis=0)``
    re-sharded, but only plane-sized traffic crosses ICI.
    """
    n = jax.lax.axis_size(axis_name)
    interior = slab[halo:-halo] if halo else slab
    slab_z = interior.shape[0]
    shift = shift % (slab_z * n)
    dev_shift, local = divmod(shift, slab_z)

    # local part: planes that cross the slab boundary move to the neighbor
    if local:
        moved = interior[:local]                       # planes leaving downward
        left = [(i, (i - 1) % n) for i in range(n)]
        incoming = jax.lax.ppermute(moved, axis_name, left)
        interior = jnp.concatenate([interior[local:], incoming], axis=0)
    # whole-slab part: rotate slabs around the ring dev_shift times
    if dev_shift:
        perm = [(i, (i - dev_shift) % n) for i in range(n)]
        interior = jax.lax.ppermute(interior, axis_name, perm)

    if halo:
        pad = jnp.zeros((halo,) + interior.shape[1:], interior.dtype)
        slab = jnp.concatenate([pad, interior, pad], axis=0)
        return exchange_halo(slab, halo, axis_name)
    return interior


def exchange_halo_fill(interior: jnp.ndarray, halo: int, axis_name: str,
                       fill) -> jnp.ndarray:
    """Attach ``halo`` ghost planes from ring neighbors WITHOUT wrapping:
    the global volume's outer boundary gets ``fill`` instead (matching a
    SAME-padded dense computation).  interior: (slab_z, ...) per-device."""
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    low = interior[:halo]
    high = interior[-halo:]
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(high, axis_name, right)
    from_right = jax.lax.ppermute(low, axis_name, left)
    fill_a = jnp.full_like(from_left, fill)
    from_left = jnp.where(me == 0, fill_a, from_left)
    from_right = jnp.where(me == n - 1, fill_a, from_right)
    return jnp.concatenate([from_left, interior, from_right], axis=0)


def esd_sharded(occ_slab: jnp.ndarray, axis_name: str, max_esd: int
                ) -> jnp.ndarray:
    """Chebyshev empty-space-distance relaxation over a z-slab-sharded
    occupancy volume — the SDF build tier's halo-exchange consumer.

    Each of the ``max_esd - 1`` relaxation sweeps needs one ghost plane
    per side (a 3x3x3 min-pool), refreshed over ICI with
    :func:`exchange_halo_fill`; per sweep the wire carries exactly two
    (R, R) planes per device pair.  Matches the replicated
    ``sdf_build.build_march_tables`` ESD exactly (same SAME-padding
    semantics via the +inf boundary fill).

    occ_slab: (slab_z, R, R) bool — True where a brick exists.
    Returns (slab_z, R, R) i32 chebyshev distances clipped to
    [1, max_esd] (occupied cells report 1, like the dense builder).
    """
    d = jnp.where(occ_slab, 0.0, float(max_esd))
    for _ in range(max_esd - 1):
        ext = exchange_halo_fill(d, 1, axis_name, float(max_esd) + 1.0)
        pooled = -jax.lax.reduce_window(
            -ext, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        d = jnp.minimum(d, pooled[1:-1] + 1.0)
    return jnp.clip(d.astype(jnp.int32), 1, max_esd)
