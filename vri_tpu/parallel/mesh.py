"""Device-mesh helpers.

The reference is strictly single-GPU (one graphics queue,
Source/Common.cpp:337-361) — this layer has no counterpart to port and is
designed TPU-first per SURVEY §2.4: a 1-D ``tiles`` mesh axis shards the
framebuffer (and, for the SDF, cascade z-slabs); collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "tiles") -> NamedSharding:
    """Shard the leading (row) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))
