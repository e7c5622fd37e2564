"""Vectorized geometric primitives shared by the SDF builder and tests."""

from __future__ import annotations

import jax.numpy as jnp


def closest_point_on_triangle(p, a, b, c):
    """Closest point on triangle (a,b,c) to point p.

    All inputs broadcastable (..., 3).  Voronoi-region case analysis
    (the standard closest-point construction), fully branchless.
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    # region barycentric candidates
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_v = 1.0 / jnp.where(jnp.abs(vb + va + vc) > 1e-30, vb + va + vc, 1.0)

    # edge AB
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 - d3, 1.0)
    v_ab = jnp.clip(v_ab, 0.0, 1.0)
    # edge AC
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 - d6, 1.0)
    w_ac = jnp.clip(w_ac, 0.0, 1.0)
    # edge BC
    num_bc = d4 - d3
    den_bc = (d4 - d3) + (d5 - d6)
    w_bc = num_bc / jnp.where(jnp.abs(den_bc) > 1e-30, den_bc, 1.0)
    w_bc = jnp.clip(w_bc, 0.0, 1.0)

    # interior
    v_in = vb * denom_v
    w_in = vc * denom_v

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0) & ~in_a & ~in_b
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0) & ~in_a & ~in_c & ~on_ab
    on_bc = ((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
             & ~in_b & ~in_c & ~on_ab & ~on_ac)

    v = jnp.where(in_a | in_c, 0.0,
                  jnp.where(in_b, 1.0,
                            jnp.where(on_ab, v_ab,
                                      jnp.where(on_ac, 0.0,
                                                jnp.where(on_bc, 1.0 - w_bc,
                                                          v_in)))))
    w = jnp.where(in_a | in_b, 0.0,
                  jnp.where(in_c, 1.0,
                            jnp.where(on_ab, 0.0,
                                      jnp.where(on_ac, w_ac,
                                                jnp.where(on_bc, w_bc,
                                                          w_in)))))
    return a + v[..., None] * ab + w[..., None] * ac


def point_triangle_distance(p, a, b, c):
    q = closest_point_on_triangle(p, a, b, c)
    return jnp.linalg.norm(p - q, axis=-1)


def aabb_distance(p, lo, hi):
    """Distance from point(s) to AABB(s) (0 inside)."""
    d = jnp.maximum(jnp.maximum(lo - p, p - hi), 0.0)
    return jnp.linalg.norm(d, axis=-1)


def tri_aabb(a, b, c):
    lo = jnp.minimum(jnp.minimum(a, b), c)
    hi = jnp.maximum(jnp.maximum(a, b), c)
    return lo, hi
