"""Watertight ray-triangle intersection, batched for the VPU.

Same algorithm as the reference's Triangle::Intersect (shapes/triangle.cpp:
188-427, Woop et al. style): translate to ray origin, permute so the dominant
ray axis is z, shear to align the ray with +z, then signed 2D edge functions;
the f64 fallback for exactly-zero edge functions is replaced by an f64
recompute only of the edge functions (cheap, keeps watertightness).

All functions take SoA arrays; rays broadcast against triangles.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sel_axis(p, k):
    """p[..., k] via selects (k in {0,1,2}) — TPU-friendly: per-lane
    take_along_axis lowers to slow gathers, two selects do not."""
    return jnp.where(k == 0, p[..., 0], jnp.where(k == 1, p[..., 1], p[..., 2]))


def ray_permutation(d: jnp.ndarray):
    """Per-ray permutation + shear constants (triangle.cpp:205-221).
    Returns (kx, ky, kz, sx, sy, sz) each (...,)."""
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dz = _sel_axis(d, kz)
    swap = dz < 0.0
    kx2 = jnp.where(swap, ky, kx)
    ky2 = jnp.where(swap, kx, ky)
    dx = _sel_axis(d, kx2)
    dy = _sel_axis(d, ky2)
    sx = dx / dz
    sy = dy / dz
    sz = 1.0 / dz
    return kx2, ky2, kz, sx, sy, sz


def _permute(p, kx, ky, kz):
    return _sel_axis(p, kx), _sel_axis(p, ky), _sel_axis(p, kz)


def intersect_triangle(o, perm, p0, p1, p2, tmax):
    """Watertight test. `perm` from ray_permutation; o (...,3) ray origins;
    p0/p1/p2 (...,3) triangle vertices (broadcastable against rays).

    Returns (hit, t, b0, b1, b2) with barycentrics w.r.t. (p0, p1, p2).
    """
    kx, ky, kz, sx, sy, sz = perm
    a0x, a0y, a0z = _permute(p0 - o, kx, ky, kz)
    a1x, a1y, a1z = _permute(p1 - o, kx, ky, kz)
    a2x, a2y, a2z = _permute(p2 - o, kx, ky, kz)

    x0 = a0x - sx * a0z
    y0 = a0y - sy * a0z
    x1 = a1x - sx * a1z
    y1 = a1y - sy * a1z
    x2 = a2x - sx * a2z
    y2 = a2y - sy * a2z

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1

    # f64 edge recompute where any edge function is exactly zero
    # (triangle.cpp:264-275 falls back to double precision).
    need64 = (e0 == 0.0) | (e1 == 0.0) | (e2 == 0.0)
    x0d, y0d = x0.astype(jnp.float64), y0.astype(jnp.float64)
    x1d, y1d = x1.astype(jnp.float64), y1.astype(jnp.float64)
    x2d, y2d = x2.astype(jnp.float64), y2.astype(jnp.float64)
    e0 = jnp.where(need64, (x1d * y2d - y1d * x2d).astype(e0.dtype), e0)
    e1 = jnp.where(need64, (x2d * y0d - y2d * x0d).astype(e1.dtype), e1)
    e2 = jnp.where(need64, (x0d * y1d - y0d * x1d).astype(e2.dtype), e2)

    same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    det = e0 + e1 + e2

    z0 = sz * a0z
    z1 = sz * a1z
    z2 = sz * a2z
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2

    # reject t <= 0 or t >= tmax, sign-aware without dividing (triangle.cpp:291)
    pos_det = det > 0
    t_ok = jnp.where(
        pos_det, (t_scaled > 0) & (t_scaled < tmax * det),
        (t_scaled < 0) & (t_scaled > tmax * det),
    )
    hit = same_sign & (det != 0) & t_ok

    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    return hit, t, b0, b1, b2
