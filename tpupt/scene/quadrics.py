"""Quadric shapes as parametric tessellations (src/shapes/{cylinder,disk,cone,
paraboloid,hyperboloid}.cpp counterparts).

Spheres are intersected analytically on device (shapes/sphere.py); the other
quadrics are tessellated here at flatten time into triangle meshes with exact
parametric normals — on TPU a dense triangle soup through the one batched
intersector beats per-type analytic branches."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _grid_faces(nu: int, nv: int) -> np.ndarray:
    """Triangulate an (nu+1)x(nv+1) vertex grid."""
    i, j = np.meshgrid(np.arange(nu), np.arange(nv), indexing="ij")
    v00 = (i * (nv + 1) + j).ravel()
    v10 = ((i + 1) * (nv + 1) + j).ravel()
    v01 = (i * (nv + 1) + j + 1).ravel()
    v11 = ((i + 1) * (nv + 1) + j + 1).ravel()
    return np.concatenate(
        [np.stack([v00, v10, v11], -1), np.stack([v00, v11, v01], -1)]
    ).astype(np.int32)


def _param_mesh(fp, fn, u0, u1, v0, v1, nu, nv) -> Tuple[np.ndarray, ...]:
    u = np.linspace(u0, u1, nu + 1)
    v = np.linspace(v0, v1, nv + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    P = fp(uu.ravel(), vv.ravel())
    N = fn(uu.ravel(), vv.ravel())
    uvs = np.stack([(uu.ravel() - u0) / max(u1 - u0, 1e-12),
                    (vv.ravel() - v0) / max(v1 - v0, 1e-12)], -1)
    return P, N, uvs, _grid_faces(nu, nv)


def tessellate_cylinder(radius, zmin, zmax, phimax_deg, nu=64, nv=8):
    phimax = np.deg2rad(phimax_deg)

    def fp(u, v):
        phi = u * phimax
        return np.stack([radius * np.cos(phi), radius * np.sin(phi),
                         zmin + v * (zmax - zmin)], -1)

    def fn(u, v):
        phi = u * phimax
        return np.stack([np.cos(phi), np.sin(phi), np.zeros_like(u)], -1)

    return _param_mesh(fp, fn, 0, 1, 0, 1, nu, nv)


def tessellate_disk(height, radius, inner_radius, phimax_deg, nu=64, nv=4):
    phimax = np.deg2rad(phimax_deg)

    def fp(u, v):
        phi = u * phimax
        r = radius + v * (inner_radius - radius)
        return np.stack([r * np.cos(phi), r * np.sin(phi),
                         np.full_like(u, height)], -1)

    def fn(u, v):
        return np.stack([np.zeros_like(u), np.zeros_like(u), np.ones_like(u)], -1)

    return _param_mesh(fp, fn, 0, 1, 0, 1, nu, nv)


def tessellate_cone(height, radius, phimax_deg, nu=64, nv=16):
    phimax = np.deg2rad(phimax_deg)

    def fp(u, v):
        phi = u * phimax
        r = radius * (1.0 - v)
        return np.stack([r * np.cos(phi), r * np.sin(phi), v * height], -1)

    def fn(u, v):
        phi = u * phimax
        # dpdu x dpdv for cone (cone.cpp Intersect normal math)
        n = np.stack([height * np.cos(phi), height * np.sin(phi),
                      np.full_like(u, radius)], -1)
        return n / np.linalg.norm(n, axis=-1, keepdims=True)

    return _param_mesh(fp, fn, 0, 1, 0, 1 - 1e-4, nu, nv)


def tessellate_paraboloid(radius, zmin, zmax, phimax_deg, nu=64, nv=16):
    phimax = np.deg2rad(phimax_deg)
    k = zmax / (radius * radius)

    def fp(u, v):
        phi = u * phimax
        z = zmin + v * (zmax - zmin)
        r = np.sqrt(np.maximum(z / k, 0.0))
        return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)

    def fn(u, v):
        phi = u * phimax
        z = np.maximum(zmin + v * (zmax - zmin), 1e-8)
        r = np.sqrt(z / k)
        # gradient of (x^2+y^2) * k - z
        n = np.stack([2 * k * r * np.cos(phi), 2 * k * r * np.sin(phi),
                      -np.ones_like(u)], -1)
        n = -n
        return n / np.linalg.norm(n, axis=-1, keepdims=True)

    return _param_mesh(fp, fn, 0, 1, max(1e-5, zmin / max(zmax, 1e-9)) * 0, 1, nu, nv)


def tessellate_hyperboloid(p1, p2, phimax_deg, nu=64, nv=16):
    phimax = np.deg2rad(phimax_deg)
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)

    def fp(u, v):
        phi = u * phimax
        pr = (1 - v)[:, None] * p1[None, :] + v[:, None] * p2[None, :]
        x = pr[:, 0] * np.cos(phi) - pr[:, 1] * np.sin(phi)
        y = pr[:, 0] * np.sin(phi) + pr[:, 1] * np.cos(phi)
        return np.stack([x, y, pr[:, 2]], -1)

    def fn(u, v):
        # finite-difference normals (hyperboloid.cpp computes dpdu x dpdv)
        eps = 1e-4
        p0 = fp(u, v)
        pu = fp(u + eps, v)
        pv = fp(u, np.minimum(v + eps, 1.0))
        n = np.cross(pu - p0, pv - p0)
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.where(ln > 0, ln, 1.0)

    return _param_mesh(fp, fn, 0, 1, 0, 1, nu, nv)


def tessellate_heightfield(nx: int, ny: int, z: np.ndarray):
    """Heightfield -> trianglemesh (shapes/heightfield.cpp CreateHeightfield)."""
    x = np.linspace(0, 1, nx)
    y = np.linspace(0, 1, ny)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    P = np.stack([xx.ravel(), yy.ravel(), np.asarray(z, np.float64).reshape(nx, ny).ravel()], -1)
    F = _grid_faces(nx - 1, ny - 1)
    return P, None, np.stack([xx.ravel(), yy.ravel()], -1), F
