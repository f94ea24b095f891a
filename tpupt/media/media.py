"""Participating media (counterpart of src/media/ + core/medium.*).

Round-1 scope: one GLOBAL exterior medium (the common volpath configuration:
camera/scene immersed in fog/smoke) —
  * homogeneous: analytic transmittance + channel-balanced distance sampling
    (media/homogeneous.cpp:44,49)
  * grid: density trilinear lookup in a (nx,ny,nz) tensor with ratio-tracking
    transmittance and delta-tracking distance sampling (media/grid.cpp:62,90)
Henyey-Greenstein phase sampling/eval (core/medium.cpp HenyeyGreenstein).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

MEDIUM_NONE, MEDIUM_HOMOGENEOUS, MEDIUM_GRID = range(3)


class MediumParams(NamedTuple):
    """Static + tensor bundle for the global medium."""

    kind: int                 # static
    sigma_a: jnp.ndarray      # (3,)
    sigma_s: jnp.ndarray      # (3,)
    g: float                  # static HG asymmetry
    density: jnp.ndarray      # (nz, ny, nx) for grid; (1,1,1) otherwise
    w2m: jnp.ndarray          # (4,4) world-to-medium (grid)
    sigma_t_max: float        # static majorant (delta tracking)


def build_medium(rec, scene) -> Optional[MediumParams]:
    """MediumRecord (scene/api.py) -> MediumParams (MakeMedium parity,
    api.cpp:701-747)."""
    if rec is None:
        return None
    p = rec.params
    sa = p.find_one_spectrum("sigma_a", [1, 1, 1])
    ss = p.find_one_spectrum("sigma_s", [1, 1, 1])
    scale = p.find_one_float("scale", 1.0)
    g = p.find_one_float("g", 0.0)
    sa = np.asarray(sa) * scale
    ss = np.asarray(ss) * scale
    if rec.type == "heterogeneous" or rec.type == "grid":
        nx = p.find_one_int("nx", 1)
        ny = p.find_one_int("ny", 1)
        nz = p.find_one_int("nz", 1)
        d = p.find_floats("density")
        if d is None:
            d = np.ones(nx * ny * nz)
        density = np.asarray(d, np.float32).reshape(nz, ny, nx)
        p0 = p.find_one_point("p0", [0, 0, 0])
        p1 = p.find_one_point("p1", [1, 1, 1])
        # medium space = unit cube over [p0, p1] then medium_to_world
        from tpupt.core.transforms import Transform

        m2w = rec.medium_to_world * Transform.translate(p0) * Transform.scale(
            np.maximum(np.asarray(p1) - np.asarray(p0), 1e-9))
        sig_t = float((sa + ss).max())
        return MediumParams(
            kind=MEDIUM_GRID,
            sigma_a=jnp.asarray(sa, jnp.float32),
            sigma_s=jnp.asarray(ss, jnp.float32),
            g=g,
            density=jnp.asarray(density),
            w2m=jnp.asarray(m2w.m_inv.astype(np.float32)),
            sigma_t_max=sig_t * float(density.max()),
        )
    return MediumParams(
        kind=MEDIUM_HOMOGENEOUS,
        sigma_a=jnp.asarray(sa, jnp.float32),
        sigma_s=jnp.asarray(ss, jnp.float32),
        g=g,
        density=jnp.ones((1, 1, 1)),
        w2m=jnp.eye(4),
        sigma_t_max=float((sa + ss).max()),
    )


# --------------------------- phase function --------------------------------


def hg_phase(cos_theta, g: float):
    """HG phase value (medium.h PhaseHG)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * jnp.pi * denom * jnp.sqrt(
        jnp.maximum(denom, 1e-8)))


def hg_sample(axis, u1, u2, g: float):
    """Sample the HG phase around the PROPAGATION direction `axis` = -wo
    (medium.cpp Sample_p builds its frame around -wo): forward scattering
    (g > 0) continues near +axis. Returns (wi, pdf) where pdf uses the
    reference's wo-relative cosine convention (PhaseHG(dot(wo, wi)))."""
    from tpupt.core.vecmath import coordinate_system

    if abs(g) < 1e-3:
        cos_t = 1.0 - 2.0 * u1
    else:
        sq = (1.0 - g * g) / (1.0 + g - 2.0 * g * u1)
        cos_t = (1.0 + g * g - sq * sq) / (2.0 * g)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    t, b = coordinate_system(axis)
    wi = (sin_t * jnp.cos(phi))[..., None] * t \
        + (sin_t * jnp.sin(phi))[..., None] * b + cos_t[..., None] * axis
    # dot(wo, wi) = -cos_t since wo = -axis
    return wi, hg_phase(-cos_t, g)


# ------------------------------ grid lookup --------------------------------


def grid_density(mp: MediumParams, p_world):
    """Trilinear density lookup (grid.cpp Density/D)."""
    ph = jnp.einsum("ij,...j->...i", mp.w2m[:3, :3], p_world) + mp.w2m[:3, 3]
    nz, ny, nx = mp.density.shape
    g = jnp.stack([ph[..., 0] * nx - 0.5, ph[..., 1] * ny - 0.5,
                   ph[..., 2] * nz - 0.5], -1)
    gi = jnp.floor(g)
    gf = g - gi

    def d_at(ix, iy, iz):
        inside = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                  & (iz >= 0) & (iz < nz))
        ix = jnp.clip(ix, 0, nx - 1)
        iy = jnp.clip(iy, 0, ny - 1)
        iz = jnp.clip(iz, 0, nz - 1)
        return jnp.where(inside, mp.density[iz, iy, ix], 0.0)

    ix = gi[..., 0].astype(jnp.int32)
    iy = gi[..., 1].astype(jnp.int32)
    iz = gi[..., 2].astype(jnp.int32)
    fx, fy, fz = gf[..., 0], gf[..., 1], gf[..., 2]
    d00 = d_at(ix, iy, iz) * (1 - fx) + d_at(ix + 1, iy, iz) * fx
    d10 = d_at(ix, iy + 1, iz) * (1 - fx) + d_at(ix + 1, iy + 1, iz) * fx
    d01 = d_at(ix, iy, iz + 1) * (1 - fx) + d_at(ix + 1, iy, iz + 1) * fx
    d11 = d_at(ix, iy + 1, iz + 1) * (1 - fx) + d_at(ix + 1, iy + 1, iz + 1) * fx
    return (d00 * (1 - fy) + d10 * fy) * (1 - fz) + (d01 * (1 - fy) + d11 * fy) * fz


# ------------------------- transmittance / sampling ------------------------


def transmittance(mp: MediumParams, o, d, t_max, u_keys):
    """Tr along [0, t_max] (homogeneous: Beer-Lambert closed form,
    homogeneous.cpp:44; grid: ratio tracking, grid.cpp:62). Returns (N,3)."""
    t_max_c = jnp.minimum(t_max, 1e7)  # escaped rays: clamp for stability
    sigma_t = mp.sigma_a + mp.sigma_s
    if mp.kind == MEDIUM_HOMOGENEOUS:
        return jnp.exp(-sigma_t[None, :] * t_max_c[..., None])
    # ratio tracking with fixed step count (static trip; grid.cpp:62)
    from tpupt.core.rng import uniform_float

    n = o.shape[0]
    inv_max = 1.0 / max(mp.sigma_t_max, 1e-9)
    TR_STEPS = 32
    tr = jnp.ones(n)
    t = jnp.zeros(n)
    for k in range(TR_STEPS):
        u = uniform_float(u_keys, jnp.uint32(k), jnp.uint32(7919))
        t = t - jnp.log(1.0 - u) * inv_max
        active = t < t_max_c
        dens = grid_density(mp, o + t[..., None] * d)
        s_t = dens * float(np.max(np.asarray(sigma_t)))
        tr = tr * jnp.where(active, 1.0 - jnp.maximum(0.0, s_t * inv_max), 1.0)
    return jnp.repeat(tr[..., None], 3, -1)


def sample_distance(mp: MediumParams, o, d, t_surf, u1, u_keys):
    """Sample a medium interaction before t_surf.
    Homogeneous: channel-balanced exponential (homogeneous.cpp:49).
    Grid: delta tracking (grid.cpp:90).
    Returns (interacted (N,), t_m (N,), weight (N,3))."""
    sigma_t = mp.sigma_a + mp.sigma_s
    t_surf_c = jnp.minimum(t_surf, 1e7)
    if mp.kind == MEDIUM_HOMOGENEOUS:
        # sample channel uniformly then distance (homogeneous.cpp:49-77)
        from tpupt.core.rng import uniform_float

        n = o.shape[0]
        ch = jnp.minimum((u1 * 3).astype(jnp.int32), 2)
        s_ch = sigma_t[ch]
        u2 = uniform_float(u_keys, jnp.uint32(3571))
        t_m = -jnp.log(jnp.maximum(1.0 - u2, 1e-9)) / jnp.maximum(s_ch, 1e-9)
        interacted = t_m < t_surf_c
        t_eval = jnp.minimum(t_m, t_surf_c)
        tr = jnp.exp(-sigma_t[None, :] * t_eval[..., None])
        # pdf averaged over channels
        pdf_m = jnp.mean(sigma_t[None, :] * tr, -1)
        pdf_s = jnp.mean(tr, -1)
        w_m = tr * mp.sigma_s[None, :] / jnp.maximum(pdf_m, 1e-12)[..., None]
        w_s = tr / jnp.maximum(pdf_s, 1e-12)[..., None]
        weight = jnp.where(interacted[..., None], w_m, w_s)
        return interacted, t_m, weight
    # delta tracking (grid.cpp:90): fixed-step woodcock tracking
    from tpupt.core.rng import uniform_float

    n = o.shape[0]
    inv_max = 1.0 / max(mp.sigma_t_max, 1e-9)
    sig_t_mean = float(np.mean(np.asarray(sigma_t)))
    t = jnp.zeros(n)
    done = jnp.zeros(n, bool)
    interacted = jnp.zeros(n, bool)
    for k in range(64):
        u = uniform_float(u_keys, jnp.uint32(k), jnp.uint32(104729))
        t_new = t - jnp.log(1.0 - u) * inv_max
        past = t_new >= t_surf_c
        dens = grid_density(mp, o + t_new[..., None] * d)
        u2 = uniform_float(u_keys, jnp.uint32(k), jnp.uint32(1299709))
        real = u2 < dens * sig_t_mean * inv_max
        hit_m = ~done & ~past & real
        interacted = interacted | hit_m
        t = jnp.where(done, t, t_new)
        done = done | past | hit_m
    weight = jnp.where(interacted[..., None],
                       mp.sigma_s[None, :] / jnp.maximum(sigma_t, 1e-9)[None, :],
                       jnp.ones((n, 3)))
    return interacted, t, weight