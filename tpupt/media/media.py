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

# --------------------- per-interface media (MediaTable) ---------------------
#
# Round-2 upgrade (VERDICT #5): the reference attaches a MediumInterface to
# every primitive (core/medium.h) and rays carry their current medium;
# volpath switches media at transitions (volpath.cpp:55) and shadow rays
# accumulate Tr across null interfaces (Scene::IntersectTr, scene.cpp:57-73).
# TPU-first shape: ALL named media stacked into one table, per-lane medium
# ids gathered into the wavefront, one vectorized Tr/distance kernel.


class MediaTable(NamedTuple):
    """All scene media stacked; med id indexes rows, -1 = vacuum."""

    sigma_a: jnp.ndarray   # (M,3)
    sigma_s: jnp.ndarray   # (M,3)
    g: jnp.ndarray         # (M,)
    majorant: jnp.ndarray  # (M,) sigma_t_max * density_max (delta tracking)
    is_grid: jnp.ndarray   # (M,) bool
    density: jnp.ndarray   # flat atlas of all grid texels (>=1 entry)
    dens_off: jnp.ndarray  # (M,) i32 offset into density
    dens_dims: jnp.ndarray  # (M,3) i32 (nx, ny, nz)
    w2m: jnp.ndarray       # (M,4,4) world -> unit-cube medium space


def build_media_table(scene):
    """FlatScene -> (MediaTable | None, any_grid: bool). Order follows
    scene.media_order (the ids baked into prim med_in/med_out)."""
    order = scene.media_order or []
    if not order:
        return None, False
    params = [build_medium(scene.media[name], scene) for name in order]
    m = len(params)
    dens_chunks, offs, dims = [], [], []
    cur = 0
    for p in params:
        d = np.asarray(p.density, np.float32)
        offs.append(cur)
        nz, ny, nx = d.shape
        dims.append((nx, ny, nz))
        dens_chunks.append(d.reshape(-1))
        cur += d.size
    any_grid = any(p.kind == MEDIUM_GRID for p in params)
    return MediaTable(
        sigma_a=jnp.stack([p.sigma_a for p in params]),
        sigma_s=jnp.stack([p.sigma_s for p in params]),
        g=jnp.asarray([p.g for p in params], jnp.float32),
        majorant=jnp.asarray([p.sigma_t_max for p in params], jnp.float32),
        is_grid=jnp.asarray([p.kind == MEDIUM_GRID for p in params]),
        density=jnp.concatenate(dens_chunks),
        dens_off=jnp.asarray(offs, jnp.int32),
        dens_dims=jnp.asarray(dims, jnp.int32),
        w2m=jnp.stack([p.w2m for p in params]),
    ), any_grid


def _grid_density_lane(mt: MediaTable, mi, p_world):
    """Per-lane trilinear density from the atlas (grid.cpp Density)."""
    w2m = mt.w2m[mi]
    ph = jnp.einsum("nij,nj->ni", w2m[:, :3, :3], p_world) + w2m[:, :3, 3]
    dims = mt.dens_dims[mi]
    nx = dims[:, 0]
    ny = dims[:, 1]
    nz = dims[:, 2]
    off = mt.dens_off[mi]
    g = jnp.stack([ph[:, 0] * nx - 0.5, ph[:, 1] * ny - 0.5,
                   ph[:, 2] * nz - 0.5], -1)
    gi = jnp.floor(g)
    gf = g - gi

    def d_at(ix, iy, iz):
        inside = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                  & (iz >= 0) & (iz < nz))
        ix = jnp.clip(ix, 0, nx - 1)
        iy = jnp.clip(iy, 0, ny - 1)
        iz = jnp.clip(iz, 0, nz - 1)
        idx = off + (iz * ny + iy) * nx + ix
        return jnp.where(inside, mt.density[idx], 0.0)

    ix = gi[:, 0].astype(jnp.int32)
    iy = gi[:, 1].astype(jnp.int32)
    iz = gi[:, 2].astype(jnp.int32)
    fx, fy, fz = gf[:, 0], gf[:, 1], gf[:, 2]
    d00 = d_at(ix, iy, iz) * (1 - fx) + d_at(ix + 1, iy, iz) * fx
    d10 = d_at(ix, iy + 1, iz) * (1 - fx) + d_at(ix + 1, iy + 1, iz) * fx
    d01 = d_at(ix, iy, iz + 1) * (1 - fx) + d_at(ix + 1, iy, iz + 1) * fx
    d11 = (d_at(ix, iy + 1, iz + 1) * (1 - fx)
           + d_at(ix + 1, iy + 1, iz + 1) * fx)
    return ((d00 * (1 - fy) + d10 * fy) * (1 - fz)
            + (d01 * (1 - fy) + d11 * fy) * fz)


def tr_lane(mt: MediaTable, any_grid: bool, med, o, d, t_max, u_keys):
    """Per-lane transmittance for (N,) medium ids (-1 = vacuum -> 1).
    Homogeneous: Beer-Lambert; grid: ratio tracking over the atlas."""
    mi = jnp.maximum(med, 0)
    sigma_t = mt.sigma_a[mi] + mt.sigma_s[mi]
    nch = sigma_t.shape[-1]  # 3 (RGB) or the spectral bin count
    t_c = jnp.minimum(t_max, 1e7)
    tr = jnp.exp(-sigma_t * t_c[..., None])
    if any_grid:
        from tpupt.core.rng import uniform_float

        n = o.shape[0]
        inv_max = 1.0 / jnp.maximum(mt.majorant[mi], 1e-9)
        sig_mean = jnp.mean(sigma_t, -1)
        trg = jnp.ones(n)
        t = jnp.zeros(n)
        for k in range(32):
            u = uniform_float(u_keys, jnp.uint32(k), jnp.uint32(7919))
            t = t - jnp.log(1.0 - u) * inv_max
            active = t < t_c
            dens = _grid_density_lane(mt, mi, o + t[..., None] * d)
            trg = trg * jnp.where(
                active, 1.0 - jnp.maximum(0.0, dens * sig_mean * inv_max),
                1.0)
        tr = jnp.where(mt.is_grid[mi][..., None],
                       jnp.repeat(trg[..., None], nch, -1), tr)
    return jnp.where((med >= 0)[..., None], tr, 1.0)


def sample_distance_lane(mt: MediaTable, any_grid: bool, med, o, d, t_surf,
                         u1, u_keys):
    """Per-lane medium-interaction sampling; vacuum lanes never interact.
    Returns (interacted (N,), t_m (N,), weight (N,3))."""
    from tpupt.core.rng import uniform_float

    n = o.shape[0]
    mi = jnp.maximum(med, 0)
    sigma_a = mt.sigma_a[mi]
    sigma_s = mt.sigma_s[mi]
    sigma_t = sigma_a + sigma_s
    nch = sigma_t.shape[-1]  # 3 (RGB) or the spectral bin count
    t_c = jnp.minimum(t_surf, 1e7)

    # homogeneous: channel-balanced exponential (homogeneous.cpp:49-77)
    ch = jnp.minimum((u1 * nch).astype(jnp.int32), nch - 1)
    s_ch = jnp.take_along_axis(sigma_t, ch[:, None], 1)[:, 0]
    u2 = uniform_float(u_keys, jnp.uint32(3571))
    t_m = -jnp.log(jnp.maximum(1.0 - u2, 1e-9)) / jnp.maximum(s_ch, 1e-9)
    inter_h = t_m < t_c
    t_eval = jnp.minimum(t_m, t_c)
    tr = jnp.exp(-sigma_t * t_eval[..., None])
    pdf_m = jnp.mean(sigma_t * tr, -1)
    pdf_s = jnp.mean(tr, -1)
    w_m = tr * sigma_s / jnp.maximum(pdf_m, 1e-12)[..., None]
    w_s = tr / jnp.maximum(pdf_s, 1e-12)[..., None]
    interacted = inter_h
    weight = jnp.where(inter_h[..., None], w_m, w_s)

    if any_grid:
        # delta tracking (grid.cpp:90) per lane
        inv_max = 1.0 / jnp.maximum(mt.majorant[mi], 1e-9)
        sig_mean = jnp.mean(sigma_t, -1)
        t = jnp.zeros(n)
        done = jnp.zeros(n, bool)
        inter_g = jnp.zeros(n, bool)
        for k in range(64):
            u = uniform_float(u_keys, jnp.uint32(k), jnp.uint32(104729))
            t_new = t - jnp.log(1.0 - u) * inv_max
            past = t_new >= t_c
            dens = _grid_density_lane(mt, mi, o + t_new[..., None] * d)
            u2g = uniform_float(u_keys, jnp.uint32(k), jnp.uint32(1299709))
            real = u2g < dens * sig_mean * inv_max
            hit_m = ~done & ~past & real
            inter_g = inter_g | hit_m
            t = jnp.where(done, t, t_new)
            done = done | past | hit_m
        w_g = jnp.where(inter_g[..., None],
                        sigma_s / jnp.maximum(sigma_t, 1e-9), 1.0)
        grid_lane = mt.is_grid[mi]
        interacted = jnp.where(grid_lane, inter_g, interacted)
        t_m = jnp.where(grid_lane, t, t_m)
        weight = jnp.where(grid_lane[..., None], w_g, weight)

    vac = med < 0
    interacted = interacted & ~vac
    weight = jnp.where(vac[..., None], 1.0, weight)
    return interacted, t_m, weight
