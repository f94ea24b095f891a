"""Separable BSSRDF with the Burley normalized-diffusion profile
(counterpart of core/bssrdf.{h,cpp} TabulatedBSSRDF + its probe-ray
sampling, bssrdf.cpp:130-240).

The reference tabulates a beam-diffusion profile and samples exit points
with probe rays against the scene; here the profile is the analytic
two-exponential Burley approximation

    Sp(r) = rho * (e^{-r/d} + e^{-r/(3d)}) / (8 pi d r)

whose radial CDF  1 - e^{-r/d}/4 - 3 e^{-r/(3d)}/4  is inverted by
bisection, per channel, wholly branch-free. The probe ray descends the
shading normal from a disk point at the sampled radius and accepts the
first hit carrying the same material (the reference's intersection chain,
bssrdf.cpp:170-214, keeps a list; one probe is the single-sample version).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupt.core import rng as rngm
from tpupt.core.sampling import cosine_sample_hemisphere
from tpupt.core.vecmath import coordinate_system, dot, normalize, \
    offset_ray_origin
from tpupt.materials.bsdf import fr_dielectric, to_world

INV_8PI = 1.0 / (8.0 * jnp.pi)


def burley_profile(r, d):
    """Area-measure normalized Sp/rho (unit integral over the plane)."""
    d = jnp.maximum(d, 1e-6)
    r = jnp.maximum(r, 1e-6)
    return (jnp.exp(-r / d) + jnp.exp(-r / (3.0 * d))) * INV_8PI / (d * r)


def burley_cdf(r, d):
    d = jnp.maximum(d, 1e-6)
    return 1.0 - 0.25 * jnp.exp(-r / d) - 0.75 * jnp.exp(-r / (3.0 * d))


def burley_sample_r(u, d):
    """Invert the radial CDF by bisection (20 steps cover f32 precision)."""
    d = jnp.maximum(d, 1e-6)
    lo = jnp.zeros_like(d)
    hi = 40.0 * d
    for _ in range(24):
        mid = 0.5 * (lo + hi)
        below = burley_cdf(mid, d) < u
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    return 0.5 * (lo + hi)


def fresnel_moment1(inv_eta):
    """First Fresnel moment polynomial (bssrdf.cpp FresnelMoment1)."""
    e = inv_eta
    e2 = e * e
    e3 = e2 * e
    e4 = e3 * e
    e5 = e4 * e
    lo = (0.45966 - 1.73965 * e + 3.37668 * e2 - 3.904945 * e3
          + 2.49277 * e4 - 0.68441 * e5)
    hi = (-4.61686 + 11.1136 * e - 10.4646 * e2 + 5.11455 * e3
          - 1.27198 * e4 + 0.12746 * e5)
    return jnp.where(e < 1.0, lo, hi)


_RADIUS0 = 2.5e-3          # shared optical radius grid (bssrdf.cpp:664)
_LOG_RATIO = float(jnp.log(1.2))


def _tab_profile_eval(P, r_opt):
    """Interpolate the per-lane (N, 64) profile rows at optical radius
    r_opt (N,). The grid is geometric (r_j = 2.5e-3 * 1.2^(j-1), r_0 = 0)
    so the bracketing index is a log, not a search."""
    j = 1.0 + jnp.log(jnp.maximum(r_opt, _RADIUS0) / _RADIUS0) / _LOG_RATIO
    j = jnp.clip(j, 0.0, 62.999)
    j0 = j.astype(jnp.int32)
    w = j - j0.astype(jnp.float32)
    p0 = jnp.take_along_axis(P, j0[:, None], 1)[:, 0]
    p1 = jnp.take_along_axis(P, (j0 + 1)[:, None], 1)[:, 0]
    lo = r_opt < _RADIUS0  # first segment is [0, 2.5e-3], linear in r
    w = jnp.where(lo, r_opt / _RADIUS0, w)
    p0 = jnp.where(lo, jnp.take_along_axis(P, jnp.zeros_like(j0)[:, None],
                                           1)[:, 0], p0)
    return (1.0 - w) * p0 + w * p1


def tabulated_sample_weight(ds, mat_id, ch, u_r, r_dummy):
    """(r, w_profile_rgb) from the tabulated beam-diffusion profile
    (TabulatedBSSRDF::Sr / Sample_Sr, bssrdf.cpp:277-340): one packed
    row gather per lane; radius from the per-channel piecewise-linear
    inverse cdf; the channel-MIS weight is Sp_rgb / mean_c(Sp_c/rho_eff_c)
    exactly like the Burley path (area-measure densities)."""
    row = ds.sss_pack[mat_id]
    sig_t = jnp.maximum(row[:, 0:3], 1e-6)
    rho_eff = jnp.maximum(row[:, 3:6], 1e-6)
    P = row[:, 6:198].reshape(-1, 3, 64)
    inv = row[:, 198:390].reshape(-1, 3, 64)
    inv_c = jnp.take_along_axis(
        inv, ch[:, None, None], 1)[:, 0, :]           # (N, 64)
    f = jnp.clip(u_r, 0.0, 1.0 - 1e-6) * 63.0
    j0 = f.astype(jnp.int32)
    w = f - j0.astype(jnp.float32)
    r0 = jnp.take_along_axis(inv_c, j0[:, None], 1)[:, 0]
    r1 = jnp.take_along_axis(inv_c, (j0 + 1)[:, None], 1)[:, 0]
    r_opt_c = (1.0 - w) * r0 + w * r1
    sig_c = jnp.take_along_axis(sig_t, ch[:, None], 1)[:, 0]
    r = jnp.maximum(r_opt_c / sig_c, 1e-6)
    # Sp_c(r) = sigma_t_c * P_c(sigma_t_c r) / (2 pi r)  (area measure)
    sp_rgb = jnp.stack(
        [sig_t[:, c] * _tab_profile_eval(P[:, c, :], r * sig_t[:, c])
         for c in range(3)], -1) / (2.0 * jnp.pi * r[:, None])
    pdf_mix = jnp.mean(sp_rgb / rho_eff, -1)
    w_profile = sp_rgb / jnp.maximum(pdf_mix, 1e-20)[:, None]
    return r, w_profile


def sss_exit(ds, st, isect, mp, sp, entered, key):
    """Sample a BSSRDF exit VERTEX for lanes that transmitted into a
    subsurface material (Sample_Sp, bssrdf.cpp:158-230). Returns
    (p_exit, n_exit, w_profile_rgb, c_norm, ok); the caller runs NEE and
    the Sw exit lobe at the vertex like path.cpp:167-189. The radial
    profile is the tabulated beam-diffusion model (bssrdf.cpp:145) when
    the scene carries tables, else the Burley approximation."""
    u_ch = rngm.uniform_float(key, 101)
    u_r = rngm.uniform_float(key, 102)
    u_phi = rngm.uniform_float(key, 103)

    d_rgb = jnp.maximum(mp.extra[:, 0:3], 1e-6)
    rho = mp.kd
    ch = jnp.minimum((u_ch * 3.0).astype(jnp.int32), 2)
    d_c = jnp.take_along_axis(d_rgb, ch[:, None], 1)[:, 0]
    if getattr(st, "has_bssrdf_table", False):
        r, w_tab = tabulated_sample_weight(ds, sp.mat, ch, u_r, d_c)
    else:
        r = burley_sample_r(u_r, d_c)

    # probe straight down the shading normal from a disk point at radius r
    # (single-axis version of the reference's 3-axis probe chain)
    t_f, b_f = coordinate_system(sp.ns)
    phi = 2.0 * jnp.pi * u_phi
    p_base = sp.p + r[:, None] * (jnp.cos(phi)[:, None] * t_f
                                  + jnp.sin(phi)[:, None] * b_f)
    h = jnp.maximum(r, 1e-4)
    o_probe = p_base + h[:, None] * sp.ns
    probe_len = 2.0 * h
    hit, _ = isect(ds, st, o_probe, -sp.ns,
                   jnp.where(entered, probe_len * 1.01, 0.0))
    from tpupt.integrators.path import shading_point

    spe = shading_point(ds, st, hit, o_probe, -sp.ns)
    same_mat = spe.mat == sp.mat
    ok = entered & hit.valid & same_mat
    p_exit = jnp.where(ok[:, None], spe.p, sp.p)
    n_exit = jnp.where(ok[:, None], spe.ns, sp.ns)

    # channel-MIS profile weight: Sp_rgb(r) / mean_c pdf_c(r)
    if getattr(st, "has_bssrdf_table", False):
        # tabulated Sp already integrates to rho_eff — no extra rho scale
        w_profile = w_tab
    else:
        prof_rgb = burley_profile(r[:, None], d_rgb)
        pdf_mix = jnp.mean(prof_rgb, -1)
        w_profile = rho * prof_rgb / jnp.maximum(pdf_mix, 1e-20)[:, None]

    eta1 = mp.eta[:, 0]
    c_norm = jnp.maximum(1.0 - 2.0 * fresnel_moment1(1.0 / eta1), 1e-3)
    return p_exit, n_exit, w_profile, c_norm, ok


def sw_lobe(eta1, c_norm, cos_local):
    """Sw directional factor (SeparableBSSRDF::Sw, bssrdf.h:80):
    (1 - Fr(cos)) / (c * pi) — a cosine-hemisphere-like exit lobe."""
    fr = fr_dielectric(cos_local, eta1)
    return (1.0 - fr) / (c_norm * jnp.pi)
