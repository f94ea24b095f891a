"""Volumetric path integrator (counterpart of src/integrators/volpath.cpp).

Round-2 upgrade: PER-INTERFACE media (VERDICT #5). Every primitive carries a
MediumInterface (medium.h; flattened to ds.prim_med_in/out), each ray lane
carries its current medium id, and:

  * distance sampling runs against the lane's CURRENT medium via the
    stacked MediaTable (media/media.py) — vacuum lanes (-1) never interact;
  * hits on interface-only primitives (Material "none") pass through
    WITHOUT consuming a path vertex, switching the lane's medium when the
    interface is a transition (volpath.cpp: material==nullptr continue);
  * refraction through transition primitives switches the medium by the
    crossing direction (entering = wi against the geometric normal);
  * NEE shadow rays accumulate Tr across up to `shadow_segments` null
    interfaces (Scene::IntersectTr, scene.cpp:57-73) — lanes still crossing
    after the budget are conservatively treated as occluded;
  * the wavefront loop runs max_depth+1+extra iterations with a PER-LANE
    real-vertex counter (null pass-throughs don't advance the counter, so
    sampler dimensions and Russian roulette stay aligned with path.py).

Medium decisions use hashed counter RNG (the reference consumes sampler
dims; hashing keeps the LDS dimension layout identical to path.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core import rng as rngm
from tpupt.core.sampling import power_heuristic
from tpupt.core.vecmath import absdot, normalize, offset_ray_origin
from tpupt.lights.lights import emitted_radiance, pdf_li, sample_li
from tpupt.materials import bsdf as bx
from tpupt.media.media import (MediaTable, hg_phase, sample_distance_lane,
                               tr_lane)
from tpupt.integrators.path import (miss_radiance_and_pdf, shading_point,
                                    _RR_START)


def media_view(ds) -> MediaTable:
    """The stacked media table carried inside DeviceScene."""
    return MediaTable(
        sigma_a=ds.med_sigma_a, sigma_s=ds.med_sigma_s, g=ds.med_g,
        majorant=ds.med_majorant, is_grid=ds.med_is_grid,
        density=ds.med_density, dens_off=ds.med_dens_off,
        dens_dims=ds.med_dens_dims, w2m=ds.med_w2m)


def _raw_gn(ds, st, prim, p):
    """RAW geometric normal (winding/orientation-baked) — defines the
    inside/outside convention of MediumInterface (medium.h)."""
    pr = jnp.maximum(prim, 0)
    is_tri = pr < st.n_tris
    tid = jnp.clip(pr, 0, max(st.n_tris - 1, 0))
    gn_t = jnp.cross(ds.tri_p1[tid] - ds.tri_p0[tid],
                     ds.tri_p2[tid] - ds.tri_p0[tid])
    sid = jnp.clip(pr - st.n_tris, 0, max(st.n_spheres - 1, 0))
    center = ds.sph_o2w[sid][:, :3, 3]
    gn_s = (p - center) * jnp.where(ds.sph_reverse[sid], -1.0, 1.0)[..., None]
    return normalize(jnp.where(is_tri[..., None], gn_t, gn_s))


def _prim_mat(ds, st, prim):
    pr = jnp.maximum(prim, 0)
    is_tri = pr < st.n_tris
    tid = jnp.clip(pr, 0, max(st.n_tris - 1, 0))
    sid = jnp.clip(pr - st.n_tris, 0, max(st.n_spheres - 1, 0))
    return jnp.where(is_tri, ds.tri_mat[tid], ds.sph_mat[sid])


def _hg_sample_lane(axis, u1, u2, g):
    """Per-lane-g HG sampling (medium.cpp Sample_p), branchless in g."""
    from tpupt.core.vecmath import coordinate_system

    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - g * g) / (1.0 + g - 2.0 * g * u1)
    cos_g = (1.0 + g * g - sq * sq) / (2.0 * g_safe)
    cos_t = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u1,
                      jnp.clip(cos_g, -1.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    t, b = coordinate_system(axis)
    wi = (sin_t * jnp.cos(phi))[..., None] * t \
        + (sin_t * jnp.sin(phi))[..., None] * b + cos_t[..., None] * axis
    return wi, hg_phase(-cos_t, g)


def volpath_li(ds, st, sampler, max_depth: int, rr_threshold: float,
               px, py, sample_idx, o, d, isect, isect_p,
               medium=None):
    """Trace a camera-ray batch through per-interface media + surfaces.
    `medium` (legacy positional slot) is ignored — media come from ds."""
    n = o.shape[0]
    # spectral transport (SampledSpectrum parity for volpath.cpp): colors
    # uplift where they enter the throughput chain; the medium sigma tables
    # are uplifted ONCE so Beer-Lambert exponentiates per spectral bin
    # (exp of the uplifted sigma, not an uplift of the RGB exp)
    n_chan = getattr(st, "n_channels", 3)
    if n_chan == 3:
        def spec(x):
            return x
    else:
        from tpupt.core.spectrum import rgb_to_spectrum as spec
    mt = media_view(ds)
    if n_chan != 3:
        mt = mt._replace(sigma_a=spec(mt.sigma_a), sigma_s=spec(mt.sigma_s))
    any_grid = st.any_grid_media
    has_ifaces = st.has_med_interfaces
    extra_depth = 4 if has_ifaces else 0
    shadow_segments = 4 if has_ifaces else 1

    dims = []
    for bounce in range(max_depth):
        base = 5 + bounce * 7
        dims.append(jnp.stack(
            [sampler.dim(px, py, sample_idx, base + k) for k in range(7)]))
    u_all = jnp.stack(dims) if dims else jnp.zeros((1, 7, n))
    n_dims = u_all.shape[0]

    light_cdf = jnp.cumsum(ds.light_pdf)
    inf_pmf = 1.0 / max(st.n_lights, 1)
    tmax_init = jnp.full(n, jnp.inf)
    pix_key = rngm.uniform_u32(px.astype(jnp.uint32), py.astype(jnp.uint32),
                               jnp.asarray(sample_idx).astype(jnp.uint32))

    class _S(NamedTuple):
        o: jnp.ndarray
        d: jnp.ndarray
        L: jnp.ndarray
        beta: jnp.ndarray
        alive: jnp.ndarray
        prev_specular: jnp.ndarray
        prev_pdf: jnp.ndarray
        prev_p: jnp.ndarray
        path_len: jnp.ndarray
        cur_med: jnp.ndarray  # (N,) i32 current medium id, -1 = vacuum
        vert: jnp.ndarray     # (N,) i32 REAL path vertices consumed

    init = _S(o=o, d=d, L=jnp.zeros((n, n_chan)),
              beta=jnp.ones((n, n_chan)),
              alive=jnp.ones(n, bool), prev_specular=jnp.ones(n, bool),
              prev_pdf=jnp.ones(n), prev_p=o,
              path_len=jnp.zeros(n, jnp.int32),
              cur_med=jnp.full(n, st.camera_medium, jnp.int32),
              vert=jnp.zeros(n, jnp.int32))

    def shadow_tr(p_from, wi, dist, can, med0, keys):
        """IntersectTr (scene.cpp:57-73): occlusion + accumulated Tr across
        up to shadow_segments-1 null-interface crossings."""
        if shadow_segments == 1:
            # no interface media: one any-hit + Tr through the lane's medium
            occ, _ = isect_p(ds, st, p_from, wi,
                             jnp.where(can, dist * 0.999, 0.0))
            tr = tr_lane(mt, any_grid, med0, p_from, wi, dist,
                         rngm.hash_combine(keys, jnp.uint32(900)))
            return occ, tr
        tr = jnp.ones((n, n_chan))
        occ = jnp.zeros(n, bool)
        o_cur = p_from
        rem = jnp.where(can, dist, 0.0)
        med = med0
        active = can
        for k in range(shadow_segments):
            hit_k, _ = isect(ds, st, o_cur, wi,
                             jnp.where(active, rem * 0.999, 0.0))
            seg = jnp.where(hit_k.valid, hit_k.t, rem)
            tr = tr * jnp.where(
                active[..., None],
                tr_lane(mt, any_grid, med, o_cur, wi, seg,
                        rngm.hash_combine(keys, jnp.uint32(900 + k))), 1.0)
            m_hit = _prim_mat(ds, st, hit_k.prim)
            is_null = hit_k.valid & (ds.mat_type[m_hit] == bx.MAT_NONE)
            occ = occ | (active & hit_k.valid & ~is_null)
            # medium switch at the null interface
            p_hit = o_cur + hit_k.t[..., None] * wi
            gn = _raw_gn(ds, st, hit_k.prim, p_hit)
            pr = jnp.clip(jnp.maximum(hit_k.prim, 0), 0,
                          ds.prim_med_in.shape[0] - 1)
            m_in = ds.prim_med_in[pr]
            m_out = ds.prim_med_out[pr]
            trans = m_in != m_out
            entering = jnp.sum(wi * gn, -1) < 0.0
            med = jnp.where(active & is_null & trans,
                            jnp.where(entering, m_in, m_out), med)
            o_cur = jnp.where((active & is_null)[..., None],
                              offset_ray_origin(p_hit, gn, wi), o_cur)
            rem = jnp.where(active & is_null,
                            jnp.maximum(rem - hit_k.t, 0.0), rem)
            active = active & is_null & ~occ
        # crossing budget exhausted: conservatively occluded (surfaced in
        # the module docstring; raise shadow_segments for deep nestings)
        occ = occ | active
        return occ, tr

    def body(it, s: _S):
        o, d = s.o, s.d
        L, beta, alive = s.L, s.beta, s.alive
        cur_med, vert = s.cur_med, s.vert
        is_last = vert >= max_depth  # per-lane final (emission-only) vertex

        hit, _ = isect(ds, st, o, d, jnp.where(alive, tmax_init, 0.0))
        path_len = s.path_len + alive.astype(jnp.int32)
        key_b = rngm.hash_combine(pix_key, it.astype(jnp.uint32)
                                  if hasattr(it, "astype")
                                  else jnp.uint32(it))

        # ---- null interfaces: pass through, no vertex consumed ----
        m_hit = _prim_mat(ds, st, hit.prim)
        is_null = alive & hit.valid & (ds.mat_type[m_hit] == bx.MAT_NONE)

        # ---- medium distance sampling against the lane's medium ----
        u_dist = rngm.uniform_float(key_b, 11)
        t_surf = jnp.where(hit.valid, hit.t, 1e7)
        interacted, t_m, w_med = sample_distance_lane(
            mt, any_grid, cur_med, o, d, t_surf, u_dist, key_b)
        interacted = interacted & alive & ~is_last
        beta = beta * jnp.where(alive[..., None], w_med, 1.0)
        is_null = is_null & ~interacted

        sp = shading_point(ds, st, hit, o, d)
        wo = -d
        # emission happens at EVERY real surface hit (incl. the final
        # emission-only vertex); NEE/scatter exclude the final one
        # (path.cpp:82 semantics — maxDepth NEE/scatter vertices + 1)
        emit_surf = alive & hit.valid & ~interacted & ~is_null
        surf = emit_surf & ~is_last

        # ---- emitted radiance (real surface vertices; volpath.cpp:92) ----
        if st.n_lights > 0:
            le = emitted_radiance(ds, st, hit.prim, sp.light, wo, sp.ns)
            le = jnp.where(emit_surf[..., None], le, 0.0)
            t_safe = jnp.where(hit.valid, hit.t, 1.0)
            lp = pdf_li(ds, st, s.prev_p, d, jnp.maximum(hit.prim, 0), t_safe)
            lp = jnp.where(hit.valid, lp, 0.0)
            lid0 = jnp.clip(sp.light, 0, max(st.n_lights - 1, 0))
            pmf0 = ds.light_pdf[lid0]
            w = jnp.where(s.prev_specular, 1.0,
                          power_heuristic(1.0, s.prev_pdf, 1.0, lp * pmf0))
            L = L + beta * spec(le) * w[..., None]
            miss = alive & ~hit.valid & ~interacted
            miss_le, miss_pdf = miss_radiance_and_pdf(ds, st, d)
            w_inf = jnp.where(s.prev_specular, 1.0,
                              power_heuristic(1.0, s.prev_pdf, 1.0,
                                              miss_pdf * inf_pmf))
            L = L + jnp.where(miss[..., None],
                              beta * spec(miss_le) * w_inf[..., None], 0.0)

        alive = alive & (hit.valid | interacted) & ~(is_last & ~is_null)

        # per-lane sampler dims: indexed by the REAL vertex counter
        vert_c = jnp.minimum(vert, n_dims - 1)
        ub = jnp.take_along_axis(
            u_all, vert_c[None, None, :], axis=0)[0]  # (7, N)
        p_m = o + t_m[..., None] * d
        p_vertex = jnp.where(interacted[..., None], p_m, sp.p)
        g_lane = mt.g[jnp.maximum(cur_med, 0)]

        # ---- material / frames for surface lanes ----
        mp = bx.gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p, face=sp.face,
                                  has_textures=st.has_textures,
                                  has_mix="mix" in st.mat_features,
                                  fourier_meta=st.fourier)
        t_f, b_f, n_f = bx.make_frame(sp.ns)
        wo_l = bx.to_local(t_f, b_f, n_f, wo)

        # ---- NEE (medium + real-surface vertices) ----
        if st.n_lights > 0:
            lid = jnp.clip(jnp.searchsorted(light_cdf, ub[0], side="right"),
                           0, st.n_lights - 1).astype(jnp.int32)
            pmf = ds.light_pdf[lid]
            ls = sample_li(ds, st, lid, p_vertex, ub[1], ub[2])
            wi_l = bx.to_local(t_f, b_f, n_f, ls.wi)
            f_s, pdf_b = bx.eval_pdf(mp, wo_l, wi_l, st.mat_features)
            f_s = spec(f_s * absdot(ls.wi, sp.ns)[..., None])
            ph = hg_phase(jnp.sum(wo * ls.wi, -1), g_lane)
            f_l = jnp.where(interacted[..., None],
                            jnp.repeat(ph[..., None], n_chan, -1), f_s)
            pdf_fwd = jnp.where(interacted, ph, pdf_b)
            can = ((interacted | surf) & (ls.pdf > 0.0)
                   & (jnp.max(f_l, -1) > 0.0))
            o_sh = jnp.where(interacted[..., None], p_m,
                             offset_ray_origin(sp.p, sp.ng, ls.wi))
            occ, tr = shadow_tr(o_sh, ls.wi, ls.dist, can, cur_med,
                                rngm.hash_combine(key_b, 23))
            w_l = jnp.where(ls.is_delta, 1.0,
                            power_heuristic(1.0, ls.pdf * pmf, 1.0, pdf_fwd))
            contrib = beta * f_l * tr * spec(ls.li) * (
                w_l / jnp.maximum(ls.pdf * pmf, 1e-12))[..., None]
            L = L + jnp.where((can & ~occ)[..., None], contrib, 0.0)

        # ---- continuation ----
        bs = bx.sample(mp, wo_l, ub[3], ub[4], ub[5], st.mat_features)
        wi_surf = bx.to_world(t_f, b_f, n_f, bs.wi)
        cos_w = absdot(wi_surf, sp.ns)
        ok_s = bs.pdf > 1e-9
        thru_s = spec(bs.f) * (cos_w / jnp.maximum(bs.pdf, 1e-9))[..., None]

        u_p1 = rngm.uniform_float(key_b, 31)
        u_p2 = rngm.uniform_float(key_b, 37)
        wi_med, ph_pdf = _hg_sample_lane(d, u_p1, u_p2, g_lane)

        wi_w = jnp.where(interacted[..., None], wi_med,
                         jnp.where(is_null[..., None], d, wi_surf))
        beta = beta * jnp.where((surf & ok_s)[..., None], thru_s,
                                jnp.where((surf & ~ok_s)[..., None],
                                          0.0, 1.0))
        alive = alive & (interacted | is_null | ok_s) \
            & (jnp.max(beta, -1) > 0.0)

        # ---- medium transitions (interface crossings) ----
        gn_raw = _raw_gn(ds, st, hit.prim, sp.p)
        pr = jnp.clip(jnp.maximum(hit.prim, 0), 0,
                      ds.prim_med_in.shape[0] - 1)
        m_in = ds.prim_med_in[pr]
        m_out = ds.prim_med_out[pr]
        is_trans = m_in != m_out
        crossed = jnp.sum(wi_w * gn_raw, -1) < 0.0
        switch = alive & hit.valid & ~interacted & is_trans \
            & (is_null | (jnp.sum(wi_w * gn_raw, -1)
                          * jnp.sum(wo * gn_raw, -1) < 0.0))
        cur_med = jnp.where(switch, jnp.where(crossed, m_in, m_out), cur_med)

        prev_specular = jnp.where(
            surf | interacted,
            jnp.where(interacted, False, bs.specular), s.prev_specular)
        prev_pdf = jnp.where(
            surf | interacted,
            jnp.where(interacted, jnp.maximum(ph_pdf, 1e-12),
                      jnp.maximum(bs.pdf, 1e-12)), s.prev_pdf)
        prev_p = jnp.where((surf | interacted)[..., None],
                           p_vertex, s.prev_p)
        o2 = jnp.where(interacted[..., None], p_m,
                       jnp.where(is_null[..., None],
                                 offset_ray_origin(sp.p, gn_raw, d),
                                 offset_ray_origin(sp.p, sp.ng, wi_surf)))
        o_new = jnp.where(alive[..., None], o2, o)
        d_new = jnp.where(alive[..., None], wi_w, d)
        vert = vert + (surf | interacted).astype(jnp.int32)

        # ---- russian roulette (on real vertices) ----
        rr_beta = jnp.max(beta, -1)
        q = jnp.maximum(0.05, 1.0 - rr_beta)
        do_rr = (vert >= _RR_START) & (rr_beta < rr_threshold) & alive \
            & (surf | interacted)
        die = do_rr & (ub[6] < q)
        alive = alive & ~die
        denom = jnp.where(do_rr & ~die, jnp.maximum(1.0 - q, 1e-6), 1.0)
        beta = jnp.where(die[..., None], 0.0, beta / denom[..., None])

        return _S(o_new, d_new, L, beta, alive, prev_specular, prev_pdf,
                  prev_p, path_len, cur_med, vert)

    out = jax.lax.fori_loop(0, max_depth + 1 + extra_depth, body, init)
    aov = jnp.stack([jnp.zeros(n)] * 3 + [out.path_len.astype(jnp.float32)], -1)
    L_out = out.L
    if n_chan != 3:
        from tpupt.core.spectrum import sampled_to_rgb

        L_out = sampled_to_rgb(L_out)
    return L_out, aov
