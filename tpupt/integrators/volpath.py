"""Volumetric path integrator (counterpart of src/integrators/volpath.cpp).

Extends the wavefront path loop with medium events against ONE global
exterior medium (fog/smoke immersion — the dominant volpath configuration):
distance sampling decides medium vs surface vertex, medium vertices scatter
by the HG phase with Tr-attenuated NEE (volpath.cpp:55-180), surface
vertices follow the surface path logic with transmittance-weighted shadow
rays. Medium decisions use hashed counter RNG (the reference consumes
sampler dims; hashing keeps the LDS dimension layout identical to path.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core import rng as rngm
from tpupt.core.sampling import power_heuristic
from tpupt.core.vecmath import absdot, offset_ray_origin
from tpupt.lights.lights import emitted_radiance, pdf_li, sample_li
from tpupt.materials import bsdf as bx
from tpupt.media.media import (MediumParams, hg_phase, hg_sample,
                               sample_distance, transmittance)
from tpupt.integrators.path import (miss_radiance_and_pdf, shading_point,
                                    _RR_START)


def volpath_li(ds, st, sampler, medium: MediumParams, max_depth: int,
               rr_threshold: float, px, py, sample_idx, o, d,
               isect, isect_p):
    """Trace a camera-ray batch through the global medium + surfaces."""
    n = o.shape[0]

    dims = []
    for bounce in range(max_depth):
        base = 5 + bounce * 7
        dims.append(jnp.stack(
            [sampler.dim(px, py, sample_idx, base + k) for k in range(7)]))
    u_all = jnp.stack(dims) if dims else jnp.zeros((1, 7, n))

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

    init = _S(o=o, d=d, L=jnp.zeros((n, 3)), beta=jnp.ones((n, 3)),
              alive=jnp.ones(n, bool), prev_specular=jnp.ones(n, bool),
              prev_pdf=jnp.ones(n), prev_p=o,
              path_len=jnp.zeros(n, jnp.int32))

    def shadow_tr(p_from, wi, dist, can, keys):
        """Occlusion + transmittance along a shadow ray (IntersectTr,
        scene.cpp:57; volpath NEE)."""
        o_sh = p_from
        occ, _ = isect_p(ds, st, o_sh, wi, jnp.where(can, dist * 0.999, 0.0))
        tr = transmittance(medium, o_sh, wi, dist, keys)
        return occ, tr

    def body(bounce, s: _S):
        o, d = s.o, s.d
        L, beta, alive = s.L, s.beta, s.alive
        is_last = bounce >= max_depth

        hit, _ = isect(ds, st, o, d, jnp.where(alive, tmax_init, 0.0))
        path_len = s.path_len + alive.astype(jnp.int32)
        key_b = rngm.hash_combine(pix_key, bounce.astype(jnp.uint32)
                                  if hasattr(bounce, "astype")
                                  else jnp.uint32(bounce))

        # ---- medium distance sampling ----
        u_dist = rngm.uniform_float(key_b, 11)
        t_surf = jnp.where(hit.valid, hit.t, 1e7)
        interacted, t_m, w_med = sample_distance(
            medium, o, d, t_surf, u_dist, key_b)
        interacted = interacted & alive & ~is_last
        beta = beta * jnp.where(alive[..., None], w_med, 1.0)

        sp = shading_point(ds, st, hit, o, d)
        wo = -d
        surf = alive & hit.valid & ~interacted

        # ---- emitted radiance (surface path only) ----
        if st.n_lights > 0:
            le = emitted_radiance(ds, st, hit.prim, sp.light, wo, sp.ns)
            le = jnp.where(surf[..., None], le, 0.0)
            t_safe = jnp.where(hit.valid, hit.t, 1.0)
            lp = pdf_li(ds, st, s.prev_p, d, jnp.maximum(hit.prim, 0), t_safe)
            lp = jnp.where(hit.valid, lp, 0.0)
            lid0 = jnp.clip(sp.light, 0, max(st.n_lights - 1, 0))
            pmf0 = ds.light_pdf[lid0]
            w = jnp.where(s.prev_specular, 1.0,
                          power_heuristic(1.0, s.prev_pdf, 1.0, lp * pmf0))
            L = L + beta * le * w[..., None]
            miss = alive & ~hit.valid & ~interacted
            miss_le, miss_pdf = miss_radiance_and_pdf(ds, st, d)
            w_inf = jnp.where(s.prev_specular, 1.0,
                              power_heuristic(1.0, s.prev_pdf, 1.0,
                                              miss_pdf * inf_pmf))
            L = L + jnp.where(miss[..., None],
                              beta * miss_le * w_inf[..., None], 0.0)

        alive = alive & (hit.valid | interacted) & ~is_last

        ub = u_all[jnp.minimum(bounce, max(max_depth - 1, 0))]
        p_m = o + t_m[..., None] * d
        p_vertex = jnp.where(interacted[..., None], p_m, sp.p)

        # ---- material / frames for surface lanes ----
        mp = bx.gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p,
                                  has_textures=st.has_textures,
                                  has_mix="mix" in st.mat_features,
                                  fourier_meta=st.fourier)
        t_f, b_f, n_f = bx.make_frame(sp.ns)
        wo_l = bx.to_local(t_f, b_f, n_f, wo)

        # ---- NEE (both medium and surface vertices) ----
        if st.n_lights > 0:
            lid = jnp.clip(jnp.searchsorted(light_cdf, ub[0], side="right"),
                           0, st.n_lights - 1).astype(jnp.int32)
            pmf = ds.light_pdf[lid]
            ls = sample_li(ds, st, lid, p_vertex, ub[1], ub[2])
            # surface: BSDF eval; medium: phase value
            wi_l = bx.to_local(t_f, b_f, n_f, ls.wi)
            f_s, pdf_b = bx.eval_pdf(mp, wo_l, wi_l, st.mat_features)
            f_s = f_s * absdot(ls.wi, sp.ns)[..., None]
            ph = hg_phase(jnp.sum(wo * ls.wi, -1), medium.g)
            f_l = jnp.where(interacted[..., None],
                            jnp.repeat(ph[..., None], 3, -1), f_s)
            pdf_fwd = jnp.where(interacted, ph, pdf_b)
            can = alive & (ls.pdf > 0.0) & (jnp.max(f_l, -1) > 0.0)
            o_sh = jnp.where(interacted[..., None], p_m,
                             offset_ray_origin(sp.p, sp.ng, ls.wi))
            occ, tr = shadow_tr(o_sh, ls.wi, ls.dist,
                                can, rngm.hash_combine(key_b, 23))
            # effective light density is ls.pdf * pmf (the BSDF/phase-hit
            # side weighs against lp * pmf0 — see path.py NEE note)
            w_l = jnp.where(ls.is_delta, 1.0,
                            power_heuristic(1.0, ls.pdf * pmf, 1.0, pdf_fwd))
            contrib = beta * f_l * tr * ls.li * (
                w_l / jnp.maximum(ls.pdf * pmf, 1e-12))[..., None]
            L = L + jnp.where((can & ~occ)[..., None], contrib, 0.0)

        # ---- continuation: phase sample (medium) or BSDF sample ----
        bs = bx.sample(mp, wo_l, ub[3], ub[4], ub[5], st.mat_features)
        wi_surf = bx.to_world(t_f, b_f, n_f, bs.wi)
        cos_w = absdot(wi_surf, sp.ns)
        ok_s = bs.pdf > 1e-9
        thru_s = bs.f * (cos_w / jnp.maximum(bs.pdf, 1e-9))[..., None]

        # medium: wi ~ HG around -wo = d; phase/pdf cancel -> beta unchanged
        u_p1 = rngm.uniform_float(key_b, 31)
        u_p2 = rngm.uniform_float(key_b, 37)
        wi_med, ph_pdf = hg_sample(d, u_p1, u_p2, medium.g)

        wi_w = jnp.where(interacted[..., None], wi_med, wi_surf)
        beta = beta * jnp.where((alive & ~interacted & ok_s)[..., None],
                                thru_s,
                                jnp.where((alive & ~interacted)[..., None]
                                          & ~ok_s[..., None], 0.0, 1.0))
        alive = alive & (interacted | ok_s) & (jnp.max(beta, -1) > 0.0)
        prev_specular = jnp.where(alive,
                                  jnp.where(interacted, False, bs.specular),
                                  s.prev_specular)
        prev_pdf = jnp.where(alive,
                             jnp.where(interacted, jnp.maximum(ph_pdf, 1e-12),
                                       jnp.maximum(bs.pdf, 1e-12)),
                             s.prev_pdf)
        prev_p = jnp.where(alive[..., None], p_vertex, s.prev_p)
        o2 = jnp.where(interacted[..., None], p_m,
                       offset_ray_origin(sp.p, sp.ng, wi_surf))
        o_new = jnp.where(alive[..., None], o2, o)
        d_new = jnp.where(alive[..., None], wi_w, d)

        # ---- russian roulette ----
        rr_beta = jnp.max(beta, -1)
        q = jnp.maximum(0.05, 1.0 - rr_beta)
        do_rr = (bounce >= _RR_START) & (rr_beta < rr_threshold) & alive
        die = do_rr & (ub[6] < q)
        alive = alive & ~die
        denom = jnp.where(do_rr & ~die, jnp.maximum(1.0 - q, 1e-6), 1.0)
        beta = jnp.where(die[..., None], 0.0, beta / denom[..., None])

        return _S(o_new, d_new, L, beta, alive, prev_specular, prev_pdf,
                  prev_p, path_len)

    out = jax.lax.fori_loop(0, max_depth + 1, body, init)
    aov = jnp.stack([jnp.zeros(n)] * 3 + [out.path_len.astype(jnp.float32)], -1)
    return out.L, aov