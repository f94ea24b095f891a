"""Direct lighting, Whitted, and ambient-occlusion integrators.

Counterparts of src/integrators/{directlighting,whitted,ao}.cpp, expressed as
wavefront passes on the same traversal/shading machinery as the path
integrator. All share the Renderer driver via `li_fn` injection."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core.sampling import cosine_sample_hemisphere, power_heuristic, \
    uniform_sample_hemisphere
from tpupt.core import rng as rngm
from tpupt.core.vecmath import absdot, offset_ray_origin
from tpupt.lights.lights import emitted_radiance, pdf_li, sample_li
from tpupt.materials import bsdf as bx
from tpupt.integrators.path import (shading_point, _infinite_light_le,
                                    miss_radiance_and_pdf)


def direct_lighting_li(ds, st, sampler, max_depth, strategy,
                       px, py, sample_idx, o, d, isect, isect_p,
                       bounce: int = 0):
    """DirectLightingIntegrator::Li (directlighting.cpp:50): emitted +
    one-sample NEE at the first hit + recursion through specular surfaces
    (depth-limited, implemented as unrolled specular chase)."""
    n = o.shape[0]
    # spectral transport: same uplift-at-entry scheme as path_li
    n_chan = getattr(st, "n_channels", 3)
    if n_chan == 3:
        def spec_u(x):
            return x
    else:
        from tpupt.core.spectrum import rgb_to_spectrum as spec_u
    L = jnp.zeros((n, n_chan))
    beta = jnp.ones((n, n_chan))
    alive = jnp.ones(n, bool)

    for depth in range(max_depth):
        base = 5 + depth * 7
        hit, _ = isect(ds, st, o, d, jnp.full(n, jnp.inf))
        sp = shading_point(ds, st, hit, o, d)
        wo = -d

        if st.n_lights > 0:
            le = emitted_radiance(ds, st, hit.prim, sp.light, wo, sp.ns)
            L = L + jnp.where((alive & hit.valid)[..., None],
                              beta * spec_u(le), 0.0)
            inf_le = jnp.broadcast_to(_infinite_light_le(ds, st), (n, 3))
            L = L + jnp.where((alive & ~hit.valid)[..., None],
                              beta * spec_u(inf_le), 0.0)
        alive = alive & hit.valid

        mp = bx.gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p, face=sp.face,
                                  has_textures=st.has_textures,
                                  has_mix="mix" in st.mat_features,
                                  fourier_meta=st.fourier)
        t_f, b_f, n_f = bx.make_frame(sp.ns)
        wo_l = bx.to_local(t_f, b_f, n_f, wo)

        if st.n_lights > 0:
            # strategy "all": loop all lights; "one": single sampled light
            light_ids = (range(st.n_lights) if strategy == "all"
                         else [None])
            for li_idx in light_ids:
                if li_idx is None:
                    u_l = sampler.dim(px, py, sample_idx, base + 0)
                    lid = jnp.clip((u_l * st.n_lights).astype(jnp.int32),
                                   0, st.n_lights - 1)
                    pmf = 1.0 / st.n_lights
                else:
                    lid = jnp.full(n, li_idx, jnp.int32)
                    pmf = 1.0
                u1 = sampler.dim(px, py, sample_idx, base + 1 + 2 * (li_idx or 0))
                u2 = sampler.dim(px, py, sample_idx, base + 2 + 2 * (li_idx or 0))
                ls = sample_li(ds, st, lid, sp.p, u1, u2)
                wi_l = bx.to_local(t_f, b_f, n_f, ls.wi)
                f_l, pdf_b = bx.eval_pdf(mp, wo_l, wi_l, st.mat_features)
                f_l = f_l * absdot(ls.wi, sp.ns)[..., None]
                can = alive & (ls.pdf > 0.0) & (jnp.max(f_l, -1) > 0.0)
                o_sh = offset_ray_origin(sp.p, sp.ng, ls.wi)
                occ, _ = isect_p(ds, st, o_sh, ls.wi,
                                 jnp.where(can, ls.dist * 0.999, 0.0))
                w_l = jnp.where(ls.is_delta, 1.0,
                                power_heuristic(1.0, ls.pdf, 1.0, pdf_b))
                contrib = beta * spec_u(f_l) * spec_u(ls.li) * (
                    w_l / jnp.maximum(ls.pdf * pmf, 1e-12))[..., None]
                L = L + jnp.where((can & ~occ)[..., None], contrib, 0.0)

                # BSDF-sampled half of EstimateDirect toward the SAME light
                # (integrator.cpp:163-215) — without it, the MIS weight
                # above loses the area-light energy the other strategy
                # would carry
                key = rngm.uniform_u32(
                    px.astype(jnp.uint32), py.astype(jnp.uint32),
                    jnp.asarray(sample_idx).astype(jnp.uint32))
                key = rngm.hash_combine(key, jnp.uint32(
                    900 + depth * 16 + (li_idx or 0)))
                bs_d = bx.sample(mp, wo_l,
                                 rngm.uniform_float(key, 0),
                                 rngm.uniform_float(key, 1),
                                 rngm.uniform_float(key, 2),
                                 st.mat_features)
                wi_bw = bx.to_world(t_f, b_f, n_f, bs_d.wi)
                can_b = alive & ~ls.is_delta & ~bs_d.specular \
                    & (bs_d.pdf > 1e-9) & (jnp.max(bs_d.f, -1) > 0.0)
                o_b = offset_ray_origin(sp.p, sp.ng, wi_bw)
                hit2, _ = isect(ds, st, o_b, wi_bw,
                                jnp.where(can_b, jnp.inf, 0.0))
                sp2 = shading_point(ds, st, hit2, o_b, wi_bw)
                # hit the chosen light's geometry?
                hit_light = hit2.valid & (sp2.light == lid)
                le2 = emitted_radiance(ds, st, hit2.prim, sp2.light,
                                       -wi_bw, sp2.ns)
                t_safe = jnp.where(hit2.valid, hit2.t, 1.0)
                lp2 = pdf_li(ds, st, sp.p, wi_bw,
                             jnp.maximum(hit2.prim, 0), t_safe)
                # escaped ray toward the env light
                miss_le, miss_pdf = miss_radiance_and_pdf(ds, st, wi_bw)
                is_env = (st.env_light_id >= 0) & (lid == st.env_light_id)
                le_b = jnp.where((hit_light)[..., None], le2,
                                 jnp.where((~hit2.valid & is_env)[..., None],
                                           miss_le, 0.0))
                lp_b = jnp.where(hit_light, lp2,
                                 jnp.where(~hit2.valid & is_env,
                                           miss_pdf, 0.0))
                w_b = power_heuristic(1.0, bs_d.pdf, 1.0, lp_b)
                contrib_b = beta * spec_u(bs_d.f) * spec_u(le_b) * (
                    absdot(wi_bw, sp.ns) * w_b
                    / jnp.maximum(bs_d.pdf * pmf, 1e-12))[..., None]
                L = L + jnp.where(can_b[..., None], contrib_b, 0.0)

        # specular continuation only (whitted-style)
        u_lobe = sampler.dim(px, py, sample_idx, base + 5)
        ub1 = sampler.dim(px, py, sample_idx, base + 6)
        bs = bx.sample(mp, wo_l, u_lobe, ub1, ub1, st.mat_features)
        spec = bs.specular & alive
        wi_w = bx.to_world(t_f, b_f, n_f, bs.wi)
        thru = spec_u(bs.f) * (absdot(wi_w, sp.ns)
                               / jnp.maximum(bs.pdf, 1e-9))[..., None]
        beta = jnp.where(spec[..., None], beta * thru, beta)
        alive = spec & (bs.pdf > 1e-9)
        o = offset_ray_origin(sp.p, sp.ng, wi_w)
        d = wi_w
        if depth == max_depth - 1:
            break

    if n_chan != 3:
        from tpupt.core.spectrum import sampled_to_rgb

        L = sampled_to_rgb(L)
    aov = jnp.zeros((n, 4))
    return L, aov


def whitted_li(ds, st, sampler, max_depth, px, py, sample_idx, o, d,
               isect, isect_p):
    """WhittedIntegrator::Li (whitted.cpp:49): delta-light direct lighting +
    perfect specular reflection/transmission recursion."""
    return direct_lighting_li(ds, st, sampler, max_depth, "all",
                              px, py, sample_idx, o, d, isect, isect_p)


def ao_li(ds, st, sampler, n_samples, cos_sample, px, py, sample_idx, o, d,
          isect, isect_p, max_dist=None):
    """AOIntegrator::Li (ao.cpp:52): cosine- or uniform-sampled hemisphere
    occlusion at the first hit."""
    n = o.shape[0]
    hit, _ = isect(ds, st, o, d, jnp.full(n, jnp.inf))
    sp = shading_point(ds, st, hit, o, d)
    t_f, b_f, n_f = bx.make_frame(sp.ns)
    wo_l = bx.to_local(t_f, b_f, n_f, -d)
    # flip the frame to the outgoing side (ao.cpp: n = Faceforward(n, -ray.d))
    flip = wo_l[..., 2] < 0.0

    L = jnp.zeros(n)
    md = jnp.inf if max_dist is None else max_dist
    for k in range(n_samples):
        u1 = sampler.dim(px, py, sample_idx, 5 + 2 * k)
        u2 = sampler.dim(px, py, sample_idx, 6 + 2 * k)
        if cos_sample:
            wi_l = cosine_sample_hemisphere(u1, u2)
            pdf = wi_l[..., 2] / np.pi
        else:
            wi_l = uniform_sample_hemisphere(u1, u2)
            pdf = jnp.full(n, 1.0 / (2.0 * np.pi))
        wi_l = wi_l * jnp.stack([jnp.ones(n), jnp.ones(n),
                                 jnp.where(flip, -1.0, 1.0)], -1)
        wi_w = bx.to_world(t_f, b_f, n_f, wi_l)
        o_sh = offset_ray_origin(sp.p, sp.ng, wi_w)
        occ, _ = isect_p(ds, st, o_sh, wi_w,
                         jnp.where(hit.valid, jnp.full(n, md), 0.0))
        vis = hit.valid & ~occ & (pdf > 0)
        L = L + jnp.where(vis,
                          jnp.abs(wi_l[..., 2]) / jnp.maximum(pdf * n_samples, 1e-9),
                          0.0)
    return jnp.repeat(L[..., None], 3, -1), jnp.zeros((n, 4))
