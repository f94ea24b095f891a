"""Wavefront bidirectional path tracer (counterpart of integrators/bdpt.cpp).

The reference builds per-ray camera/light subpaths with pointer-linked
`Vertex` records (bdpt.h:280-520), connects every (s,t) strategy pair
(ConnectBDPT, bdpt.cpp:445) and weights each with the recursive MIS
ri-product (MISWeight, bdpt.cpp:230). The TPU inversion: each subpath is a
STATIC list of SoA vertex batches (one dict of (N,...) tensors per vertex
index — path length is a compile-time bound, liveness is a mask), the
(s,t) double loop is unrolled at trace time, and every connection's
visibility ray is one batched any-hit query. t == 1 strategies (light path
hits the camera lens) become film splats, exactly like the reference's
`film->AddSplat` (bdpt.cpp:410).

Light subpaths start from every light family including the environment
(infinite.cpp Sample_Le: env-importance direction + disk origin, with the
subpath density corrections of bdpt.cpp:124-136); escaped camera rays
become infinite-light endpoint vertices (bdpt.cpp:170-176) so env-lit
scenes get their s == 0 radiance with correct MIS weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpupt.core.sampling import (concentric_sample_disk,
                                 cosine_sample_hemisphere,
                                 uniform_sample_cone, uniform_sample_sphere,
                                 uniform_sample_triangle)
from tpupt.core.vecmath import (coordinate_system, cross, dot, length,
                                normalize, offset_ray_origin)
from tpupt.integrators.path import miss_radiance_and_pdf, shading_point
from tpupt.lights.lights import (_gather_tri_light_geo, _sphere_center_radius,
                                 _world_radius, emitted_radiance, sample_li)
from tpupt.materials import bsdf as bx
from tpupt.scene.flatten import (LIGHT_AREA, LIGHT_DISTANT, LIGHT_GONIO,
                                 LIGHT_INFINITE, LIGHT_POINT,
                                 LIGHT_PROJECTION, LIGHT_SPOT)

INV_4PI = 1.0 / (4.0 * jnp.pi)

# vertex types (bdpt.h VertexType)
VT_CAMERA, VT_LIGHT, VT_SURFACE = 0, 1, 2


def _remap0(x):
    """MISWeight's remap0: 0 densities become 1 so deltas cancel
    (bdpt.cpp:223)."""
    return jnp.where(x != 0.0, x, 1.0)


def convert_density(pdf_dir, p_from, p_to, ns_to, to_is_surface,
                    to_is_infinite=None):
    """Solid-angle -> area density (Vertex::ConvertDensity, bdpt.h:321).
    Densities toward infinite-light vertices stay in solid angle
    (bdpt.h:328-329)."""
    w = p_to - p_from
    d2 = jnp.maximum(dot(w, w), 1e-12)
    inv_d2 = 1.0 / d2
    cos_t = jnp.abs(dot(ns_to, w * jnp.sqrt(inv_d2)[..., None]))
    out = pdf_dir * jnp.where(to_is_surface, cos_t, 1.0) * inv_d2
    if to_is_infinite is not None:
        out = jnp.where(to_is_infinite, pdf_dir, out)
    return out


def infinite_light_density(ds, st, d):
    """Combined solid-angle density x choice pmf of sampling direction d
    from the scene's infinite lights (InfiniteLightDensity, bdpt.h:113)."""
    n = d.shape[0]
    dens = jnp.zeros(n)
    if st.n_lights == 0:
        return dens
    is_inf = ds.light_type == LIGHT_INFINITE
    const_pmf = jnp.sum(jnp.where(is_inf, ds.light_pdf, 0.0))
    if st.env_light_id >= 0:
        from tpupt.lights.lights import env_pdf

        env_pmf = ds.light_pdf[st.env_light_id]
        dens = dens + env_pdf(ds, st, d) * env_pmf
        const_pmf = const_pmf - env_pmf
    dens = dens + INV_4PI * jnp.maximum(const_pmf, 0.0)
    return dens


def _g_term(ds, st, isect_p, va, vb):
    """Geometry term with visibility (bdpt.cpp G, :227-243)."""
    w = vb["p"] - va["p"]
    d2 = jnp.maximum(dot(w, w), 1e-12)
    dist = jnp.sqrt(d2)
    wn = w / dist[..., None]
    g = (jnp.abs(dot(va["ns"], wn)) * jnp.abs(dot(vb["ns"], wn)) / d2)
    o_sh = offset_ray_origin(va["p"], va["ns"], wn)
    occluded, _ = isect_p(ds, st, o_sh, wn, dist * 0.997)
    return jnp.where(occluded, 0.0, g), wn, dist


def _vertex_f(ds, st, v, wi_world, features, transport_light):
    """BSDF value at a surface vertex toward wi (Vertex::f, bdpt.h:340),
    including the shading-normal transport correction for light-subpath
    vertices (CorrectShadingNormal, bdpt.cpp:53)."""
    mp = bx.gather_mat_params(ds, v["mat"], uv=v["uv"], p=v["p"],
                              has_textures=st.has_textures,
                              has_mix="mix" in st.mat_features)
    t_f, b_f, n_f = bx.make_frame(v["ns"])
    wo_l = bx.to_local(t_f, b_f, n_f, v["wo"])
    wi_l = bx.to_local(t_f, b_f, n_f, wi_world)
    f, pdf = bx.eval_pdf(mp, wo_l, wi_l, features)
    if transport_light:
        # importance transport correction uses ns==ng here (flat shading in
        # the SoA pipeline keeps them close); factor == 1 then
        pass
    return f, pdf


def _vertex_pdf(ds, st, v, prev_p, next_v, features):
    """Area density of sampling next from v given direction from prev
    (Vertex::Pdf, bdpt.h:430)."""
    wo = normalize(prev_p - v["p"])
    wi = normalize(next_v["p"] - v["p"])
    mp = bx.gather_mat_params(ds, v["mat"], uv=v["uv"], p=v["p"],
                              has_textures=st.has_textures,
                              has_mix="mix" in st.mat_features)
    t_f, b_f, n_f = bx.make_frame(v["ns"])
    _, pdf = bx.eval_pdf(mp, bx.to_local(t_f, b_f, n_f, wo),
                         bx.to_local(t_f, b_f, n_f, wi), features)
    return convert_density(pdf, v["p"], next_v["p"], next_v["ns"],
                           next_v["on_surface"], next_v.get("infinite"))


# --------------------------- light Sample_Le --------------------------------


def sample_le(ds, st, light_id, u0, u1, u2, u3):
    """Emission sampling (Light::Sample_Le family): returns position, normal
    at the light, direction, Le, pdf_pos, pdf_dir, is_delta_origin."""
    lt = ds.light_type[light_id]
    lL = ds.light_L[light_id]
    lpos = ds.light_pos[light_id]
    ldir = ds.light_dir[light_id]
    lprim = ds.light_prim[light_id]
    n = light_id.shape[0]
    wr = _world_radius(ds)

    # point: uniform sphere (point.cpp Sample_Le)
    d_pt = uniform_sample_sphere(u2, u3)
    # spot: uniform cone around the axis (spot.cpp Sample_Le)
    ct = ds.light_cos_total[light_id]
    local = uniform_sample_cone(u2, u3, ct)
    t_ax, b_ax = coordinate_system(ldir)
    d_spot = bx.to_world(t_ax, b_ax, ldir, local)
    pdf_dir_spot = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - ct), 1e-9)
    cf = ds.light_cos_falloff[light_id]
    cos_axis = dot(d_spot, ldir)
    delta_f = jnp.clip((cos_axis - ct) / jnp.maximum(cf - ct, 1e-6), 0.0, 1.0)
    fall = jnp.where(cos_axis < ct, 0.0,
                     jnp.where(cos_axis > cf, 1.0, delta_f ** 4))

    # area (triangle prim): uniform area + cosine hemisphere (diffuse.cpp
    # Sample_Le; twosided lights flip the hemisphere on half the samples,
    # diffuse.cpp:106-118)
    two = ds.light_twosided[light_id]
    tid = jnp.clip(lprim, 0, max(st.n_tris - 1, 0))
    p0, p1, p2, tn, area = _gather_tri_light_geo(ds, tid)
    b0, b1 = uniform_sample_triangle(u0, u1)
    p_area = (p0 * b0[..., None] + p1 * b1[..., None]
              + p2 * (1.0 - b0 - b1)[..., None])
    flip = two & (u2 < 0.5)
    u2a = jnp.where(two, jnp.minimum(2.0 * jnp.where(u2 < 0.5, u2, u2 - 0.5),
                                     0.999999), u2)
    w_local = cosine_sample_hemisphere(u2a, u3)
    t_a, b_a = coordinate_system(tn)
    tn_eff = jnp.where(flip[..., None], -tn, tn)
    d_area = bx.to_world(t_a, b_a, tn_eff, w_local)
    pdf_pos_area = 1.0 / jnp.maximum(area, 1e-12)
    pdf_dir_area = (jnp.abs(w_local[..., 2]) / jnp.pi
                    * jnp.where(two, 0.5, 1.0))
    # sphere-prim area lights: sample the sphere surface
    sid = jnp.clip(lprim - st.n_tris, 0, max(st.n_spheres - 1, 0))
    sc, sr = _sphere_center_radius(ds, sid)
    n_sph = uniform_sample_sphere(u0, u1)
    p_sph = sc + sr[..., None] * n_sph
    d_sph_l = cosine_sample_hemisphere(u2, u3)
    t_s, b_s = coordinate_system(n_sph)
    d_sph = bx.to_world(t_s, b_s, n_sph, d_sph_l)
    pdf_pos_sph = 1.0 / jnp.maximum(4.0 * jnp.pi * sr * sr, 1e-12)
    is_tri = lprim < st.n_tris
    p_ar = jnp.where(is_tri[..., None], p_area, p_sph)
    n_ar = jnp.where(is_tri[..., None], tn, n_sph)
    d_ar = jnp.where(is_tri[..., None], d_area, d_sph)
    pdf_pos_ar = jnp.where(is_tri, pdf_pos_area, pdf_pos_sph)
    pdf_dir_ar = jnp.where(is_tri, pdf_dir_area,
                           jnp.abs(d_sph_l[..., 2]) / jnp.pi)

    # distant: disk behind the scene (distant.cpp Sample_Le)
    dx, dy = concentric_sample_disk(u0, u1)
    t_d, b_d = coordinate_system(ldir)  # ldir points TOWARD the light
    p_disk = (ds.world_lo + ds.world_hi) * 0.5 + wr * (
        ldir + dx[..., None] * t_d + dy[..., None] * b_d)
    d_dist = -ldir
    pdf_pos_dist = 1.0 / (jnp.pi * wr * wr)

    # infinite (env): importance-sampled direction from the map + disk
    # origin behind the scene (infinite.cpp Sample_Le); constant infinite
    # lights use a uniform sphere direction
    if st.env_w > 0:
        from tpupt.lights.lights import sample_env

        wi_env, le_env, pdf_env = sample_env(ds, st, u2, u3)
    else:
        wi_env = d_pt
        le_env = jnp.zeros((n, 3))
        pdf_env = jnp.zeros(n)
    is_env_l = (light_id == st.env_light_id) if st.env_light_id >= 0 \
        else jnp.zeros(n, bool)
    wi_inf = jnp.where(is_env_l[..., None], wi_env, d_pt)
    d_inf = -wi_inf
    le_inf = jnp.where(is_env_l[..., None], le_env, lL)
    pdf_dir_inf = jnp.where(is_env_l, pdf_env, INV_4PI)
    t_e, b_e = coordinate_system(wi_inf)
    p_inf = (ds.world_lo + ds.world_hi) * 0.5 + wr * (
        wi_inf + dx[..., None] * t_e + dy[..., None] * b_e)

    p = jnp.where((lt == LIGHT_AREA)[..., None], p_ar,
                  jnp.where((lt == LIGHT_DISTANT)[..., None], p_disk,
                            jnp.where((lt == LIGHT_INFINITE)[..., None],
                                      p_inf, lpos)))
    nl = jnp.where((lt == LIGHT_AREA)[..., None], n_ar,
                   jnp.where((lt == LIGHT_DISTANT)[..., None], -ldir,
                             jnp.where((lt == LIGHT_INFINITE)[..., None],
                                       d_inf, d_pt)))
    d = d_pt
    pdf_pos = jnp.ones(n)
    pdf_dir = jnp.full(n, INV_4PI)
    le = lL
    for tid_, d_, pp_, pd_, le_ in (
        (LIGHT_SPOT, d_spot, jnp.ones(n), pdf_dir_spot,
         lL * fall[..., None]),
        (LIGHT_GONIO, d_pt, jnp.ones(n), jnp.full(n, INV_4PI), lL),
        (LIGHT_PROJECTION, d_spot, jnp.ones(n), pdf_dir_spot, lL),
        (LIGHT_AREA, d_ar, pdf_pos_ar, pdf_dir_ar, lL),
        (LIGHT_DISTANT, d_dist, pdf_pos_dist, jnp.ones(n), lL),
        (LIGHT_INFINITE, d_inf, pdf_pos_dist, pdf_dir_inf, le_inf),
    ):
        sel = lt == tid_
        d = jnp.where(sel[..., None], d_, d)
        pdf_pos = jnp.where(sel, pp_, pdf_pos)
        pdf_dir = jnp.where(sel, pd_, pdf_dir)
        le = jnp.where(sel[..., None], le_, le)
    delta_origin = (lt == LIGHT_POINT) | (lt == LIGHT_SPOT) \
        | (lt == LIGHT_GONIO) | (lt == LIGHT_PROJECTION)
    delta_dir = lt == LIGHT_DISTANT
    return p, nl, d, le, pdf_pos, pdf_dir, delta_origin, delta_dir


def pdf_light_dir(ds, st, light_id, v_light, w):
    """Direction density of emitting w from light vertex (Light::Pdf_Le dir
    part) — solid angle."""
    lt = ds.light_type[light_id]
    n = light_id.shape[0]
    cos_l = dot(v_light["ns"], w)
    two = ds.light_twosided[light_id]
    pdf_area_dir = jnp.where(two, 0.5 * jnp.abs(cos_l),
                             jnp.maximum(cos_l, 0.0)) / jnp.pi
    ct = ds.light_cos_total[light_id]
    pdf_spot = jnp.where(
        dot(w, ds.light_dir[light_id]) >= ct,
        1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - ct), 1e-9), 0.0)
    pdf = jnp.full(n, INV_4PI)
    for tid_, p_ in ((LIGHT_AREA, pdf_area_dir), (LIGHT_SPOT, pdf_spot),
                     (LIGHT_PROJECTION, pdf_spot),
                     (LIGHT_DISTANT, jnp.zeros(n)),
                     (LIGHT_INFINITE, jnp.zeros(n))):
        pdf = jnp.where(lt == tid_, p_, pdf)
    return pdf


def pdf_light_origin(ds, st, light_id, light_pmf):
    """Positional density of the light origin * choice pmf
    (Vertex::PdfLightOrigin, bdpt.h:500)."""
    lt = ds.light_type[light_id]
    lprim = ds.light_prim[light_id]
    wr = _world_radius(ds)
    tid = jnp.clip(lprim, 0, max(st.n_tris - 1, 0))
    _, _, _, _, area = _gather_tri_light_geo(ds, tid)
    sid = jnp.clip(lprim - st.n_tris, 0, max(st.n_spheres - 1, 0))
    _, sr = _sphere_center_radius(ds, sid)
    pdf_pos_ar = jnp.where(lprim < st.n_tris,
                           1.0 / jnp.maximum(area, 1e-12),
                           1.0 / jnp.maximum(4.0 * jnp.pi * sr * sr, 1e-12))
    pdf = jnp.ones_like(pdf_pos_ar)
    pdf = jnp.where(lt == LIGHT_AREA, pdf_pos_ar, pdf)
    pdf = jnp.where(lt == LIGHT_DISTANT, 1.0 / (jnp.pi * wr * wr), pdf)
    pdf = jnp.where(lt == LIGHT_INFINITE, 0.0, pdf)
    return pdf * light_pmf


# ----------------------------- subpath walks --------------------------------


def _make_vertex(n, c=3):
    z3 = jnp.zeros((n, 3))
    z = jnp.zeros(n)
    return dict(p=z3, ns=z3, beta=jnp.zeros((n, c)), wo=z3,
                uv=jnp.zeros((n, 2)),
                pdf_fwd=z, pdf_rev=z, delta=jnp.zeros(n, bool),
                type=jnp.zeros(n, jnp.int32), mat=jnp.zeros(n, jnp.int32),
                light=jnp.full(n, -1, jnp.int32),
                valid=jnp.zeros(n, bool),
                on_surface=jnp.zeros(n, bool),
                infinite=jnp.zeros(n, bool),
                escaped=jnp.zeros(n, bool))


def random_walk(ds, st, isect, features, o, d, beta, pdf_dir, n_steps,
                u_dims, alive0, transport_light, prev0=None):
    """Shared camera/light random walk (bdpt.cpp RandomWalk, :69-130).
    Returns the list of surface vertex batches. `prev0` (the subpath's
    start vertex) receives its pdf_rev from the first bounce, matching the
    reference's prev-pointer update."""
    n = o.shape[0]
    n_chan = getattr(st, "n_channels", 3)
    if n_chan == 3:
        def spec(x):
            return x
    else:
        from tpupt.core.spectrum import rgb_to_spectrum as spec
    verts = []
    alive = alive0
    prev_p, prev_ns = o, d  # prev_ns unused for the first conversion target
    pdf_w = pdf_dir
    wr = _world_radius(ds)
    # escaped vertices carry zero radiance when the scene has no infinite
    # lights, so gating on n_lights keeps this jit-static
    has_inf = st.n_lights > 0
    for i in range(n_steps):
        hit, _ = isect(ds, st, o, d, jnp.where(alive, jnp.inf, 0.0))
        sp = shading_point(ds, st, hit, o, d)
        valid = alive & hit.valid
        v = _make_vertex(n, n_chan)
        v["p"] = sp.p
        v["ns"] = sp.ns
        v["uv"] = sp.uv
        v["mat"] = sp.mat
        v["light"] = sp.light
        v["wo"] = -d
        v["beta"] = beta
        v["type"] = jnp.full(n, VT_SURFACE, jnp.int32)
        v["valid"] = valid
        v["pdf_fwd"] = convert_density(pdf_w, o, sp.p, sp.ns,
                                       jnp.ones(n, bool))
        if not transport_light and has_inf:
            # escaped camera rays become infinite-light endpoint vertices
            # (bdpt.cpp:170-176): keep the solid-angle density unconverted
            # (ConvertDensity skips infinite lights, bdpt.h:329)
            esc = alive & ~hit.valid
            v["escaped"] = esc
            v["infinite"] = esc
            v["type"] = jnp.where(esc, VT_LIGHT, v["type"])
            v["p"] = jnp.where(esc[..., None], o + d * (2.0 * wr), v["p"])
            v["ns"] = jnp.where(esc[..., None], -d, v["ns"])
            v["pdf_fwd"] = jnp.where(esc, pdf_w, v["pdf_fwd"])

        # sample continuation
        mp = bx.gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p,
                                  has_textures=st.has_textures,
                                  has_mix="mix" in st.mat_features)
        t_f, b_f, n_f = bx.make_frame(sp.ns)
        wo_l = bx.to_local(t_f, b_f, n_f, -d)
        u = u_dims[i]
        bs = bx.sample(mp, wo_l, u[0], u[1], u[2], features)
        wi_w = bx.to_world(t_f, b_f, n_f, bs.wi)
        cos_w = jnp.abs(dot(wi_w, sp.ns))
        ok = valid & (bs.pdf > 1e-9) & (jnp.max(bs.f, -1) > 0.0)
        v["delta"] = bs.specular & valid

        # reverse pdf of the PREVIOUS vertex (bdpt.cpp:118): density of
        # sampling wo from wi at this vertex, converted at prev
        _, pdf_rev_dir = bx.eval_pdf(
            mp, bx.to_local(t_f, b_f, n_f, wi_w), wo_l, features)
        prev = verts[i - 1] if i > 0 else prev0
        if prev is not None:
            prev["pdf_rev"] = jnp.where(
                valid,
                convert_density(pdf_rev_dir, sp.p, prev["p"], prev["ns"],
                                prev.get("on_surface", jnp.ones(n, bool)),
                                prev.get("infinite")),
                prev["pdf_rev"])
        v["on_surface"] = valid
        verts.append(v)

        thru = spec(bs.f) * (cos_w / jnp.maximum(bs.pdf, 1e-9))[..., None]
        beta = jnp.where(ok[..., None], beta * thru, 0.0)
        pdf_w = jnp.where(bs.specular, 0.0, bs.pdf)
        o = offset_ray_origin(sp.p, sp.ng, wi_w)
        d = wi_w
        alive = ok
    return verts


# ------------------------------- cameras ------------------------------------


def camera_film_area(ds, xres, yres):
    """Film area on the z=1 plane in camera space (perspective.cpp:49-61)."""
    r2c = ds.raster_to_camera
    pmin = r2c @ jnp.array([0.0, 0.0, 0.0, 1.0])
    pmax = r2c @ jnp.array([float(xres), float(yres), 0.0, 1.0])
    pmin = pmin[:3] / jnp.maximum(jnp.abs(pmin[2]), 1e-9)
    pmax = pmax[:3] / jnp.maximum(jnp.abs(pmax[2]), 1e-9)
    return jnp.abs((pmax[0] - pmin[0]) * (pmax[1] - pmin[1]))


def camera_pdf_we(ds, st, cam_pos, cam_fwd, film_area, w):
    """Directional importance density + We of the pinhole perspective camera
    (perspective.cpp Pdf_We / We)."""
    cos_t = dot(w, cam_fwd)
    ok = cos_t > 1e-4
    c2 = jnp.maximum(cos_t * cos_t, 1e-9)
    pdf_dir = jnp.where(ok, 1.0 / (film_area * c2 * cos_t), 0.0)
    we = jnp.where(ok, 1.0 / (film_area * c2 * c2), 0.0)
    return pdf_dir, we


def camera_raster_from_dir(ds, w, xres, yres):
    """Project a world direction through the camera to raster coordinates
    (camera->WorldToRaster, used by t==1 splats)."""
    c2w = ds.cam_to_world
    w_cam = c2w[:3, :3].T @ w[..., None]
    w_cam = w_cam[..., 0]
    z = jnp.maximum(w_cam[..., 2], 1e-6)
    p_cam1 = w_cam / z[..., None]
    r2c = ds.raster_to_camera
    # invert the raster->camera affine on the z=1 plane
    a = r2c[0, 0]
    bxx = r2c[0, 3]
    cyy = r2c[1, 1]
    dyy = r2c[1, 3]
    px = (p_cam1[..., 0] - bxx) / a
    py = (p_cam1[..., 1] - dyy) / cyy
    inside = (px >= 0) & (px < xres) & (py >= 0) & (py < yres) \
        & (w_cam[..., 2] > 1e-6)
    return jnp.stack([px, py], -1), inside


# ------------------------------ MIS weight ----------------------------------


def mis_weight(ds, st, features, cam_verts, light_verts, s, t, overrides,
               light0_delta, light0_pdf_fwd):
    """Balance-heuristic weight over all strategies generating this path
    (MISWeight, bdpt.cpp:230-300): product of remapped pdf ratios walked
    from each connection endpoint. `overrides` maps ("pt"|"ptm"|"qs"|"qsm")
    to the hypothetical reverse densities at the four endpoint slots."""
    n = cam_verts[0]["p"].shape[0]
    sum_ri = jnp.zeros(n)

    def cam_rev(i):
        if i == t - 1 and "pt" in overrides:
            return overrides["pt"]
        if i == t - 2 and "ptm" in overrides:
            return overrides["ptm"]
        return cam_verts[i]["pdf_rev"]

    def cam_delta(i):
        if i == t - 1:
            return jnp.zeros(n, bool)  # connection endpoints are non-delta
        return cam_verts[i]["delta"]

    ri = jnp.ones(n)
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(cam_rev(i)) / _remap0(cam_verts[i]["pdf_fwd"])
        use = ~cam_delta(i) & ~cam_delta(i - 1)
        sum_ri = sum_ri + jnp.where(use, ri, 0.0)

    def lt_rev(i):
        if i == s - 1 and "qs" in overrides:
            return overrides["qs"]
        if i == s - 2 and "qsm" in overrides:
            return overrides["qsm"]
        return light_verts[i]["pdf_rev"]

    def lt_fwd(i):
        if i == 0 and light0_pdf_fwd is not None:
            return light0_pdf_fwd
        return light_verts[i]["pdf_fwd"]

    def lt_delta(i):
        if i == s - 1:
            return jnp.zeros(n, bool)
        return light_verts[i]["delta"]

    ri = jnp.ones(n)
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(lt_rev(i)) / _remap0(lt_fwd(i))
        prev_delta = lt_delta(i - 1) if i > 0 else light0_delta
        use = ~lt_delta(i) & ~prev_delta
        sum_ri = sum_ri + jnp.where(use, ri, 0.0)

    return 1.0 / (1.0 + sum_ri)


# ------------------------------- driver -------------------------------------


def bdpt_li(ds, st, sampler, max_depth, px, py, sample_idx, o, d,
            isect, isect_p, xres, yres, valid=None, strategy=None,
            p_raster_cam=None):
    """One full-frame BDPT wavefront: returns (L, aov_dummy, splat_pfilm,
    splat_L) — L goes through the filter-weighted film path (t >= 2
    strategies), splats are the t == 1 light-path contributions. `valid`
    masks padded wavefront lanes: a padded lane must NOT emit a light
    subpath (the splat count normalization is one light path per real
    pixel sample, bdpt.cpp:365).

    `strategy=(s_sel, t_sel)` switches to multiplexed single-strategy mode
    (the MLT path kernel, mlt.cpp:151-163): each lane evaluates ONLY its
    selected (s, t) strategy, scaled by nStrategies = s_sel + t_sel (the
    uniform strategy-choice pmf), and the return becomes (L, p_raster) —
    p_raster is the lane's camera raster (`p_raster_cam`) for t >= 2
    strategies or the lens-projected raster for t == 1 splat strategies.
    Unselected / uncovered strategies contribute exactly 0, matching the
    reference's zero-valued ConnectBDPT cases."""
    features = st.mat_features
    n = o.shape[0]
    # spectral transport (SampledSpectrum, spectrum.h:289): colors are
    # uplifted where they enter a throughput/contribution product, L and
    # every vertex beta are C-channel, and outputs convert back to RGB
    n_chan = getattr(st, "n_channels", 3)
    if n_chan == 3:
        def spec(x):
            return x
    else:
        from tpupt.core.spectrum import rgb_to_spectrum as spec
    if valid is None:
        valid = jnp.ones(n, bool)
    t_max = max_depth + 2
    s_max = max_depth + 1
    if strategy is not None:
        s_sel, t_sel = strategy
        n_strats = (s_sel + t_sel).astype(jnp.float32)

        def _sel(s, t):
            return (s_sel == s) & (t_sel == t)
    else:
        def _sel(s, t):
            return jnp.ones(n, bool)
        n_strats = jnp.ones(n)

    cam_pos = o
    c2w = ds.cam_to_world
    cam_fwd = jnp.broadcast_to(normalize(c2w[:3, 2])[None], (n, 3))
    film_area = camera_film_area(ds, xres, yres)

    # sample-dimension streams (offsets chosen past the path-tracer layout)
    def dims(base, k):
        return [sampler.dim(px, py, sample_idx, base + j) for j in range(k)]

    # ---------------- camera subpath ----------------
    pdf_cam_dir, _ = camera_pdf_we(ds, st, cam_pos, cam_fwd, film_area, d)
    v_cam0 = _make_vertex(n, n_chan)
    v_cam0["p"] = cam_pos
    v_cam0["ns"] = cam_fwd
    v_cam0["beta"] = jnp.ones((n, n_chan))
    v_cam0["pdf_fwd"] = jnp.ones(n)
    v_cam0["type"] = jnp.full(n, VT_CAMERA, jnp.int32)
    v_cam0["valid"] = jnp.ones(n, bool)
    u_cam = [jnp.stack(dims(40 + 3 * i, 3)) for i in range(t_max - 1)]
    cam_surf = random_walk(ds, st, isect, features, o, d,
                           jnp.ones((n, n_chan)),
                           pdf_cam_dir, t_max - 1, u_cam,
                           valid, transport_light=False)
    cam_verts = [v_cam0] + cam_surf

    # ---------------- light subpath ----------------
    u_l = dims(40 + 3 * t_max + 1, 5)
    light_cdf = jnp.cumsum(ds.light_pdf)
    lid = jnp.clip(jnp.searchsorted(light_cdf, u_l[0], side="right"),
                   0, max(st.n_lights - 1, 0)).astype(jnp.int32)
    pmf = ds.light_pdf[lid]
    p_l, n_l, d_l, le, pdf_pos, pdf_dir, delta_o, delta_d = sample_le(
        ds, st, lid, u_l[1], u_l[2], u_l[3], u_l[4])
    v_l0 = _make_vertex(n, n_chan)
    v_l0["p"] = p_l
    v_l0["ns"] = n_l
    denom = jnp.maximum(pmf * pdf_pos * pdf_dir, 1e-12)
    cos0 = jnp.abs(dot(n_l, d_l))
    v_l0["beta"] = spec(le) * (cos0 / denom)[..., None]
    v_l0["pdf_fwd"] = pmf * pdf_pos
    v_l0["type"] = jnp.full(n, VT_LIGHT, jnp.int32)
    # the light START vertex keeps delta == false; IsDeltaLight() enters the
    # MIS loop only at i == 0 (bdpt.cpp:291, bdpt.h:168 default)
    v_l0["light"] = lid
    lt0 = ds.light_type[lid]
    lt0_inf = lt0 == LIGHT_INFINITE
    v_l0["on_surface"] = (lt0 == LIGHT_AREA) | (lt0 == LIGHT_DISTANT)
    v_l0["infinite"] = lt0_inf
    l_alive = valid & (st.n_lights > 0) & (jnp.max(le, -1) > 0.0) \
        & (pdf_dir > 0.0)
    v_l0["valid"] = l_alive
    u_lt = [jnp.stack(dims(40 + 3 * t_max + 8 + 3 * i, 3))
            for i in range(s_max - 1)]
    o_l = offset_ray_origin(p_l, jnp.where(
        (jnp.abs(n_l).sum(-1) > 1e-6)[..., None], n_l, d_l), d_l)
    light_surf = random_walk(ds, st, isect, features, o_l, d_l, v_l0["beta"],
                             pdf_dir, s_max - 1, u_lt, l_alive,
                             transport_light=True, prev0=v_l0)
    # the walk couldn't see v_l0: set its pdf_rev from the first bounce and
    # the first surface vertex's pdf_fwd (already area-converted)
    # subpath density corrections for infinite lights (bdpt.cpp:124-136):
    # the start vertex carries the combined solid-angle density, the first
    # surface vertex the planar positional density
    v_l0["pdf_fwd"] = jnp.where(lt0_inf,
                                infinite_light_density(ds, st, d_l),
                                v_l0["pdf_fwd"])
    if light_surf:
        s1 = light_surf[0]
        corr = pdf_pos * jnp.where(
            s1["on_surface"], jnp.abs(dot(d_l, s1["ns"])), 1.0)
        s1["pdf_fwd"] = jnp.where(lt0_inf & s1["valid"], corr,
                                  s1["pdf_fwd"])
    light_verts = [v_l0] + light_surf

    L = jnp.zeros((n, n_chan))
    splat_p = []
    splat_L = []
    u_conn = [jnp.stack(dims(200 + 3 * k, 3)) for k in range(t_max + 2)]

    for t in range(2, t_max + 1):
        pt = cam_verts[t - 1]
        ptm = cam_verts[t - 2]

        # ---- s == 0: the camera path alone (bdpt.cpp:455) ----
        wo_pt = pt["wo"]
        le0 = emitted_radiance(ds, st, jnp.zeros(n, jnp.int32), pt["light"],
                               wo_pt, pt["ns"])
        esc = pt["escaped"]
        d_esc = -wo_pt
        le_esc, _ = miss_radiance_and_pdf(ds, st, d_esc)
        le0 = jnp.where(esc[..., None], le_esc, le0)
        c0 = pt["beta"] * spec(le0)
        can0 = ((pt["valid"] & (pt["light"] >= 0)) | esc) \
            & (jnp.max(c0, -1) > 0.0)
        lid0 = jnp.clip(pt["light"], 0, max(st.n_lights - 1, 0))
        pmf0 = ds.light_pdf[lid0]
        wr_s = _world_radius(ds)
        # escaped endpoint: PdfLightOrigin = InfiniteLightDensity(d);
        # PdfLight toward ptm = planar disk density (bdpt.h:371-383,400-403)
        ov_pt = jnp.where(esc, infinite_light_density(ds, st, d_esc),
                          pdf_light_origin(ds, st, lid0, pmf0))
        ptm_inf = (1.0 / (jnp.pi * wr_s * wr_s)) * jnp.where(
            ptm["on_surface"], jnp.abs(dot(ptm["ns"], d_esc)), 1.0)
        ov_ptm = jnp.where(
            esc, ptm_inf,
            convert_density(
                pdf_light_dir(ds, st, lid0, pt,
                              normalize(ptm["p"] - pt["p"])),
                pt["p"], ptm["p"], ptm["ns"], jnp.ones(n, bool)))
        ov = {"pt": ov_pt, "ptm": ov_ptm}
        w0 = mis_weight(ds, st, features, cam_verts, light_verts, 0, t, ov,
                        jnp.zeros(n, bool), None)
        w0 = jnp.where(t == 2, 1.0, w0)  # directly visible light
        L = L + jnp.where((can0 & _sel(0, t))[..., None],
                          c0 * (w0 * n_strats)[..., None], 0.0)

        for s in range(1, s_max + 1):
            if s + t > max_depth + 2:
                break
            uc = u_conn[(s + t) % len(u_conn)]
            if s == 1:
                # resample a light toward pt (bdpt.cpp:462-490)
                lid1 = jnp.clip(
                    jnp.searchsorted(light_cdf, uc[0], side="right"),
                    0, max(st.n_lights - 1, 0)).astype(jnp.int32)
                pmf1 = ds.light_pdf[lid1]
                ls = sample_li(ds, st, lid1, pt["p"], uc[1], uc[2])
                f_pt, pdf_pt_fwd = _vertex_f(ds, st, pt, ls.wi, features,
                                             False)
                o_sh = offset_ray_origin(pt["p"], pt["ns"], ls.wi)
                occ, _ = isect_p(ds, st, o_sh, ls.wi, ls.dist * 0.997)
                c = pt["beta"] * spec(f_pt) * (
                    jnp.abs(dot(ls.wi, pt["ns"]))
                    / jnp.maximum(ls.pdf * pmf1, 1e-12))[..., None] \
                    * spec(ls.li)
                can = (pt["valid"] & ~occ & (ls.pdf > 0.0)
                       & (jnp.max(c, -1) > 0.0))
                # sampled light vertex for MIS
                q_samp = _make_vertex(n, n_chan)
                p_samp = pt["p"] + ls.wi * ls.dist[..., None]
                q_samp["p"] = p_samp
                # true light-surface normal at the sampled point (the MIS
                # densities need the emitter's cos, not the direction)
                lprim1 = ds.light_prim[lid1]
                tid1 = jnp.clip(lprim1, 0, max(st.n_tris - 1, 0))
                _, _, _, tn1, _ = _gather_tri_light_geo(ds, tid1)
                sid1 = jnp.clip(lprim1 - st.n_tris,
                                0, max(st.n_spheres - 1, 0))
                sc1, _ = _sphere_center_radius(ds, sid1)
                n_sph1 = normalize(p_samp - sc1)
                ns1 = jnp.where((lprim1 < st.n_tris)[..., None], tn1, n_sph1)
                q_samp["ns"] = jnp.where((lprim1 >= 0)[..., None], ns1,
                                         -ls.wi)
                q_samp["light"] = lid1
                q_samp["valid"] = can
                lt1 = ds.light_type[lid1]
                lt1_inf = lt1 == LIGHT_INFINITE
                q_samp["on_surface"] = (lt1 == LIGHT_AREA) \
                    | (lt1 == LIGHT_DISTANT)
                q_samp["infinite"] = lt1_inf
                lv = [q_samp]
                # pt reverse density: PdfLight from the sampled vertex
                # (bdpt.cpp a3: pt->pdfRev = sampled.PdfLight(scene, *pt));
                # infinite lights use the planar disk density (bdpt.h:371)
                wr_s1 = _world_radius(ds)
                pt_ov = convert_density(
                    pdf_light_dir(ds, st, lid1, q_samp, -ls.wi),
                    q_samp["p"], pt["p"], pt["ns"], jnp.ones(n, bool))
                pt_ov = jnp.where(
                    lt1_inf,
                    (1.0 / (jnp.pi * wr_s1 * wr_s1))
                    * jnp.abs(dot(pt["ns"], ls.wi)), pt_ov)
                # ptm reverse density: pt->Pdf(scene, sampled, *ptMinus) —
                # the density of scattering from the SAMPLED vertex toward
                # ptm at pt (NOT pdf_pt_fwd, whose wo/wi are swapped and the
                # BSDF pdfs are not symmetric)
                ov = {
                    "qs": _vertex_pdf(ds, st, pt, ptm["p"], q_samp, features),
                    "pt": pt_ov,
                    "ptm": _vertex_pdf(ds, st, pt, q_samp["p"], ptm,
                                       features),
                }
                l0_fwd = jnp.where(
                    lt1_inf, infinite_light_density(ds, st, ls.wi),
                    pdf_light_origin(ds, st, lid1, pmf1))
                w = mis_weight(ds, st, features, cam_verts, lv, 1, t, ov,
                               ls.is_delta, l0_fwd)
                L = L + jnp.where((can & _sel(1, t))[..., None],
                                  c * (w * n_strats)[..., None], 0.0)
            else:
                qs = light_verts[s - 1]
                qsm = light_verts[s - 2]
                g, wn, dist = _g_term(ds, st, isect_p, qs, pt)
                f_qs, pdf_qs_fwd = _vertex_f(ds, st, qs, wn, features, True)
                f_pt, pdf_pt_fwd = _vertex_f(ds, st, pt, -wn, features,
                                             False)
                c = qs["beta"] * spec(f_qs) * (g[..., None]) \
                    * spec(f_pt) * pt["beta"]
                can = pt["valid"] & qs["valid"] & (jnp.max(c, -1) > 0.0)
                ov = {
                    "qs": _vertex_pdf(ds, st, pt, ptm["p"], qs, features),
                    "pt": convert_density(pdf_qs_fwd, qs["p"], pt["p"],
                                          pt["ns"], jnp.ones(n, bool)),
                    # ptm.pdfRev = pt.Pdf(qs, ptMinus) (bdpt.cpp a5):
                    # reverse density at pt with incoming from qs, NOT the
                    # wo/wi-swapped pdf_pt_fwd (BSDF pdfs are asymmetric)
                    "ptm": _vertex_pdf(ds, st, pt, qs["p"], ptm, features),
                    # qsMinus.pdfRev = qs.Pdf(pt, qsMinus) (bdpt.cpp:273)
                    "qsm": _vertex_pdf(ds, st, qs, pt["p"], qsm, features),
                }
                # IsDeltaLight includes DeltaDirection (distant) lights
                # (bdpt.h:259, bdpt.cpp:291)
                w = mis_weight(ds, st, features, cam_verts, light_verts,
                               s, t, ov, delta_o | delta_d, None)
                L = L + jnp.where((can & _sel(s, t))[..., None],
                                  c * (w * n_strats)[..., None], 0.0)

    # ---- t == 1: light subpath to the camera lens (bdpt.cpp:410) ----
    for s in range(2, s_max + 2):
        if s + 1 > max_depth + 2 or s - 1 >= len(light_verts):
            break
        qs = light_verts[s - 1]
        qsm = light_verts[s - 2]
        to_cam = cam_pos - qs["p"]
        dist = jnp.maximum(length(to_cam), 1e-9)
        wc = to_cam / dist[..., None]
        pdf_dir_c, we = camera_pdf_we(ds, st, cam_pos, cam_fwd, film_area,
                                      -wc)
        praster, inside = camera_raster_from_dir(ds, -wc, xres, yres)
        f_qs, pdf_qs_fwd = _vertex_f(ds, st, qs, wc, features, True)
        # camera importance sample pdf over solid angle -> area at lens is
        # delta; pbrt folds it as We * cos / dist^2 with pdf 1
        o_sh = offset_ray_origin(qs["p"], qs["ns"], wc)
        occ, _ = isect_p(ds, st, o_sh, wc, dist * 0.997)
        cam_cos = jnp.abs(dot(wc, cam_fwd))
        c = qs["beta"] * spec(f_qs) * (
            we * jnp.abs(dot(wc, qs["ns"])) * cam_cos / jnp.maximum(
                dist * dist, 1e-9))[..., None]
        can = qs["valid"] & inside & ~occ & (jnp.max(c, -1) > 0.0)
        ov = {
            "qs": convert_density(pdf_dir_c, cam_pos, qs["p"], qs["ns"],
                                  jnp.ones(n, bool)),
            "qsm": _vertex_pdf(ds, st, qs, cam_pos, qsm, features),
        }
        w = mis_weight(ds, st, features, [v_cam0], light_verts, s, 1, ov,
                       delta_o | delta_d, None)
        if strategy is None:
            splat_p.append(jnp.where(can[..., None], praster, -1.0))
            splat_L.append(jnp.where(can[..., None], c * w[..., None], 0.0))
        else:
            sel = can & _sel(s, 1)
            L = L + jnp.where(sel[..., None],
                              c * (w * n_strats)[..., None], 0.0)
            splat_p.append(jnp.where(sel[..., None], praster, 0.0))

    if n_chan != 3:
        from tpupt.core.spectrum import sampled_to_rgb

        L = sampled_to_rgb(L)
        splat_L = [sampled_to_rgb(x) for x in splat_L]

    if strategy is not None:
        # lane raster: lens projection for the selected t == 1 strategy,
        # the lane's own camera raster otherwise (mlt.cpp:160 pRaster)
        pr_out = p_raster_cam
        is_t1 = t_sel == 1
        if splat_p:
            pr_t1 = sum(splat_p)
            pr_out = jnp.where(is_t1[..., None], pr_t1, pr_out)
        return L, pr_out

    if splat_p:
        sp_p = jnp.concatenate(splat_p)
        sp_L = jnp.concatenate(splat_L)
    else:
        sp_p = jnp.full((1, 2), -1.0)
        sp_L = jnp.zeros((1, 3))
    aov = jnp.zeros((n, 4))
    return L, aov, sp_p, sp_L
