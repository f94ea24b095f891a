"""Stochastic progressive photon mapping (counterpart of integrators/sppm.cpp).

The reference alternates camera passes that deposit per-pixel visible points
into a hash grid (sppm.cpp:111-208) with photon passes that walk the grid's
linked lists and atomically accumulate Phi (sppm.cpp:210-290), then shrinks
each pixel's radius with alpha = 2/3 (sppm.cpp:292-315).

TPU inversion: the visible points are a fixed-size SoA (one per pixel), the
hash grid becomes a SORTED voxel-key array (argsort + searchsorted replace
the lock-free linked lists), and the photon pass is a wavefront whose
deposit step scans the 27 neighbor voxels with a capped per-voxel visit
loop, scatter-adding Phi/M by pixel id. Overflow beyond the cap is counted
and reported instead of silently dropped."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core import rng as rngm
from tpupt.core.vecmath import dot, normalize, offset_ray_origin
from tpupt.integrators.bdpt import sample_le
from tpupt.integrators.path import shading_point
from tpupt.lights.lights import sample_li
from tpupt.materials import bsdf as bx

GAMMA = 2.0 / 3.0  # radius-shrink alpha (sppm.cpp:295)
VOXEL_CAP = 8      # visible points visited per neighbor voxel


class SPPMRenderer:
    """SPPMIntegrator::Render counterpart."""

    def __init__(self, renderer, initial_radius=None, photons_per_iter=None):
        self.r = renderer
        sc = renderer.scene
        self.xres, self.yres = sc.film.xres, sc.film.yres
        self.npix = self.xres * self.yres
        ds = renderer.ds
        diag = float(np.asarray(jnp.linalg.norm(ds.world_hi - ds.world_lo)))
        self.r0 = initial_radius or max(diag, 1e-3) * 0.01
        self.n_photons = photons_per_iter or max(self.npix, 4096)
        self.max_depth = sc.integrator.max_depth

    # ---------------- camera pass: find visible points ----------------

    def _camera_pass(self, ds, st, it):
        """One camera path per pixel -> visible point + direct light Ld
        (sppm.cpp:145-208: NEE at each vertex, walk through speculars)."""
        from tpupt.cameras.perspective import generate_rays

        r = self.r
        sc = r.scene
        feats = st.mat_features
        px, py = r.px, r.py
        n = px.shape[0]
        key = rngm.hash_combine(jnp.uint32(it * 2 + 1),
                                px.astype(jnp.uint32) * 31337
                                + py.astype(jnp.uint32))
        jx = rngm.uniform_float(key, jnp.uint32(0))
        jy = rngm.uniform_float(key, jnp.uint32(1))
        pr = jnp.stack([px.astype(jnp.float32) + jx,
                        py.astype(jnp.float32) + jy], -1)
        o, d = generate_rays(sc.camera.type, ds.raster_to_camera,
                             ds.cam_to_world, pr,
                             jnp.stack([rngm.uniform_float(key, 2),
                                        rngm.uniform_float(key, 3)], -1),
                             sc.camera.lens_radius, sc.camera.focal_distance,
                             self.xres, self.yres)
        beta = jnp.ones((n, 3))
        alive = r.valid
        Ld = jnp.zeros((n, 3))
        vp_p = jnp.zeros((n, 3))
        vp_ns = jnp.zeros((n, 3))
        vp_wo = jnp.zeros((n, 3))
        vp_beta = jnp.zeros((n, 3))
        vp_mat = jnp.zeros(n, jnp.int32)
        vp_uv = jnp.zeros((n, 2))
        have_vp = jnp.zeros(n, bool)
        light_cdf = jnp.cumsum(ds.light_pdf)
        from tpupt.lights.lights import emitted_radiance

        for depth in range(self.max_depth):
            hit, _ = r._isect(ds, st, o, d, jnp.where(alive, jnp.inf, 0.0))
            sp = shading_point(ds, st, hit, o, d)
            ok = alive & hit.valid
            wo = -d
            le = emitted_radiance(ds, st, hit.prim, sp.light, wo, sp.ns)
            Ld = Ld + jnp.where(ok[..., None], beta * le, 0.0)

            mp = bx.gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p,
                                      face=sp.face,
                                      has_textures=st.has_textures,
                                      has_mix="mix" in feats)
            t_f, b_f, n_f = bx.make_frame(sp.ns)
            wo_l = bx.to_local(t_f, b_f, n_f, wo)

            # NEE at the vertex (sppm.cpp:180 UniformSampleOneLight)
            if st.n_lights > 0:
                u0 = rngm.uniform_float(key, 10 + depth * 8)
                lid = jnp.clip(jnp.searchsorted(light_cdf, u0, side="right"),
                               0, st.n_lights - 1).astype(jnp.int32)
                ls = sample_li(ds, st, lid, sp.p,
                               rngm.uniform_float(key, 11 + depth * 8),
                               rngm.uniform_float(key, 12 + depth * 8))
                wi_l = bx.to_local(t_f, b_f, n_f, ls.wi)
                f_l, _ = bx.eval_pdf(mp, wo_l, wi_l, feats)
                f_l = f_l * jnp.abs(dot(ls.wi, sp.ns))[..., None]
                can = ok & (ls.pdf > 0.0) & (jnp.max(f_l, -1) > 0.0)
                o_sh = offset_ray_origin(sp.p, sp.ng, ls.wi)
                occ, _ = r._isect_p(ds, st, o_sh, ls.wi,
                                    jnp.where(can, ls.dist * 0.997, 0.0))
                pmf = ds.light_pdf[lid]
                contrib = beta * f_l * ls.li / jnp.maximum(
                    ls.pdf * pmf, 1e-12)[..., None]
                Ld = Ld + jnp.where((can & ~occ)[..., None], contrib, 0.0)

            # sample continuation; STOP at the first non-specular vertex
            bs = bx.sample(mp, wo_l,
                           rngm.uniform_float(key, 13 + depth * 8),
                           rngm.uniform_float(key, 14 + depth * 8),
                           rngm.uniform_float(key, 15 + depth * 8), feats)
            diffuse_here = ok & ~bs.specular
            store = diffuse_here & ~have_vp
            vp_p = jnp.where(store[..., None], sp.p, vp_p)
            vp_ns = jnp.where(store[..., None], sp.ns, vp_ns)
            vp_wo = jnp.where(store[..., None], wo, vp_wo)
            vp_beta = jnp.where(store[..., None], beta, vp_beta)
            vp_mat = jnp.where(store, sp.mat, vp_mat)
            vp_uv = jnp.where(store[..., None], sp.uv, vp_uv)
            have_vp = have_vp | store

            wi_w = bx.to_world(t_f, b_f, n_f, bs.wi)
            thru = bs.f * (jnp.abs(dot(wi_w, sp.ns))
                           / jnp.maximum(bs.pdf, 1e-9))[..., None]
            cont = ok & bs.specular & (bs.pdf > 1e-9)
            beta = jnp.where(cont[..., None], beta * thru, beta)
            o = jnp.where(cont[..., None],
                          offset_ray_origin(sp.p, sp.ng, wi_w), o)
            d = jnp.where(cont[..., None], wi_w, d)
            alive = cont
        return dict(p=vp_p, ns=vp_ns, wo=vp_wo, beta=vp_beta, mat=vp_mat,
                    uv=vp_uv, have=have_vp, Ld=Ld)

    # ---------------- photon pass ----------------

    def _photon_pass(self, ds, st, it, vp, radius, grid_lo, cell):
        """Trace photons_per_iter photons; deposit Phi into visible points
        via the sorted-voxel grid (sppm.cpp:210-290)."""
        r = self.r
        feats = st.mat_features
        m = self.n_photons
        lanes = jnp.arange(m, dtype=jnp.uint32)
        key = rngm.hash_combine(jnp.uint32(it * 2 + 2), lanes)

        # sort visible points by voxel key
        g = 1024  # virtual grid resolution per axis for the key
        vox = jnp.clip(((vp["p"] - grid_lo) / cell).astype(jnp.int32),
                       0, g - 1)
        vkey = (vox[:, 0] * g + vox[:, 1]) * g + vox[:, 2]
        vkey = jnp.where(vp["have"], vkey, jnp.int32((g ** 3)))
        order = jnp.argsort(vkey)
        skey = vkey[order]

        light_cdf = jnp.cumsum(ds.light_pdf)
        u0 = rngm.uniform_float(key, 0)
        lid = jnp.clip(jnp.searchsorted(light_cdf, u0, side="right"),
                       0, max(st.n_lights - 1, 0)).astype(jnp.int32)
        pmf = ds.light_pdf[lid]
        p_l, n_l, d_l, le, pdf_pos, pdf_dir, _, _ = sample_le(
            ds, st, lid,
            rngm.uniform_float(key, 1), rngm.uniform_float(key, 2),
            rngm.uniform_float(key, 3), rngm.uniform_float(key, 4))
        beta = le * (jnp.abs(dot(n_l, d_l))
                     / jnp.maximum(pmf * pdf_pos * pdf_dir, 1e-12))[..., None]
        alive = (jnp.max(le, -1) > 0.0) & (pdf_dir > 0.0)
        o = offset_ray_origin(p_l, jnp.where(
            (jnp.abs(n_l).sum(-1) > 1e-6)[..., None], n_l, d_l), d_l)
        d = d_l

        phi = jnp.zeros((self.npix_pad, 3))
        m_cnt = jnp.zeros(self.npix_pad)
        overflow = jnp.zeros((), jnp.int32)

        for depth in range(self.max_depth):
            hit, _ = r._isect(ds, st, o, d, jnp.where(alive, jnp.inf, 0.0))
            sp = shading_point(ds, st, hit, o, d)
            ok = alive & hit.valid

            if depth > 0:
                # deposit at this photon intersection (bounce >= 1 photons
                # only light INDIRECT pixels; direct handled by camera NEE —
                # pbrt deposits from depth >= 1, sppm.cpp:250)
                dep = ok
                pvox = ((sp.p - grid_lo) / cell).astype(jnp.int32)
                for ox in (-1, 0, 1):
                    for oy in (-1, 0, 1):
                        for oz in (-1, 0, 1):
                            nb = pvox + jnp.asarray([ox, oy, oz],
                                                    jnp.int32)
                            nb = jnp.clip(nb, 0, g - 1)
                            nkey = (nb[:, 0] * g + nb[:, 1]) * g + nb[:, 2]
                            lo_i = jnp.searchsorted(skey, nkey, side="left")
                            hi_i = jnp.searchsorted(skey, nkey, side="right")
                            overflow = overflow + jnp.sum(
                                jnp.maximum(hi_i - lo_i - VOXEL_CAP, 0)
                            ).astype(jnp.int32)
                            for k in range(VOXEL_CAP):
                                idx = jnp.minimum(lo_i + k,
                                                  self.npix_pad - 1)
                                valid_k = dep & (lo_i + k < hi_i)
                                vid = order[idx]
                                dist2 = jnp.sum(
                                    (vp["p"][vid] - sp.p) ** 2, -1)
                                r2 = radius[vid] ** 2
                                near = valid_k & vp["have"][vid] \
                                    & (dist2 <= r2)
                                # Phi += beta * f(wo_vp, -d): the FULL
                                # BSDF of the visible point (sppm.cpp:262
                                # bsdf->f(wo, wi)), not just its diffuse
                                # lobe — glossy visible points gather
                                # photons through their microfacet lobes
                                mp_v = bx.gather_mat_params(
                                    ds, vp["mat"][vid], uv=vp["uv"][vid],
                                    p=vp["p"][vid],
                                    has_textures=st.has_textures,
                                    has_mix="mix" in feats)
                                tv, bv, nv = bx.make_frame(vp["ns"][vid])
                                wo_lv = bx.to_local(tv, bv, nv,
                                                    vp["wo"][vid])
                                wi_lv = bx.to_local(tv, bv, nv, -d)
                                f_v, _ = bx.eval_pdf(mp_v, wo_lv, wi_lv,
                                                     feats)
                                contrib = jnp.where(
                                    near[..., None], beta * f_v, 0.0)
                                phi = phi.at[jnp.where(near, vid,
                                                       self.npix_pad - 1)
                                             ].add(contrib)
                                m_cnt = m_cnt.at[jnp.where(
                                    near, vid, self.npix_pad - 1)].add(
                                        near.astype(jnp.float32))

            # photon continuation (BSDF sample + RR, sppm.cpp:270-288)
            mp = bx.gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p,
                                      face=sp.face,
                                      has_textures=st.has_textures,
                                      has_mix="mix" in feats)
            t_f, b_f, n_f = bx.make_frame(sp.ns)
            wo_l = bx.to_local(t_f, b_f, n_f, -d)
            bs = bx.sample(mp, wo_l,
                           rngm.uniform_float(key, 20 + depth * 8),
                           rngm.uniform_float(key, 21 + depth * 8),
                           rngm.uniform_float(key, 22 + depth * 8), feats)
            wi_w = bx.to_world(t_f, b_f, n_f, bs.wi)
            thru = bs.f * (jnp.abs(dot(wi_w, sp.ns))
                           / jnp.maximum(bs.pdf, 1e-9))[..., None]
            beta_new = beta * thru
            # russian roulette on the throughput ratio (sppm.cpp:283)
            q = jnp.clip(1.0 - jnp.max(beta_new, -1)
                         / jnp.maximum(jnp.max(beta, -1), 1e-12), 0.0, 0.95)
            u_rr = rngm.uniform_float(key, 23 + depth * 8)
            survive = u_rr >= q
            beta = beta_new / jnp.maximum(1.0 - q, 1e-6)[..., None]
            alive = ok & (bs.pdf > 1e-9) & survive \
                & (jnp.max(beta, -1) > 0.0)
            o = offset_ray_origin(sp.p, sp.ng, wi_w)
            d = wi_w
        return phi[: self.npix_pad], m_cnt[: self.npix_pad], overflow

    # ---------------- driver ----------------

    def render(self, n_iterations=16, verbose=False):
        r = self.r
        ds, st = r.ds, r.st
        n = r.px.shape[0]
        self.npix_pad = n
        radius = jnp.full(n, self.r0)
        N = jnp.zeros(n)
        tau = jnp.zeros((n, 3))
        Ld_acc = jnp.zeros((n, 3))
        self._cam_jit = getattr(self, "_cam_jit", None) or jax.jit(
            lambda ds, it: self._camera_pass(ds, st, it))
        self._ph_jit = getattr(self, "_ph_jit", None) or jax.jit(
            lambda ds, it, vp, radius, grid_lo, cell: self._photon_pass(
                ds, st, it, vp, radius, grid_lo, cell))
        overflow_total = 0
        for it in range(n_iterations):
            vp = self._cam_jit(ds, jnp.uint32(it))
            Ld_acc = Ld_acc + vp["Ld"]
            cell = jnp.max(radius) * 1.0001
            grid_lo = ds.world_lo - 2 * cell
            phi, m_cnt, ovf = self._ph_jit(ds, jnp.uint32(it), vp, radius,
                                           grid_lo, cell)
            overflow_total += int(ovf)
            # radius/flux update (sppm.cpp:292-315)
            has = m_cnt > 0
            n_new = N + GAMMA * m_cnt
            r_new = jnp.where(has,
                              radius * jnp.sqrt(n_new
                                                / jnp.maximum(N + m_cnt,
                                                              1e-9)),
                              radius)
            tau = jnp.where(has[..., None],
                            (tau + vp["beta"] * phi)
                            * ((r_new / radius) ** 2)[..., None],
                            tau)
            N, radius = n_new, r_new
            if verbose:
                print(f"  sppm pass {it + 1}/{n_iterations} "
                      f"(max r {float(radius.max()):.4f})", flush=True)
        if overflow_total:
            import warnings

            warnings.warn(f"sppm: {overflow_total} voxel-cap overflows "
                          f"(VOXEL_CAP={VOXEL_CAP}); increase photon grid "
                          "resolution for this scene")
        n_total = n_iterations * self.n_photons
        L = (Ld_acc / n_iterations
             + tau / (n_total * jnp.pi
                      * jnp.maximum(radius, 1e-9)[..., None] ** 2))
        img = np.zeros((self.npix, 3), np.float32)
        pid = np.asarray(r.py) * self.xres + np.asarray(r.px)
        valid = np.asarray(r.valid)
        np.add.at(img, pid[valid], np.asarray(L)[valid])
        # Film integration (--stats/--writestats parity): the per-pixel
        # estimate enters film.rgb with unit weight — SPPM's estimator is
        # already per-pixel-normalized (sppm.cpp:307 writes pixels
        # directly), so a box reconstruction with weight 1 is exact
        from tpupt.film import film as filmmod

        self.film = filmmod.new_film(self.xres, self.yres)
        w = np.zeros(self.npix, np.float32)
        np.add.at(w, pid[valid], 1.0)
        self.film = self.film._replace(
            rgb=jnp.asarray(img * w[:, None] / np.maximum(w[:, None], 1.0)),
            weight=jnp.asarray(np.maximum(w, 0.0)))
        return img.reshape(self.yres, self.xres, 3)
