"""Metropolis light transport — primary-sample-space MLT
(counterpart of integrators/mlt.cpp).

The reference runs PSSMLT over BDPT path strategies: bootstrap paths
estimate the normalization b (mlt.cpp:177-186), Markov chains mutate a
primary-sample vector with large/small steps (MLTSampler, mlt.cpp:62-130)
and splat both the current and proposed paths with the Veach-style
acceptance weights (mlt.cpp:231-258).

TPU inversion: thousands of chains run in LOCKSTEP as one wavefront — each
lane is a chain whose state is its primary-sample vector u in [0,1)^D, its
current path radiance and raster position. Each mutation step evaluates the
full wavefront path kernel once (the same jitted `path_li` the path
integrator uses), so the Markov step costs exactly one spp-batch. The path
estimator here is the forward path tracer with NEE (a Kelemen-02 PSSMLT);
the reference mutates BDPT strategies instead — noted in COMPONENTS.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core import rng as rngm


class PSSSampler:
    """Sampler adapter: dimension lookups come from the chain's primary
    sample vector (MLTSampler::Get1D, mlt.cpp:84)."""

    def __init__(self, u_mat):
        self.u = u_mat  # (N, D)
        self.spp = 1

    def dim(self, px, py, s, d):
        return self.u[:, d % self.u.shape[1]]

    def camera_jitter(self, px, py, s):
        # dims 0/1 ARE the full-image raster position for MLT; the path
        # kernel re-derives jitter from them (we pass p_raster explicitly)
        return self.u[:, 0], self.u[:, 1]


def _luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _erfinv(x):
    """Winitzki approximation (sufficient for mutation kernels)."""
    a = 0.147
    x = jnp.clip(x, -0.999999, 0.999999)
    ln1mx2 = jnp.log(jnp.maximum(1.0 - x * x, 1e-30))
    t = 2.0 / (jnp.pi * a) + ln1mx2 / 2.0
    return jnp.sign(x) * jnp.sqrt(jnp.maximum(
        jnp.sqrt(t * t - ln1mx2 / a) - t, 0.0))


def mutate(u, key, p_large, sigma):
    """Large-step restart or small-step Gaussian perturbation with wraparound
    (MLTSampler::EnsureReady, mlt.cpp:98-126)."""
    n, d = u.shape
    lanes = jnp.arange(n, dtype=jnp.uint32)
    r_large = rngm.uniform_float(key, lanes, jnp.uint32(0))
    large = r_large < p_large
    dims = jnp.arange(d, dtype=jnp.uint32)
    r = rngm.uniform_float(key + 1, lanes[:, None], dims[None, :])
    r2 = rngm.uniform_float(key + 2, lanes[:, None], dims[None, :])
    small = u + sigma * 1.41421356 * _erfinv(2.0 * r2 - 1.0)
    small = small - jnp.floor(small)
    return jnp.where(large[:, None], r, small), large


class MLTRenderer:
    """MLTIntegrator::Render counterpart (mlt.cpp:165-258)."""

    def __init__(self, renderer, n_bootstrap=4096 * 16, n_chains=None,
                 p_large=0.3, sigma=0.01):
        from tpupt.integrators.path import path_li

        self.r = renderer
        self.p_large = p_large
        self.sigma = sigma
        sc = renderer.scene
        self.xres, self.yres = sc.film.xres, sc.film.yres
        md = sc.integrator.max_depth
        self.n_dims = 5 + 7 * (md + 1)
        self.n = n_chains or renderer.batch
        self.n_bootstrap = max(n_bootstrap, self.n)

        ds, st = renderer.ds, renderer.st
        cam = sc.camera

        def eval_path(ds, u):
            """L(u): path radiance for primary sample vector u (N, D)."""
            from tpupt.cameras.perspective import generate_rays

            s = PSSSampler(u)
            p_raster = jnp.stack([u[:, 0] * self.xres, u[:, 1] * self.yres],
                                 -1)
            o, d = generate_rays(cam.type, ds.raster_to_camera,
                                 ds.cam_to_world, p_raster,
                                 u[:, 2:4], cam.lens_radius,
                                 cam.focal_distance, self.xres, self.yres)
            px = jnp.clip(p_raster[:, 0].astype(jnp.int32), 0, self.xres - 1)
            py = jnp.clip(p_raster[:, 1].astype(jnp.int32), 0, self.yres - 1)
            L, _ = path_li(ds, st, s, md, sc.integrator.rr_threshold,
                           px, py, jnp.uint32(0), o, d,
                           isect=renderer._isect, isect_p=renderer._isect_p)
            bad = ~jnp.isfinite(L).all(-1) | (jnp.min(L, -1) < 0.0)
            L = jnp.where(bad[..., None], 0.0, L)
            return L, p_raster

        self._eval = jax.jit(eval_path)

        def step(ds, u, L_cur, pr_cur, splat, key):
            u_prop, large = mutate(u, key, p_large, sigma)
            L_prop, pr_prop = self._eval_inner(ds, u_prop)
            y_cur = _luminance(L_cur)
            y_prop = _luminance(L_prop)
            a = jnp.minimum(1.0, y_prop / jnp.maximum(y_cur, 1e-12))
            a = jnp.where(y_cur <= 0.0, jnp.where(y_prop > 0, 1.0, 0.0), a)
            # expected-value splats (mlt.cpp:242-246): both states, each
            # weighted by its visit probability over its luminance
            w_prop = jnp.where(y_prop > 0, a / jnp.maximum(y_prop, 1e-12),
                               0.0)
            w_cur = jnp.where(y_cur > 0,
                              (1.0 - a) / jnp.maximum(y_cur, 1e-12), 0.0)
            splat = _splat(splat, pr_prop, L_prop * w_prop[:, None],
                           self.xres, self.yres)
            splat = _splat(splat, pr_cur, L_cur * w_cur[:, None],
                           self.xres, self.yres)
            lanes = jnp.arange(u.shape[0], dtype=jnp.uint32)
            r_acc = rngm.uniform_float(key + 3, lanes, jnp.uint32(9))
            acc = r_acc < a
            u = jnp.where(acc[:, None], u_prop, u)
            L_cur = jnp.where(acc[:, None], L_prop, L_cur)
            pr_cur = jnp.where(acc[:, None], pr_prop, pr_cur)
            return u, L_cur, pr_cur, splat

        def eval_inner(ds, u):
            return eval_path(ds, u)

        self._eval_inner = eval_inner
        self._step = jax.jit(step, donate_argnums=(1, 2, 3, 4))

    def render(self, mutations_per_pixel=32, seed=7, verbose=False):
        ds = self.r.ds
        npx = self.xres * self.yres
        # ---- bootstrap (mlt.cpp:177-186) ----
        rng = np.random.default_rng(seed)
        ys, us = [], []
        for k0 in range(0, self.n_bootstrap, self.n):
            u = jnp.asarray(rng.random((self.n, self.n_dims), np.float32))
            L, _ = self._eval(ds, u)
            ys.append(np.asarray(_luminance(L)))
            us.append(np.asarray(u))
        y_boot = np.concatenate(ys)[: self.n_bootstrap]
        u_boot = np.concatenate(us)[: self.n_bootstrap]
        self.b = float(y_boot.mean())
        if self.b <= 0:
            self.b = 1e-9
        # chains chosen proportional to bootstrap luminance (bdpt bootstrap
        # Distribution1D, mlt.cpp:186)
        cdf = np.cumsum(y_boot)
        cdf = cdf / max(cdf[-1], 1e-30)
        pick = np.searchsorted(cdf, rng.random(self.n))
        u = jnp.asarray(u_boot[np.clip(pick, 0, self.n_bootstrap - 1)])
        L_cur, pr_cur = self._eval(ds, u)

        splat = jnp.zeros((npx, 3))
        total_mut = mutations_per_pixel * npx
        n_steps = max(total_mut // self.n, 1)
        for it in range(n_steps):
            key = jnp.uint32((seed * 2654435761 + it * 4 + 1) % (1 << 32))
            u, L_cur, pr_cur, splat = self._step(ds, u, L_cur, pr_cur,
                                                 splat, key)
            if verbose and (it + 1) % 32 == 0:
                print(f"  mlt step {it + 1}/{n_steps}", flush=True)
        # final estimate: b * splat / totalMutations * npixels
        # (pbrt: splatScale = b / mutationsPerPixel with per-pixel splats)
        scale = self.b / (n_steps * self.n) * npx
        img = np.asarray(splat).reshape(self.yres, self.xres, 3) * scale
        return img


def _splat(splat, p_raster, L, xres, yres):
    ix = jnp.clip(p_raster[:, 0].astype(jnp.int32), 0, xres - 1)
    iy = jnp.clip(p_raster[:, 1].astype(jnp.int32), 0, yres - 1)
    return splat.at[iy * xres + ix].add(L)
