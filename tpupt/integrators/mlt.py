"""Metropolis light transport — multiplexed PSSMLT over BDPT strategies
(counterpart of integrators/mlt.cpp).

The reference runs PSSMLT over BDPT path strategies: bootstrap paths per
depth estimate the normalization b (mlt.cpp:177-186), Markov chains mutate
a primary-sample vector with large/small steps (MLTSampler, mlt.cpp:62-130)
and splat both the current and proposed paths with the Veach-style
acceptance weights (mlt.cpp:231-258). Each chain carries a FIXED path depth
and re-picks one (s, t) BDPT strategy per mutation from the mutated sample
(mlt.cpp:151-163 — the "multiplexed" MLT of Hachisuka et al. 2014), scaled
by nStrategies for the uniform strategy choice.

TPU inversion: thousands of chains run in LOCKSTEP as one wavefront — each
lane is a chain whose state is its primary-sample vector u in [0,1)^D, its
fixed depth, its current radiance and raster position. Each mutation step
evaluates the BDPT wavefront kernel once in single-strategy mode
(`bdpt_li(strategy=...)`): the camera/light subpath walks are shared across
all lanes, the (s, t) double loop is unrolled, and each lane keeps only its
selected strategy — so a Markov step costs one BDPT wavefront evaluation
regardless of the per-lane strategy mix."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core import rng as rngm


class PSSSampler:
    """Sampler adapter: dimension lookups come from the chain's primary
    sample vector (MLTSampler::Get1D, mlt.cpp:84). The BDPT kernel requests
    dims at sparse static offsets (its camera/light/connection streams);
    each distinct offset is assigned the next free column at trace time, so
    every decision in the path gets its own mutated coordinate (the
    reference's three-stream layout, mlt.cpp:62-80, flattened)."""

    RESERVED = 5  # 0,1 raster; 2,3 lens; 4 strategy choice

    def __init__(self, u_mat):
        self.u = u_mat  # (N, D)
        self.spp = 1
        self.map = {}

    def dim(self, px, py, s, d):
        col = self.map.setdefault(int(d), self.RESERVED + len(self.map))
        return self.u[:, col % self.u.shape[1]]

    def camera_jitter(self, px, py, s):
        return self.u[:, 0], self.u[:, 1]


def n_pss_dims(max_depth: int) -> int:
    """Columns needed for one full BDPT evaluation at max_depth: reserved
    raster/lens/strategy + camera walk + light start + light walk +
    connection streams (see bdpt_li's dim layout)."""
    t_max, s_max = max_depth + 2, max_depth + 1
    return (PSSSampler.RESERVED + 3 * (t_max - 1) + 5 + 3 * (s_max - 1)
            + 3 * (t_max + 2))


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
        from tpupt.integrators.bdpt import bdpt_li

        self.r = renderer
        self.p_large = p_large
        self.sigma = sigma
        sc = renderer.scene
        self.xres, self.yres = sc.film.xres, sc.film.yres
        md = sc.integrator.max_depth
        self.max_depth = md
        self.n_dims = n_pss_dims(md)
        self.n = n_chains or renderer.batch
        self.n_bootstrap = max(n_bootstrap // (md + 1), self.n)

        ds, st = renderer.ds, renderer.st
        cam = sc.camera

        def eval_path(ds, u, depth):
            """L(u | depth): radiance of the single BDPT strategy the
            mutated sample selects at this chain's depth (mlt.cpp:151-163).
            Returns (L, p_raster) — raster is lens-projected for t == 1."""
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
            n_strats = depth + 2
            s_sel = jnp.minimum(
                (u[:, 4] * n_strats.astype(jnp.float32)).astype(jnp.int32),
                n_strats - 1)
            t_sel = n_strats - s_sel
            L, pr = bdpt_li(ds, st, s, md, px, py, jnp.uint32(0), o, d,
                            renderer._isect, renderer._isect_p,
                            self.xres, self.yres,
                            strategy=(s_sel, t_sel), p_raster_cam=p_raster)
            bad = ~jnp.isfinite(L).all(-1) | (jnp.min(L, -1) < 0.0)
            L = jnp.where(bad[..., None], 0.0, L)
            return L, pr

        self._eval = jax.jit(eval_path)

        def step(ds, u, depth, L_cur, pr_cur, splat, key):
            u_prop, large = mutate(u, key, p_large, sigma)
            L_prop, pr_prop = eval_path(ds, u_prop, depth)
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

        self._step = jax.jit(step, donate_argnums=(1, 3, 4, 5))

    def render(self, mutations_per_pixel=32, seed=7, verbose=False):
        ds = self.r.ds
        md = self.max_depth
        npx = self.xres * self.yres
        # ---- bootstrap: nBootstrap samples PER DEPTH (mlt.cpp:177-186) ----
        rng = np.random.default_rng(seed)
        ys, us = [], []  # indexed [depth][chunk]
        for k in range(md + 1):
            yk, uk = [], []
            for k0 in range(0, self.n_bootstrap, self.n):
                u = jnp.asarray(rng.random((self.n, self.n_dims), np.float32))
                L, _ = self._eval(ds, u, jnp.full(self.n, k, jnp.int32))
                yk.append(np.asarray(_luminance(L)))
                uk.append(np.asarray(u))
            ys.append(np.concatenate(yk)[: self.n_bootstrap])
            us.append(np.concatenate(uk)[: self.n_bootstrap])
        y_boot = np.stack(ys)  # (md+1, n_bootstrap)
        # b = funcInt * (maxDepth + 1) = sum / nBootstrap (mlt.cpp:186)
        self.b = float(y_boot.sum() / self.n_bootstrap)
        if self.b <= 0:
            self.b = 1e-9
        # chains pick a (depth, bootstrap) jointly proportional to luminance
        flat = y_boot.reshape(-1)
        cdf = np.cumsum(flat)
        cdf = cdf / max(cdf[-1], 1e-30)
        pick = np.clip(np.searchsorted(cdf, rng.random(self.n)),
                       0, flat.size - 1)
        depth = jnp.asarray((pick // self.n_bootstrap).astype(np.int32))
        us_arr = np.stack(us)  # (md+1, n_bootstrap, D)
        u = jnp.asarray(us_arr[pick // self.n_bootstrap,
                               pick % self.n_bootstrap])
        L_cur, pr_cur = self._eval(ds, u, depth)

        splat = jnp.zeros((npx, 3))
        total_mut = mutations_per_pixel * npx
        n_steps = max(total_mut // self.n, 1)
        for it in range(n_steps):
            key = jnp.uint32((seed * 2654435761 + it * 4 + 1) % (1 << 32))
            u, L_cur, pr_cur, splat = self._step(ds, u, depth, L_cur, pr_cur,
                                                 splat, key)
            if verbose and (it + 1) % 32 == 0:
                print(f"  mlt step {it + 1}/{n_steps}", flush=True)
        # final estimate: b * splat / totalMutations * npixels
        # (pbrt: splatScale = b / mutationsPerPixel with per-pixel splats)
        scale = self.b / (n_steps * self.n) * npx
        # the estimate also lands in a Film (film.splat with splatScale 1,
        # Film::AddSplat + WriteImage parity, film.cpp:144-153) so the
        # --stats/--writestats machinery serves MLT like every other
        # integrator; traversal counters stay zero (the multiplexed BDPT
        # kernel does not thread GeneralStats through its strategies)
        from tpupt.film import film as filmmod

        self.film = filmmod.new_film(self.xres, self.yres)
        self.film = self.film._replace(splat=splat * scale)
        img = np.asarray(splat).reshape(self.yres, self.xres, 3) * scale
        return img


def _splat(splat, p_raster, L, xres, yres):
    ix = jnp.clip(p_raster[:, 0].astype(jnp.int32), 0, xres - 1)
    iy = jnp.clip(p_raster[:, 1].astype(jnp.int32), 0, yres - 1)
    return splat.at[iy * xres + ix].add(L)
