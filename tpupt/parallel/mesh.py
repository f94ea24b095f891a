"""Device-mesh sharding for rendering and differentiable-render training.

TPU-native replacement for the reference's two parallelism mechanisms
(SURVEY.md §2.13): the in-process tile thread pool (parallel.cpp:184
ParallelFor2D over 16x16 tiles) becomes ray-batch sharding over a
`jax.sharding.Mesh`, and the ssh benchmark farm becomes pod-slice scale-out
via `jax.distributed` (the same code path — mesh axes spanning hosts).

Scheme: pure data parallelism over rays — the scene tensors are replicated
(they are read-only, like the reference's shared Scene), each device traces
its ray shard into a device-local film, and films/gradients are `psum` over
the mesh (ICI collectives). Determinism: the stateless samplers make every
(pixel, sample) reproducible on any shard (integrator.cpp:251's tile-seed
scheme, strengthened)."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpupt.cameras.perspective import generate_rays
from tpupt.film import film as filmmod
from tpupt.integrators.path import path_li, pick_traversal
from tpupt.samplers.samplers import WavefrontSampler
from tpupt.scene.device import upload


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class ShardedRenderer:
    """Data-parallel renderer: rays sharded over the mesh, scene replicated,
    per-device films psum-reduced at the end of each sample step."""

    def __init__(self, scene, mesh: Optional[Mesh] = None):
        from tpupt.integrators.path import Renderer

        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.base = Renderer(scene)
        self.cfg = self.base.cfg
        n_dev = self.mesh.size

        # pad the pixel list so it divides evenly across devices
        npix = int(self.base.px.shape[0])
        per = -(-npix // n_dev)
        pad = per * n_dev - npix
        px = jnp.concatenate([self.base.px, jnp.zeros(pad, jnp.int32)])
        py = jnp.concatenate([self.base.py, jnp.zeros(pad, jnp.int32)])
        valid = jnp.concatenate([self.base.valid[:npix],
                                 jnp.zeros(pad, bool)])
        shard = NamedSharding(self.mesh, P(self.axis))
        self.px = jax.device_put(px, shard)
        self.py = jax.device_put(py, shard)
        self.valid = jax.device_put(valid, shard)

        ds, st = self.base.ds, self.base.st
        repl = NamedSharding(self.mesh, P())
        self.ds = jax.tree.map(lambda a: jax.device_put(a, repl), ds)
        self.st = st
        scene_cfg = self.base.scene
        sampler = self.base.sampler
        cam = scene_cfg.camera
        cfg = self.cfg
        isect, isect_p = pick_traversal(st)

        @partial(jax.jit, out_shardings=repl, donate_argnums=(0,))
        def step(film, sample_idx, px_b, py_b, valid_b):
            jx, jy = sampler.camera_jitter(px_b, py_b, sample_idx)
            p_raster = jnp.stack([px_b.astype(jnp.float32) + jx,
                                  py_b.astype(jnp.float32) + jy], -1)
            ul1 = sampler.dim(px_b, py_b, sample_idx, 2)
            ul2 = sampler.dim(px_b, py_b, sample_idx, 3)
            o, d = generate_rays(cam.type, self.ds.raster_to_camera,
                                 self.ds.cam_to_world, p_raster,
                                 jnp.stack([ul1, ul2], -1),
                                 cam.lens_radius, cam.focal_distance,
                                 cfg.xres, cfg.yres)
            L, aov = path_li(self.ds, st, sampler,
                             scene_cfg.integrator.max_depth,
                             scene_cfg.integrator.rr_threshold,
                             px_b, py_b, sample_idx, o, d,
                             isect=isect, isect_p=isect_p)
            bad = ~jnp.isfinite(L).all(-1) | (jnp.min(L, -1) < 0.0)
            L = jnp.where(bad[..., None], 0.0, L)
            return filmmod.add_samples(film, cfg, p_raster, L, aov,
                                       mask=valid_b)

        self._step = step

    def render(self, spp: int = None, verbose: bool = False):
        spp = spp or self.base.scene.sampler.spp
        repl = NamedSharding(self.mesh, P())
        film = jax.tree.map(
            lambda a: jax.device_put(a, repl),
            filmmod.new_film(self.cfg.xres, self.cfg.yres))
        for s in range(spp):
            film = self._step(film, jnp.uint32(s), self.px, self.py, self.valid)
            if verbose:
                print(f"  sample {s + 1}/{spp}", flush=True)
        return film

    def image(self, film):
        return np.asarray(filmmod.to_image(film, self.cfg))


def train_step_fn(scene, mesh: Mesh, target):
    """A full differentiable-render training step sharded over the mesh:
    forward render of the ray shard -> L2 loss against the target image ->
    reverse-mode gradients w.r.t. material Kd and light radiance ->
    psum over devices (the reference has no analog — this is the
    differentiable-path-tracer north star, BASELINE.json).

    Returns (step_fn, init_params, (px, py, valid) sharded inputs)."""
    from tpupt.integrators.path import Renderer

    axis = mesh.axis_names[0]
    base = Renderer(scene)
    ds, st = base.ds, base.st
    sampler = base.sampler
    cam = scene.camera
    cfg = base.cfg
    isect, isect_p = pick_traversal(st)
    n_dev = mesh.size

    npix = int(base.px.shape[0])
    per = -(-npix // n_dev)
    pad = per * n_dev - npix
    shard = NamedSharding(mesh, P(axis))
    px = jax.device_put(jnp.concatenate([base.px, jnp.zeros(pad, jnp.int32)]), shard)
    py = jax.device_put(jnp.concatenate([base.py, jnp.zeros(pad, jnp.int32)]), shard)
    valid = jax.device_put(
        jnp.concatenate([base.valid[:npix], jnp.zeros(pad, bool)]), shard)
    repl = NamedSharding(mesh, P())
    ds = jax.tree.map(lambda a: jax.device_put(a, repl), ds)
    target = jax.device_put(jnp.asarray(target), repl)

    # every parameter table the shading chain differentiates through:
    # diffuse/specular albedo, roughness, light radiance, the environment
    # map texels, and the texture atlas (per-texel gradients)
    params0 = {"mat_kd": ds.mat_kd, "mat_ks": ds.mat_ks,
               "mat_roughness": ds.mat_roughness, "light_L": ds.light_L,
               "env_map": ds.env_map, "tex_atlas": ds.tex_atlas}

    def render_L(params, sample_idx, px_b, py_b, valid_b):
        ds2 = ds._replace(**params)
        jx, jy = sampler.camera_jitter(px_b, py_b, sample_idx)
        p_raster = jnp.stack([px_b.astype(jnp.float32) + jx,
                              py_b.astype(jnp.float32) + jy], -1)
        o, d = generate_rays(cam.type, ds2.raster_to_camera, ds2.cam_to_world,
                             p_raster, jnp.zeros((px_b.shape[0], 2)),
                             cam.lens_radius, cam.focal_distance,
                             cfg.xres, cfg.yres)
        L, _ = path_li(ds2, st, sampler, scene.integrator.max_depth,
                       scene.integrator.rr_threshold,
                       px_b, py_b, sample_idx, o, d,
                       isect=isect, isect_p=isect_p)
        pid = py_b * cfg.xres + px_b
        tgt = target.reshape(-1, 3)[pid]
        err = jnp.where(valid_b[:, None], L - tgt, 0.0)
        return jnp.sum(err * err) / jnp.maximum(jnp.sum(valid_b), 1)

    @partial(jax.jit, donate_argnums=())
    def step(params, sample_idx, px_b, py_b, valid_b, lr):
        loss, grads = jax.value_and_grad(render_L)(
            params, sample_idx, px_b, py_b, valid_b)
        # psum across the mesh happens implicitly: inputs are sharded, the
        # scalar loss/grad reduction inserts the cross-device collectives
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return loss, new_params

    return step, params0, (px, py, valid)
