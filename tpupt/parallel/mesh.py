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


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None):
    """Multi-host wiring (the reference's ssh farm, run_distributed.sh,
    becomes one jax.distributed job): call BEFORE any other jax use on every
    host; afterwards jax.devices() spans the pod slice and the same
    make_mesh()/ShardedRenderer code scales across hosts over ICI/DCN.
    No-args form reads the cluster env (TPU pod metadata / SLURM)."""
    import jax as _jax

    if coordinator is None and num_processes is None:
        _jax.distributed.initialize()
    else:
        _jax.distributed.initialize(coordinator_address=coordinator,
                                    num_processes=num_processes,
                                    process_id=process_id)
    return _jax.process_index(), _jax.process_count()


class ShardedRenderer:
    """Data-parallel renderer: rays sharded over the mesh, scene replicated,
    per-device films reduced by the XLA-inserted collectives.

    This re-jits the base Renderer's OWN step with mesh shardings, so it
    carries the full single-chip feature matrix — every integrator
    (including bdpt's t==1 light-path splats), crop windows, sample
    clamping, AOVs — not a reduced path-only pipeline."""

    def __init__(self, scene, mesh: Optional[Mesh] = None,
                 light_strategy: str = None, base=None):
        from tpupt.integrators.path import Renderer

        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.base = base if base is not None else Renderer(
            scene, light_strategy=light_strategy)
        self.cfg = self.base.cfg
        self.st = self.base.st
        n_dev = self.mesh.size
        # pad the wavefront to a mesh-divisible batch instead of rejecting
        # awkward device counts (a 3-host or 6-chip pod must just work):
        # padded lanes carry valid=False, so the film scatter masks them
        self.batch = -(-self.base.batch // n_dev) * n_dev
        base_n = int(self.base.px.shape[0])
        self.n_batches = -(-base_n // self.batch)
        pad = self.n_batches * self.batch - base_n
        px_h = jnp.concatenate([self.base.px,
                                jnp.zeros(pad, self.base.px.dtype)])
        py_h = jnp.concatenate([self.base.py,
                                jnp.zeros(pad, self.base.py.dtype)])
        valid_h = jnp.concatenate([self.base.valid, jnp.zeros(pad, bool)])

        shard = NamedSharding(self.mesh, P(self.axis))
        repl = NamedSharding(self.mesh, P())
        self.px = jax.device_put(px_h, shard)
        self.py = jax.device_put(py_h, shard)
        self.valid = jax.device_put(valid_h, shard)
        self.ds = jax.tree.map(lambda a: jax.device_put(a, repl),
                               self.base.ds)
        self._step = jax.jit(self.base._step_py, out_shardings=repl,
                             donate_argnums=(1,))

    def render(self, spp: int = None, verbose: bool = False):
        spp = spp or self.base.scene.sampler.spp
        self._spp_rendered = spp
        repl = NamedSharding(self.mesh, P())
        film = jax.tree.map(
            lambda a: jax.device_put(a, repl),
            filmmod.new_film(self.cfg.xres, self.cfg.yres))
        for s in range(spp):
            for k in range(self.n_batches):
                sl = slice(k * self.batch, (k + 1) * self.batch)
                film = self._step(self.ds, film, jnp.uint32(s),
                                  self.px[sl], self.py[sl], self.valid[sl])
            if verbose:
                print(f"  sample {s + 1}/{spp}", flush=True)
        return film

    def image(self, film):
        # splat normalization matches Renderer.image (film.cpp:153)
        scale = 1.0 / max(getattr(self, "_spp_rendered", 0), 1)
        return np.asarray(filmmod.to_image(film, self.cfg, scale))


def scaling_curve(scene, device_counts=None, spp: int = 2):
    """Scaling-efficiency harness (BASELINE: >= 85% at 1 chip -> 1 host ->
    2+ hosts): renders the scene on growing submeshes and reports rays/s
    per device count plus efficiency vs the single-device baseline.
    Returns a list of {n_devices, rays_per_s, efficiency} dicts."""
    import time

    devs = jax.devices()
    if device_counts is None:
        device_counts = []
        c = 1
        while c <= len(devs):
            device_counts.append(c)
            c *= 2
    out = []
    npix = scene.film.xres * scene.film.yres
    for c in device_counts:
        sr = ShardedRenderer(scene, make_mesh(devs[:c]))
        sr.render(spp=1)  # compile + warm
        t0 = time.time()
        film = sr.render(spp=spp)
        jax.block_until_ready(film.rgb)
        dt = (time.time() - t0) / spp
        rps = npix / dt
        base = out[0]["rays_per_s"] if out else rps
        out.append({"n_devices": c, "rays_per_s": round(rps, 1),
                    "efficiency": round(rps / (base * c), 4)})
    return out


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
    # map texels, the texture atlas (per-texel gradients), and the camera
    # matrices (raster->camera + camera->world: pixel positions and ray
    # directions are differentiable w.r.t. both; traversal stays detached
    # — the detached-sampling estimator of SURVEY.md §7 step 7)
    params0 = {"mat_kd": ds.mat_kd, "mat_ks": ds.mat_ks,
               "mat_roughness": ds.mat_roughness, "light_L": ds.light_L,
               "env_map": ds.env_map, "tex_atlas": ds.tex_atlas,
               "raster_to_camera": ds.raster_to_camera,
               "cam_to_world": ds.cam_to_world}

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
