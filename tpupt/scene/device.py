"""DeviceScene: the FlatScene + BVH uploaded as one jnp pytree.

This is the tensor bundle every kernel takes; static ints (table sizes,
max leaf size) live on the side in `SceneStatics` and are closed over by
jitted functions (they determine trace-time shapes/loop bounds)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpupt.accel.bvh import BVHArrays, build_bvh, scene_prim_bounds
from tpupt.scene.flatten import FlatScene


class DeviceScene(NamedTuple):
    # triangles
    tri_p0: jnp.ndarray
    tri_p1: jnp.ndarray
    tri_p2: jnp.ndarray
    tri_n0: jnp.ndarray
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_mat: jnp.ndarray
    tri_light: jnp.ndarray
    # spheres
    sph_o2w: jnp.ndarray
    sph_w2o: jnp.ndarray
    sph_radius: jnp.ndarray
    sph_zmin: jnp.ndarray
    sph_zmax: jnp.ndarray
    sph_phimax: jnp.ndarray
    sph_mat: jnp.ndarray
    sph_light: jnp.ndarray
    sph_reverse: jnp.ndarray
    # bvh
    bvh_lo: jnp.ndarray
    bvh_hi: jnp.ndarray
    bvh_right: jnp.ndarray
    bvh_first: jnp.ndarray
    bvh_count: jnp.ndarray
    bvh_axis: jnp.ndarray
    bvh_prim_ids: jnp.ndarray
    # materials
    mat_type: jnp.ndarray
    mat_kd: jnp.ndarray
    mat_ks: jnp.ndarray
    mat_kr: jnp.ndarray
    mat_kt: jnp.ndarray
    mat_roughness: jnp.ndarray
    mat_urough: jnp.ndarray
    mat_vrough: jnp.ndarray
    mat_eta: jnp.ndarray
    mat_k: jnp.ndarray
    mat_sigma: jnp.ndarray
    mat_remap: jnp.ndarray
    # lights
    light_type: jnp.ndarray
    light_L: jnp.ndarray
    light_pos: jnp.ndarray
    light_dir: jnp.ndarray
    light_prim: jnp.ndarray
    light_nsamples: jnp.ndarray
    light_twosided: jnp.ndarray
    light_cos_total: jnp.ndarray
    light_cos_falloff: jnp.ndarray
    light_pdf: jnp.ndarray  # discrete choice pmf per light (uniform or power)
    # camera
    cam_to_world: jnp.ndarray
    raster_to_camera: jnp.ndarray
    # world bounds
    world_lo: jnp.ndarray
    world_hi: jnp.ndarray


class SceneStatics(NamedTuple):
    n_tris: int
    n_spheres: int
    n_lights: int
    max_leaf: int
    n_nodes: int


def _pad1(a: np.ndarray, fill=0):
    """Ensure at least one row so device gathers with clamped indices work."""
    if len(a) > 0:
        return a
    shape = (1,) + a.shape[1:]
    return np.full(shape, fill, a.dtype)


def upload(scene: FlatScene, bvh: BVHArrays = None,
           light_strategy: str = "uniform"):
    """Build (DeviceScene, SceneStatics) from a flattened scene."""
    if bvh is None:
        lo, hi = scene_prim_bounds(scene)
        params = scene.accelerator_params
        bvh = build_bvh(
            lo, hi,
            max_leaf_prims=params.find_one_int("maxnodeprims", 4) if params else 4,
            isect_cost=params.find_one_float("intersectcost", 8.0) if params else 8.0,
            traversal_cost=params.find_one_float("traversalcost", 1.0) if params else 1.0,
        )
    t, s, m, lt = scene.triangles, scene.spheres, scene.materials, scene.lights
    wlo, whi = scene.world_bounds()

    n_lights = lt.count
    if light_strategy == "power" and n_lights > 0:
        power = np.maximum(lt.L.sum(-1), 1e-12)
        light_pdf = power / power.sum()
    else:
        light_pdf = np.full(max(n_lights, 1), 1.0 / max(n_lights, 1), np.float32)

    eye = np.eye(4, dtype=np.float32)[None]
    ds = DeviceScene(
        tri_p0=jnp.asarray(_pad1(t.p0)), tri_p1=jnp.asarray(_pad1(t.p1)),
        tri_p2=jnp.asarray(_pad1(t.p2)), tri_n0=jnp.asarray(_pad1(t.n0)),
        tri_n1=jnp.asarray(_pad1(t.n1)), tri_n2=jnp.asarray(_pad1(t.n2)),
        tri_uv0=jnp.asarray(_pad1(t.uv0)), tri_uv1=jnp.asarray(_pad1(t.uv1)),
        tri_uv2=jnp.asarray(_pad1(t.uv2)),
        tri_mat=jnp.asarray(_pad1(t.mat)), tri_light=jnp.asarray(_pad1(t.light, -1)),
        sph_o2w=jnp.asarray(s.o2w if s.count else eye),
        sph_w2o=jnp.asarray(s.w2o if s.count else eye),
        sph_radius=jnp.asarray(_pad1(s.radius, 1)),
        sph_zmin=jnp.asarray(_pad1(s.zmin, -1)),
        sph_zmax=jnp.asarray(_pad1(s.zmax, 1)),
        sph_phimax=jnp.asarray(_pad1(s.phimax, 2 * np.pi)),
        sph_mat=jnp.asarray(_pad1(s.mat)), sph_light=jnp.asarray(_pad1(s.light, -1)),
        sph_reverse=jnp.asarray(_pad1(s.reverse)),
        bvh_lo=jnp.asarray(bvh.lo), bvh_hi=jnp.asarray(bvh.hi),
        bvh_right=jnp.asarray(bvh.right), bvh_first=jnp.asarray(bvh.first),
        bvh_count=jnp.asarray(bvh.count), bvh_axis=jnp.asarray(bvh.axis),
        bvh_prim_ids=jnp.asarray(_pad1(bvh.prim_ids)),
        mat_type=jnp.asarray(m.type), mat_kd=jnp.asarray(m.kd),
        mat_ks=jnp.asarray(m.ks), mat_kr=jnp.asarray(m.kr),
        mat_kt=jnp.asarray(m.kt), mat_roughness=jnp.asarray(m.roughness),
        mat_urough=jnp.asarray(m.urough), mat_vrough=jnp.asarray(m.vrough),
        mat_eta=jnp.asarray(m.eta), mat_k=jnp.asarray(m.k),
        mat_sigma=jnp.asarray(m.sigma), mat_remap=jnp.asarray(m.remap_roughness),
        light_type=jnp.asarray(_pad1(lt.type)),
        light_L=jnp.asarray(_pad1(lt.L)),
        light_pos=jnp.asarray(_pad1(lt.pos)),
        light_dir=jnp.asarray(_pad1(lt.dir, 1)),
        light_prim=jnp.asarray(_pad1(lt.prim, -1)),
        light_nsamples=jnp.asarray(_pad1(lt.nsamples, 1)),
        light_twosided=jnp.asarray(_pad1(lt.twosided)),
        light_cos_total=jnp.asarray(_pad1(lt.cos_total)),
        light_cos_falloff=jnp.asarray(_pad1(lt.cos_falloff)),
        light_pdf=jnp.asarray(light_pdf.astype(np.float32)),
        cam_to_world=jnp.asarray(scene.camera.cam_to_world),
        raster_to_camera=jnp.asarray(scene.camera.raster_to_camera),
        world_lo=jnp.asarray(wlo), world_hi=jnp.asarray(whi),
    )
    statics = SceneStatics(
        n_tris=t.count, n_spheres=s.count, n_lights=n_lights,
        max_leaf=int(bvh.count.max()) if bvh.n_nodes else 1,
        n_nodes=bvh.n_nodes,
    )
    return ds, statics
