"""DeviceScene: the FlatScene + BVH uploaded as one jnp pytree.

This is the tensor bundle every kernel takes; static ints (table sizes,
max leaf size) live on the side in `SceneStatics` and are closed over by
jitted functions (they determine trace-time shapes/loop bounds)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpupt.accel.bvh import BVHArrays, build_bvh, scene_prim_bounds
from tpupt.scene.flatten import (MAT_DISNEY, MAT_FOURIER, MAT_HAIR,
                                 MAT_KDSUBSURFACE, MAT_MIX, MAT_SUBSURFACE,
                                 FlatScene)


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
    sph_kind: jnp.ndarray  # (S,) i32 quadric kind (shapes/quadric.py)
    sph_q1: jnp.ndarray    # (S,) f32 kind-specific scalar
    sph_q2: jnp.ndarray
    # wide BVH (packed rows — the hot traversal path)
    wide_nodes: jnp.ndarray  # (Nw, 64) f32
    prim_rows: jnp.ndarray   # (P, 32) f32: tri verts or sphere w2o+params
    # pallas packet-kernel variants of the same tables
    wide_nodes_tiled: jnp.ndarray  # (Nw, 8, 8) f32
    prim_rows_padded: jnp.ndarray  # (P+8, 32) f32
    # binary bvh (reference/fallback path)
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
    mat_extra: jnp.ndarray
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
    light_w2l: jnp.ndarray  # (L,3,3) world->light rotations (gonio/projection)
    light_img_off: jnp.ndarray  # (L,) i32 into light_img, -1 = none
    light_img_w: jnp.ndarray
    light_img_h: jnp.ndarray
    light_img: jnp.ndarray  # angular/projection map atlas (P,3)
    # spatial light distribution (lightdistrib.h:100 SpatialLightDistribution):
    # per-voxel light-choice cdf over a G^3 grid of the world bounds
    light_grid_cdf: jnp.ndarray  # (G^3, L) or (1,1) when disabled
    # textures (flat tables + atlas; textures/textures.py)
    tex_type: jnp.ndarray
    tex_v1: jnp.ndarray
    tex_v2: jnp.ndarray
    tex_uvscale: jnp.ndarray
    tex_f1: jnp.ndarray
    tex_f2: jnp.ndarray
    tex_img_off: jnp.ndarray
    tex_img_w: jnp.ndarray
    tex_img_h: jnp.ndarray
    tex_atlas: jnp.ndarray
    mat_kd_tex: jnp.ndarray
    mat_ks_tex: jnp.ndarray
    # environment map (equirect) + 2D importance distribution
    env_map: jnp.ndarray        # (H*W, 3) flat radiance (1 texel if none)
    env_w2l: jnp.ndarray        # (3,3)
    env_cond_func: jnp.ndarray  # Distribution2D tables
    env_cond_cdf: jnp.ndarray
    env_cond_integral: jnp.ndarray
    env_marg_func: jnp.ndarray
    env_marg_cdf: jnp.ndarray
    env_marg_integral: jnp.ndarray
    # camera
    cam_to_world: jnp.ndarray
    raster_to_camera: jnp.ndarray
    # world bounds
    world_lo: jnp.ndarray
    world_hi: jnp.ndarray
    # mip pyramid tables (textures/textures.py; trilinear lookup)
    tex_mip_off: jnp.ndarray = None  # (T,16) per-level atlas offsets
    tex_mips: jnp.ndarray = None     # (T,) level counts
    tex_w2t: jnp.ndarray = None      # (T,4,4) world->texture (3D checker)
    # shared Fourier BSDF table (materials/fourier.py; dummies when absent)
    four_mu: jnp.ndarray = None
    four_a: jnp.ndarray = None
    four_m: jnp.ndarray = None
    four_aoff: jnp.ndarray = None
    four_cdf: jnp.ndarray = None  # (n_mu*n_mu,) marginal cdf (sampling)
    # two-level HBM-streamed traversal tables (accel/treelets.py); 1-row
    # dummies for scenes that fit the single-level VMEM budget
    top_tiles: jnp.ndarray = None   # (Ntop, 8, 8) f32, VMEM-resident top tree
    tl_nodes: jnp.ndarray = None    # (NT*TN, 64) f32, streamed node blocks
    tl_prims: jnp.ndarray = None    # (NT*TP, 32) f32, streamed prim blocks
    # ptex per-face tables (textures/ptex.py; 1-row dummies when absent)
    tex_ptex_off: jnp.ndarray = None  # (F,) atlas offset per face
    tex_ptex_w: jnp.ndarray = None    # (F,)
    tex_ptex_h: jnp.ndarray = None    # (F,)
    tri_face: jnp.ndarray = None      # (T,) i32 faceIndex per triangle
    # per-interface media (media/media.py MediaTable; medium.h parity)
    med_sigma_a: jnp.ndarray = None   # (M,3)
    med_sigma_s: jnp.ndarray = None   # (M,3)
    med_g: jnp.ndarray = None         # (M,)
    med_majorant: jnp.ndarray = None  # (M,)
    med_is_grid: jnp.ndarray = None   # (M,) bool
    med_density: jnp.ndarray = None   # flat grid-texel atlas
    med_dens_off: jnp.ndarray = None  # (M,) i32
    med_dens_dims: jnp.ndarray = None  # (M,3) i32
    med_w2m: jnp.ndarray = None       # (M,4,4)
    prim_med_in: jnp.ndarray = None   # (P,) i32 global prim order, -1 vacuum
    prim_med_out: jnp.ndarray = None  # (P,) i32
    # vertex-lerp motion blur (Triangles.dp*; transform.cpp:1144 parity):
    # 1-row dummies for static scenes (st.has_motion gates the gathers out)
    tri_dp0: jnp.ndarray = None       # (T,3)
    tri_dp1: jnp.ndarray = None
    tri_dp2: jnp.ndarray = None
    prim_rows_dt: jnp.ndarray = None  # (P,9) leaf-order vertex deltas
    cam_q: jnp.ndarray = None         # (2,4) camera rotation keys (quat)
    cam_tr: jnp.ndarray = None        # (2,3) camera translation keys
    # thesis kd/RBSP/BSP accelerator tables (accel/kdbsp.py). These MUST be
    # jit arguments, not closure constants: closure-captured tables are
    # baked into the HLO as literals, and lowering a ~30 MB literal takes
    # minutes on the TPU backend (the round-3 "kdtree crash" was the bench
    # watchdog killing that lowering). None for BVH scenes.
    alt_flags: jnp.ndarray = None     # (K,) i32 node flags
    alt_split: jnp.ndarray = None     # (K,) f32 split offsets
    alt_above: jnp.ndarray = None     # (K,) i32 above-child / prim offset
    alt_nprims: jnp.ndarray = None    # (K,) i32 leaf prim counts
    alt_prim_rows: jnp.ndarray = None  # (P,32) f32 leaf-order packed prims
    alt_ndir: jnp.ndarray = None      # (K,3) per-node split dirs (BSP only)
    alt_dirs: jnp.ndarray = None      # (D,3) shared direction table
    alt_pack: jnp.ndarray = None      # (K/128,8,128) dense node tiles (Pallas)
    # tabulated beam-diffusion BSSRDF (bssrdf.cpp:145): per-material row
    # [sigma_t(3) | rho_eff(3) | profile 3x64 | inverse-cdf 3x64] in the
    # shared unitless radius grid (materials/bssrdf_table.py)
    sss_pack: jnp.ndarray = None      # (M, 390) f32


class SceneStatics(NamedTuple):
    n_tris: int
    n_spheres: int
    n_lights: int
    max_leaf: int
    n_nodes: int
    n_wide_nodes: int
    env_w: int = 0
    env_h: int = 0
    env_light_id: int = -1
    has_textures: bool = False
    # static set of expensive material families present in the scene
    # ("disney" / "hair" / "mix") — gates their lobes out of the compiled
    # BSDF dispatch for scenes that don't use them
    mat_features: frozenset = frozenset()
    spatial_lights: bool = False  # light_grid_cdf is a real G^3 grid
    has_light_imgs: bool = False  # gonio/projection maps present
    fourier: object = None        # static table metadata dict or None
    # two-level streamed traversal (accel/treelets.py)
    two_level: bool = False
    n_treelets: int = 0
    tl_tn: int = 0
    tl_tp: int = 0
    # per-interface media (medium.h MediumInterface parity)
    n_media: int = 0
    camera_medium: int = -1
    any_grid_media: bool = False
    has_med_interfaces: bool = False
    # per-ray-time motion blur (vertex-lerp; AnimatedTransform parity)
    has_motion: bool = False
    cam_animated: bool = False
    shutter_open: float = 0.0
    shutter_close: float = 1.0
    # tabulated beam-diffusion BSSRDF tables present (bssrdf.cpp:145)
    has_bssrdf_table: bool = False
    # spectral transport (spectrum.h:50 PBRT_SAMPLED_SPECTRUM analog):
    # 3 = RGB transport; 60 = full sampled-spectrum transport — colors are
    # uplifted to 60-bin SPDs where they enter the throughput chain and the
    # path carries spectral beta/L, converted to RGB at the film
    n_channels: int = 3


def pack_prim_rows(scene: FlatScene, prim_ids: np.ndarray) -> np.ndarray:
    """One 32-float row per prim IN BVH-LEAF ORDER (prim_ids permutation),
    so the traversal loop needs exactly one row gather per prim test and
    per-leaf prim loads are contiguous. Layout:
      floats 0-8  : triangle p0 p1 p2        (triangles)
      floats 0-11 : w2o upper 3x4            (spheres)
      slot 12/13/14/15 : radius zmin zmax phimax (spheres)
      slot 16 (i32): global prim id (bitcast)    [both]
      slot 17 (i32): 1 = triangle, 0 = sphere    [both]
      rest pad."""
    t, s = scene.triangles, scene.spheres
    prim_ids = np.asarray(prim_ids, np.int64)
    n = len(prim_ids)
    rows = np.zeros((max(n, 1), 32), np.float32)
    iview = rows.view(np.int32)
    tri_mask = prim_ids < t.count
    tid = prim_ids[tri_mask]
    if tid.size:
        rows[tri_mask, 0:3] = t.p0[tid]
        rows[tri_mask, 3:6] = t.p1[tid]
        rows[tri_mask, 6:9] = t.p2[tid]
    sph_mask = ~tri_mask
    sid = prim_ids[sph_mask] - t.count
    if sid.size:
        rows[sph_mask, 0:12] = s.w2o[sid][:, :3, :].reshape(len(sid), 12)
        rows[sph_mask, 12] = s.radius[sid]
        rows[sph_mask, 13] = s.zmin[sid]
        rows[sph_mask, 14] = s.zmax[sid]
        rows[sph_mask, 15] = s.phimax[sid]
        kind = (s.kind[sid] if s.kind is not None
                else np.zeros(len(sid), np.int32))
        rows[sph_mask, 20] = kind.astype(np.float32)
        rows[sph_mask, 21] = (s.q1[sid] if s.q1 is not None
                              else 0.0)
        rows[sph_mask, 22] = (s.q2[sid] if s.q2 is not None
                              else 0.0)
        rows[sph_mask, 23] = np.sin(s.phimax[sid])
        rows[sph_mask, 24] = np.cos(s.phimax[sid])
    iview[:n, 16] = prim_ids.astype(np.int32)
    iview[:n, 17] = tri_mask.astype(np.int32)
    # float-encoded copies for the pallas kernel (scalar bitcast unsupported)
    rows[:n, 18] = prim_ids.astype(np.float32)
    rows[:n, 19] = tri_mask.astype(np.float32)
    return rows


def pack_prim_row_deltas(scene: FlatScene, prim_ids: np.ndarray) -> np.ndarray:
    """Leaf-order vertex motion deltas matching pack_prim_rows: (P,9) with
    triangle dp0 dp1 dp2 (zeros for spheres/static prims). Gathered next to
    prim_rows when st.has_motion so the wide traversal lerps vertices at the
    ray's shutter time."""
    t = scene.triangles
    prim_ids = np.asarray(prim_ids, np.int64)
    n = len(prim_ids)
    rows = np.zeros((max(n, 1), 9), np.float32)
    tri_mask = prim_ids < t.count
    tid = prim_ids[tri_mask]
    if tid.size and t.dp0 is not None:
        rows[tri_mask, 0:3] = t.dp0[tid]
        rows[tri_mask, 3:6] = t.dp1[tid]
        rows[tri_mask, 6:9] = t.dp2[tid]
    return rows


def _pad1(a: np.ndarray, fill=0):
    """Ensure at least one row so device gathers with clamped indices work."""
    if len(a) > 0:
        return a
    shape = (1,) + a.shape[1:]
    return np.full(shape, fill, a.dtype)


def nodes_to_tiles(wn: np.ndarray) -> np.ndarray:
    """(Nw,64) wide rows -> (Nw,8,8) tiles with FLOAT-encoded metadata
    (Mosaic cannot bitcast scalars): col6 > 0 interior child id; col6 < 0
    leaf with count = -col6 and first = col7; col6 == 0 empty."""
    out = np.zeros((wn.shape[0], 8, 8), np.float32)
    meta = wn[:, 48:56].view(np.int32)
    for c in range(8):
        out[:, c, 0:6] = wn[:, c * 6 : c * 6 + 6]
        m = meta[:, c]
        is_int = m >= 0
        is_empty = m == -2**31
        v = np.where(is_int | is_empty, 0, -m - 1)
        out[:, c, 6] = np.where(is_empty, 0.0,
                                np.where(is_int, m.astype(np.float32),
                                         -(v & 63).astype(np.float32)))
        out[:, c, 7] = (v >> 6).astype(np.float32)
    return out


SPATIAL_GRID_RES = 16


def _spatial_light_grid(scene: FlatScene, lt, wlo, whi):
    """Voxelized light-choice distributions (SpatialLightDistribution,
    lightdistrib.cpp:100-180 re-architected for TPU: instead of a lazily
    filled hash table, a dense G^3 grid of per-voxel cdfs is precomputed at
    upload — each voxel weights every light by an unoccluded contribution
    estimate at the voxel center, like the reference's sampled estimate)."""
    from tpupt.scene.flatten import (LIGHT_AREA, LIGHT_DISTANT,
                                     LIGHT_INFINITE, LIGHT_POINT,
                                     LIGHT_SPOT)

    g = SPATIAL_GRID_RES
    ax = [np.linspace(wlo[a], whi[a], g, endpoint=False)
          + (whi[a] - wlo[a]) / (2 * g) for a in range(3)]
    cx, cy, cz = np.meshgrid(*ax, indexing="ij")
    centers = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], -1)  # (V,3)
    diag2 = float(np.sum((whi - wlo) ** 2)) / (g * g)

    lum = 0.2126 * lt.L[:, 0] + 0.7152 * lt.L[:, 1] + 0.0722 * lt.L[:, 2]
    weights = np.zeros((len(centers), lt.count), np.float64)
    t, s = scene.triangles, scene.spheres
    for li in range(lt.count):
        typ = int(lt.type[li])
        if typ in (LIGHT_POINT, LIGHT_SPOT) or typ > LIGHT_SPOT:
            d2 = np.sum((centers - lt.pos[li]) ** 2, -1)
            w = lum[li] / np.maximum(d2, diag2)
            if typ == LIGHT_SPOT:  # cone culling at the voxel center
                to_c = centers - lt.pos[li]
                to_c /= np.maximum(np.linalg.norm(to_c, axis=-1,
                                                  keepdims=True), 1e-12)
                w = w * (to_c @ lt.dir[li] > lt.cos_total[li] - 0.2)
        elif typ in (LIGHT_DISTANT, LIGHT_INFINITE):
            w = np.full(len(centers), lum[li] * np.pi)
        elif typ == LIGHT_AREA:
            prim = int(lt.prim[li])
            if prim < t.count:
                c = (t.p0[prim] + t.p1[prim] + t.p2[prim]) / 3.0
                area = 0.5 * np.linalg.norm(
                    np.cross(t.p1[prim] - t.p0[prim], t.p2[prim] - t.p0[prim]))
            else:
                sid = prim - t.count
                c = s.o2w[sid][:3, 3]
                area = 4 * np.pi * s.radius[sid] ** 2
            d2 = np.sum((centers - c) ** 2, -1)
            w = lum[li] * area / np.maximum(d2, diag2)
        else:
            w = np.full(len(centers), lum[li])
        weights[:, li] = np.maximum(w, 0.0)
    tot = weights.sum(-1, keepdims=True)
    # all-zero voxels fall back to uniform (reference does the same)
    pmf = np.where(tot > 0, weights / np.maximum(tot, 1e-300),
                   1.0 / lt.count)
    return np.cumsum(pmf, -1).astype(np.float32)


def upload(scene: FlatScene, bvh: BVHArrays = None,
           light_strategy: str = "uniform", two_level: bool = None,
           treelet_budget: tuple = None, spectral: bool = False):
    """Build (DeviceScene, SceneStatics) from a flattened scene.

    two_level: force the two-level streamed traversal tables on/off
    (default: automatic — built exactly when the single-level node+prim
    tables exceed the Pallas VMEM budget). treelet_budget=(tn, tp)
    overrides the per-treelet node/prim row capacities (tests use tiny
    budgets to exercise multi-treelet paths on small scenes)."""
    if bvh is None:
        lo, hi = scene_prim_bounds(scene)
        params = scene.accelerator_params
        max_leaf = params.find_one_int("maxnodeprims", 4) if params else 4
        icost = params.find_one_float("intersectcost", 8.0) if params else 8.0
        tcost = params.find_one_float("traversalcost", 1.0) if params else 1.0
        split = (params.find_one_string("splitmethod", "sah")
                 if params else "sah").lower()
        if split in ("middle", "equal", "equalcounts") and len(lo):
            # research comparators (bvhOld.h:58-65 Middle/EqualCounts)
            from tpupt.accel.bvh import build_bvh_split

            bvh = build_bvh_split(
                lo, hi, "middle" if split == "middle" else "equalcounts",
                max_leaf)
        # exact sweep-SAH in native code (bvh.cpp parity) for moderate scene
        # sizes; vectorized LBVH above that (sweep is O(n log^2 n) serial)
        elif 0 < len(lo) <= 400_000:
            try:
                from tpupt.native import build_bvh_sah

                bvh = build_bvh_sah(lo, hi, icost, tcost, max_leaf)
            except Exception:
                bvh = build_bvh(lo, hi, max_leaf, icost, tcost)
        else:
            bvh = build_bvh(lo, hi, max_leaf, icost, tcost)
    t, s, m, lt = scene.triangles, scene.spheres, scene.materials, scene.lights
    wlo, whi = scene.world_bounds()

    from tpupt.accel.bvh import collapse_to_wide

    wide_nodes, _ = collapse_to_wide(bvh)
    prim_rows = pack_prim_rows(scene, bvh.prim_ids)

    # vertex-lerp motion blur tables (dummies for static scenes)
    has_motion = scene.triangles.has_motion
    prim_rows_dt = (pack_prim_row_deltas(scene, bvh.prim_ids) if has_motion
                    else np.zeros((1, 9), np.float32))
    cam = scene.camera
    cam_animated = getattr(cam, "cam_to_world_end", None) is not None
    if cam_animated:
        from tpupt.core.transforms import decompose

        t0_, q0_, _ = decompose(np.asarray(cam.cam_to_world, np.float64))
        t1_, q1_, _ = decompose(np.asarray(cam.cam_to_world_end, np.float64))
        if np.dot(q0_, q1_) < 0.0:
            q1_ = -q1_
        cam_q = np.stack([q0_, q1_]).astype(np.float32)
        cam_tr = np.stack([t0_, t1_]).astype(np.float32)
    else:
        cam_q = np.array([[1, 0, 0, 0], [1, 0, 0, 0]], np.float32)  # (w,x,y,z)
        cam_tr = np.zeros((2, 3), np.float32)

    # two-level streamed traversal: built when the single-level VMEM budget
    # fails (or forced for tests); the single-level tiled duplicates then
    # shrink to dummies (the streamed tables replace them)
    from tpupt.accel import treelets as _tl
    from tpupt.ops.traverse_pallas import vmem_budget_ok

    if two_level is None:
        two_level = not vmem_budget_ok(len(wide_nodes), len(prim_rows))
    if two_level:
        # streamed-treelet economics differ from the VMEM-resident kernel:
        # fatter leaves mean fewer nodes per treelet DMA and fewer pops
        # per drained treelet walk, so keep the r4 leaf size here (the
        # single-level kernel measured faster at leaf_merge=4)
        wide_nodes, _ = collapse_to_wide(bvh, leaf_merge=8)
    tla = None
    if two_level:
        tn, tp = treelet_budget or (_tl.TREELET_NODES, _tl.TREELET_PRIMS)
        tla = _tl.build_treelets(wide_nodes, prim_rows, tn, tp)

    # per-interface media table (MediaTable; dummies when no media)
    from tpupt.media.media import build_media_table

    mtab, any_grid = build_media_table(scene)
    n_prims = scene.prim_count
    med_in = np.full(max(n_prims, 1), -1, np.int32)
    med_out = np.full(max(n_prims, 1), -1, np.int32)
    if scene.triangles.count and scene.triangles.med_in is not None:
        med_in[: scene.triangles.count] = scene.triangles.med_in
        med_out[: scene.triangles.count] = scene.triangles.med_out
    if scene.spheres.count and scene.spheres.med_in is not None:
        med_in[scene.triangles.count: n_prims] = scene.spheres.med_in
        med_out[scene.triangles.count: n_prims] = scene.spheres.med_out
    has_ifaces = bool((med_in != med_out).any())

    n_lights = lt.count
    if light_strategy == "power" and n_lights > 0:
        power = np.maximum(lt.L.sum(-1), 1e-12)
        light_pdf = power / power.sum()
    else:
        light_pdf = np.full(max(n_lights, 1), 1.0 / max(n_lights, 1), np.float32)

    light_grid_cdf = np.zeros((1, 1), np.float32)
    if light_strategy == "spatial" and 0 < n_lights <= 256:
        light_grid_cdf = _spatial_light_grid(scene, lt, wlo, whi)

    ft = scene.fourier_table

    eye = np.eye(4, dtype=np.float32)[None]
    ds = DeviceScene(
        tri_p0=jnp.asarray(_pad1(t.p0)), tri_p1=jnp.asarray(_pad1(t.p1)),
        tri_p2=jnp.asarray(_pad1(t.p2)), tri_n0=jnp.asarray(_pad1(t.n0)),
        tri_n1=jnp.asarray(_pad1(t.n1)), tri_n2=jnp.asarray(_pad1(t.n2)),
        tri_uv0=jnp.asarray(_pad1(t.uv0)), tri_uv1=jnp.asarray(_pad1(t.uv1)),
        tri_uv2=jnp.asarray(_pad1(t.uv2)),
        tri_mat=jnp.asarray(_pad1(t.mat)), tri_light=jnp.asarray(_pad1(t.light, -1)),
        tri_face=jnp.asarray(_pad1(
            t.face if t.face is not None else np.zeros(t.count, np.int32))),
        sph_o2w=jnp.asarray(s.o2w if s.count else eye),
        sph_w2o=jnp.asarray(s.w2o if s.count else eye),
        sph_radius=jnp.asarray(_pad1(s.radius, 1)),
        sph_zmin=jnp.asarray(_pad1(s.zmin, -1)),
        sph_zmax=jnp.asarray(_pad1(s.zmax, 1)),
        sph_phimax=jnp.asarray(_pad1(s.phimax, 2 * np.pi)),
        sph_mat=jnp.asarray(_pad1(s.mat)), sph_light=jnp.asarray(_pad1(s.light, -1)),
        sph_reverse=jnp.asarray(_pad1(s.reverse)),
        sph_kind=jnp.asarray(_pad1(
            s.kind if s.kind is not None else np.zeros(s.count, np.int32))),
        sph_q1=jnp.asarray(_pad1(
            s.q1 if s.q1 is not None else np.zeros(s.count, np.float32))),
        sph_q2=jnp.asarray(_pad1(
            s.q2 if s.q2 is not None else np.zeros(s.count, np.float32))),
        wide_nodes=jnp.asarray(wide_nodes),
        prim_rows=jnp.asarray(prim_rows),
        wide_nodes_tiled=jnp.asarray(
            nodes_to_tiles(wide_nodes) if not two_level
            else np.zeros((1, 8, 8), np.float32)),
        prim_rows_padded=jnp.asarray(
            np.concatenate([prim_rows, np.zeros((8, 32), np.float32)])
            if not two_level else np.zeros((1, 32), np.float32)),
        top_tiles=jnp.asarray(tla.top_tiles if tla
                              else np.zeros((1, 8, 8), np.float32)),
        tl_nodes=jnp.asarray(tla.tl_nodes if tla
                             else np.zeros((1, 128), np.float32)),
        tl_prims=jnp.asarray(tla.tl_prims if tla
                             else np.zeros((1, 128), np.float32)),
        med_sigma_a=(mtab.sigma_a if mtab
                     else jnp.zeros((1, 3))),
        med_sigma_s=(mtab.sigma_s if mtab
                     else jnp.zeros((1, 3))),
        med_g=mtab.g if mtab else jnp.zeros(1),
        med_majorant=mtab.majorant if mtab else jnp.ones(1),
        med_is_grid=(mtab.is_grid if mtab
                     else jnp.zeros(1, bool)),
        med_density=mtab.density if mtab else jnp.ones(1),
        med_dens_off=(mtab.dens_off if mtab
                      else jnp.zeros(1, jnp.int32)),
        med_dens_dims=(mtab.dens_dims if mtab
                       else jnp.ones((1, 3), jnp.int32)),
        med_w2m=mtab.w2m if mtab else jnp.eye(4)[None],
        prim_med_in=jnp.asarray(med_in),
        prim_med_out=jnp.asarray(med_out),
        tri_dp0=jnp.asarray(_pad1(t.dp0) if t.dp0 is not None
                            else np.zeros((1, 3), np.float32)),
        tri_dp1=jnp.asarray(_pad1(t.dp1) if t.dp1 is not None
                            else np.zeros((1, 3), np.float32)),
        tri_dp2=jnp.asarray(_pad1(t.dp2) if t.dp2 is not None
                            else np.zeros((1, 3), np.float32)),
        prim_rows_dt=jnp.asarray(prim_rows_dt),
        cam_q=jnp.asarray(cam_q),
        cam_tr=jnp.asarray(cam_tr),
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
        mat_extra=jnp.asarray(m.extra),
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
        light_w2l=jnp.asarray(_pad1(lt.w2l.reshape(-1, 9)).reshape(-1, 3, 3)),
        light_img_off=jnp.asarray(_pad1(lt.img_off, -1)),
        light_img_w=jnp.asarray(_pad1(lt.img_w)),
        light_img_h=jnp.asarray(_pad1(lt.img_h)),
        light_img=jnp.asarray(lt.img),
        light_grid_cdf=jnp.asarray(light_grid_cdf),
        four_mu=jnp.asarray(ft["mu"] if ft else np.zeros(1, np.float32)),
        four_a=jnp.asarray(ft["a"] if ft else np.zeros(1, np.float32)),
        four_m=jnp.asarray(ft["m"] if ft else np.zeros(1, np.int32)),
        four_cdf=jnp.asarray(ft.get("cdf", np.zeros(1, np.float32))
                             if ft else np.zeros(1, np.float32)),
        four_aoff=jnp.asarray(ft["aoffset"] if ft
                              else np.zeros(1, np.int32)),
        **_texture_fields(scene, m),
        **_env_fields(scene),
        cam_to_world=jnp.asarray(scene.camera.cam_to_world),
        raster_to_camera=jnp.asarray(scene.camera.raster_to_camera),
        world_lo=jnp.asarray(wlo), world_hi=jnp.asarray(whi),
    )
    env_h, env_w = ((scene.env_map.shape[0], scene.env_map.shape[1])
                    if scene.env_map is not None else (0, 0))
    # wide-leaf prim counts (leaf-merged fat leaves; collapse_to_wide)
    metas = wide_nodes[:, 48:56].view(np.int32)
    leaf_metas = metas[(metas < 0) & (metas != -2**31)]
    wide_max_leaf = (int(((-leaf_metas - 1) & 63).max())
                     if leaf_metas.size else 1)
    sss_pack = _sss_pack_rows(m)
    statics = SceneStatics(
        n_tris=t.count, n_spheres=s.count, n_lights=n_lights,
        max_leaf=max(wide_max_leaf, 1),
        n_nodes=bvh.n_nodes,
        n_wide_nodes=len(wide_nodes),
        env_w=env_w, env_h=env_h, env_light_id=scene.env_light_id,
        has_textures=bool(
            (m.kd_tex >= 0).any() or (m.ks_tex >= 0).any()),
        mat_features=frozenset(
            name for name, tid in (("disney", MAT_DISNEY),
                                   ("hair", MAT_HAIR), ("mix", MAT_MIX),
                                   ("sss", MAT_SUBSURFACE),
                                   ("sss", MAT_KDSUBSURFACE),
                                   ("fourier", MAT_FOURIER))
            if (m.type == tid).any()),
        spatial_lights=light_grid_cdf.shape[0] > 1,
        has_light_imgs=bool((lt.img_off >= 0).any()),
        fourier=(dict(m_max=ft["m_max"], n_mu=ft["n_mu"],
                      n_channels=ft["n_channels"], eta=ft["eta"])
                 if ft else None),
        two_level=two_level,
        n_treelets=tla.n_treelets if tla else 0,
        tl_tn=tla.tn if tla else 0,
        tl_tp=tla.tp if tla else 0,
        n_media=len(scene.media_order or []),
        camera_medium=scene.camera_medium,
        any_grid_media=any_grid,
        has_med_interfaces=has_ifaces,
        has_motion=has_motion,
        cam_animated=cam_animated,
        shutter_open=float(cam.shutter_open),
        shutter_close=float(cam.shutter_close),
        n_channels=60 if spectral else 3,
        has_bssrdf_table=sss_pack is not None,
    )
    if sss_pack is not None:
        ds = ds._replace(sss_pack=jnp.asarray(sss_pack))
    return ds, statics


def _texture_fields(scene: FlatScene, m) -> dict:
    tx = scene.textures or {}
    defaults = dict(
        tex_type=np.zeros(1, np.int32),
        tex_v1=np.full((1, 3), 0.5, np.float32),
        tex_v2=np.zeros((1, 3), np.float32),
        tex_uvscale=np.ones((1, 2), np.float32),
        tex_f1=np.zeros(1, np.float32), tex_f2=np.zeros(1, np.float32),
        tex_img_off=np.zeros(1, np.int32), tex_img_w=np.zeros(1, np.int32),
        tex_img_h=np.zeros(1, np.int32),
        tex_mip_off=np.zeros((1, 16), np.int32),
        tex_mips=np.ones(1, np.int32),
        tex_atlas=np.full((1, 3), 0.5, np.float32),
        tex_w2t=np.eye(4, dtype=np.float32)[None],
        tex_ptex_off=np.zeros(1, np.int32),
        tex_ptex_w=np.ones(1, np.int32),
        tex_ptex_h=np.ones(1, np.int32),
    )
    out = {k: jnp.asarray(tx.get(k, v)) for k, v in defaults.items()}
    out["mat_kd_tex"] = jnp.asarray(m.kd_tex)
    out["mat_ks_tex"] = jnp.asarray(m.ks_tex)
    return out


def _env_fields(scene: FlatScene) -> dict:
    from tpupt.core.sampling import Distribution2D

    if scene.env_map is None:
        z = jnp.zeros(1)
        return dict(env_map=jnp.zeros((1, 3)), env_w2l=jnp.eye(3),
                    env_cond_func=jnp.zeros((1, 1)),
                    env_cond_cdf=jnp.zeros((1, 2)), env_cond_integral=z,
                    env_marg_func=z, env_marg_cdf=jnp.zeros(2),
                    env_marg_integral=jnp.zeros(()))
    img = scene.env_map
    h, w = img.shape[:2]
    # luminance * sin(theta) importance (lights/infinite.cpp:65)
    lum = img @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    theta = (np.arange(h) + 0.5) / h * np.pi
    func = lum * np.sin(theta)[:, None]
    d2 = Distribution2D.build(jnp.asarray(func))
    return dict(
        env_map=jnp.asarray(img.reshape(-1, 3)),
        env_w2l=jnp.asarray(scene.env_w2l if scene.env_w2l is not None
                            else np.eye(3, dtype=np.float32)),
        env_cond_func=d2.cond_func, env_cond_cdf=d2.cond_cdf,
        env_cond_integral=d2.cond_integral,
        env_marg_func=d2.marg_func, env_marg_cdf=d2.marg_cdf,
        env_marg_integral=d2.marg_integral,
    )


def _sss_pack_rows(m) -> "np.ndarray | None":
    """Per-material tabulated-BSSRDF rows (None when the scene has no
    subsurface materials). Row layout (390 f32): sigma_t (3) | rho_eff
    (3) | per-channel profile P_c over the shared 64-point optical radius
    grid (3x64) | per-channel inverse radial cdf r_opt(u) at 64 uniform
    u nodes (3x64). P_c = 2 pi r_opt Sr_1(r_opt) at sigma_t = 1
    (ComputeBeamDiffusionBSSRDF; materials/bssrdf_table.py)."""
    is_sss = (m.type == MAT_SUBSURFACE) | (m.type == MAT_KDSUBSURFACE)
    if not is_sss.any():
        return None
    from tpupt.materials.bssrdf_table import compute_beam_diffusion_table

    n_m = len(m.type)
    pack = np.zeros((n_m, 390), np.float32)
    u_nodes = np.linspace(0.0, 1.0, 64)
    for mi in np.nonzero(is_sss)[0]:
        tab = compute_beam_diffusion_table(float(m.eta[mi, 0]))
        sig_t = np.maximum(m.extra[mi, 3:6], 1e-6)
        alpha = np.clip(m.extra[mi, 6:9], 0.0, float(tab.rho[-1]))
        pack[mi, 0:3] = sig_t
        pack[mi, 3:6] = np.interp(alpha, tab.rho, tab.rho_eff)
        for c in range(3):
            # interpolate the profile/cdf rows to this channel's albedo
            k = np.searchsorted(tab.rho, alpha[c])
            k = np.clip(k, 1, len(tab.rho) - 1)
            w = ((alpha[c] - tab.rho[k - 1])
                 / max(tab.rho[k] - tab.rho[k - 1], 1e-12))
            prof = (1 - w) * tab.profile[k - 1] + w * tab.profile[k]
            cdf = (1 - w) * tab.cdf[k - 1] + w * tab.cdf[k]
            cdf = np.maximum.accumulate(cdf)
            pack[mi, 6 + 64 * c: 6 + 64 * (c + 1)] = prof
            # piecewise-linear inverse cdf at uniform u nodes
            inv = np.interp(u_nodes, cdf, tab.radius)
            pack[mi, 198 + 64 * c: 198 + 64 * (c + 1)] = inv
    return pack
