"""Wavefront path integrator with NEE + MIS + Russian roulette.

Counterpart of PathIntegrator::Li (integrators/path.cpp:64-204) and
EstimateDirect (core/integrator.cpp:109-217), inverted for TPU: instead of a
per-ray bounce recursion, the whole camera-ray batch advances through the
bounce loop together with a live mask (the reference's unbounded `for
(bounces)` with RR, path.cpp:82, becomes a statically unrolled vertex loop —
each vertex's sampler dimensions are static, exactly like the reference's
deterministic dimension consumption).

Per vertex: intersect -> (MIS-weighted) emitted light -> NEE light sample +
shadow ray -> BSDF sample -> throughput update -> RR. Per-ray traversal
counters accumulate into film AOVs (GeneralStats parity, SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.accel import traverse as trav
from tpupt.core import rng as rngm
from tpupt.ops import traverse_pallas
from tpupt.cameras.perspective import generate_rays
from tpupt.core.sampling import power_heuristic
from tpupt.core.vecmath import absdot, cross, dot, normalize, offset_ray_origin
from tpupt.film import film as filmmod
from tpupt.lights.lights import (emitted_radiance, pdf_li, sample_li)
from tpupt.materials import bsdf as bx
from tpupt.samplers.samplers import WavefrontSampler
from tpupt.scene.device import DeviceScene, SceneStatics, upload
from tpupt.scene.flatten import LIGHT_INFINITE, FlatScene
from tpupt.shapes.quadric import quadric_normal_uv
from tpupt.shapes.sphere import transform_normal

_RR_START = 3  # bounces before RR kicks in (path.cpp:193)
# Fixed wavefront batch (128 pallas packets of 1024 rays). Bigger batches
# measured SLOWER on-device (495k-ray steps ran 2.2x the per-ray time of
# 131k steps); host dispatch overhead (~0.3 s/call through the PJRT
# tunnel) is instead amortized by scanning over batches inside one jit
# call per sample (Renderer._spp_fn)
BATCH_RAYS = 131072


class ShadingPoint(NamedTuple):
    p: jnp.ndarray       # (N,3)
    ns: jnp.ndarray      # shading normal
    ng: jnp.ndarray      # geometric normal
    uv: jnp.ndarray      # (N,2)
    mat: jnp.ndarray     # (N,) i32
    light: jnp.ndarray   # (N,) i32 area-light id or -1
    face: jnp.ndarray    # (N,) i32 ptex faceIndex (interaction.h:156)


def tri_shade_table(ds):
    """Packed per-triangle shading rows (T, 27): p0 p1 p2 n0 n1 n2 (18) |
    uv0 uv1 uv2 (6) | mat light face as bitcast i32 (3).

    TPU gathers are latency-bound PER ROW (~4.5 ms per 131k random rows),
    so one packed row gather replaces the 12 per-field gathers that used
    to dominate shading time. The concat itself is a cheap streaming copy
    and is loop-invariant (CSE/hoisted across bounces); building it
    in-trace keeps gradients flowing into the original tables."""
    ints = jnp.stack([ds.tri_mat, ds.tri_light, ds.tri_face],
                     axis=1).astype(jnp.int32)
    return jnp.concatenate(
        [ds.tri_p0, ds.tri_p1, ds.tri_p2, ds.tri_n0, ds.tri_n1, ds.tri_n2,
         ds.tri_uv0, ds.tri_uv1, ds.tri_uv2,
         jax.lax.bitcast_convert_type(ints, jnp.float32)], axis=1)


def sph_shade_table(ds):
    """Packed per-quadric shading rows (S, 23): w2o 3x4 row-major (12) |
    kind radius zmin zmax phimax q1 q2 (7, kind as bitcast i32) |
    reverse mat light (3, bitcast i32) | pad."""
    kind = jax.lax.bitcast_convert_type(
        ds.sph_kind.astype(jnp.int32), jnp.float32)[:, None]
    ints = jnp.stack([ds.sph_reverse.astype(jnp.int32),
                      ds.sph_mat.astype(jnp.int32),
                      ds.sph_light.astype(jnp.int32)], axis=1)
    return jnp.concatenate(
        [ds.sph_w2o[:, :3, :].reshape(-1, 12), kind,
         ds.sph_radius[:, None], ds.sph_zmin[:, None],
         ds.sph_zmax[:, None], ds.sph_phimax[:, None],
         ds.sph_q1[:, None], ds.sph_q2[:, None],
         jax.lax.bitcast_convert_type(ints, jnp.float32)], axis=1)


def shading_point(ds: DeviceScene, st: SceneStatics, hit, o, d) -> ShadingPoint:
    """SurfaceInteraction assembly (core/interaction.cpp:94 analog).
    Miss lanes get a finite dummy position (inf primals poison reverse-mode
    even under masks — NaN partials survive as NaN*0)."""
    t_finite = jnp.where(hit.valid, hit.t, 1.0)
    p = o + t_finite[..., None] * d
    prim = jnp.maximum(hit.prim, 0)
    is_tri = prim < st.n_tris

    tid = jnp.clip(prim, 0, max(st.n_tris - 1, 0))
    b1 = hit.b1
    b2 = hit.b2
    b0 = 1.0 - b1 - b2
    row = tri_shade_table(ds)[tid]  # ONE row gather for all tri fields
    t_p0, t_p1, t_p2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    t_n0, t_n1, t_n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
    t_uv0, t_uv1, t_uv2 = row[:, 18:20], row[:, 20:22], row[:, 22:24]
    t_ints = jax.lax.bitcast_convert_type(row[:, 24:27], jnp.int32)
    ns_t = normalize(b0[..., None] * t_n0 + b1[..., None] * t_n1
                     + b2[..., None] * t_n2)
    ng_t = normalize(cross(t_p1 - t_p0, t_p2 - t_p0))
    # keep ng on the same side as ns (triangle.cpp:414 orients ng to ns)
    ng_t = jnp.where(dot(ng_t, ns_t)[..., None] < 0.0, -ng_t, ng_t)
    uv_t = (b0[..., None] * t_uv0 + b1[..., None] * t_uv1
            + b2[..., None] * t_uv2)
    mat_t = t_ints[:, 0]
    light_t = t_ints[:, 1]

    sid = jnp.clip(prim - st.n_tris, 0, max(st.n_spheres - 1, 0))
    srow = sph_shade_table(ds)[sid]  # ONE row gather for quadric fields
    # row layout: 0-11 w2o | 12 kind | 13 radius | 14 zmin | 15 zmax |
    # 16 phimax | 17 q1 | 18 q2 | 19 reverse | 20 mat | 21 light
    s_w2o = srow[:, 0:12].reshape(-1, 3, 4)
    s_kind = jax.lax.bitcast_convert_type(srow[:, 12], jnp.int32)
    s_ints = jax.lax.bitcast_convert_type(srow[:, 19:22], jnp.int32)
    n_obj, u_s, v_s = quadric_normal_uv(
        hit.p_obj, s_kind, srow[:, 13], srow[:, 14],
        srow[:, 15], srow[:, 16], srow[:, 17], srow[:, 18])
    ns_s = transform_normal(s_w2o, n_obj)
    ns_s = jnp.where((s_ints[:, 0] != 0)[..., None], -ns_s, ns_s)
    uv_s = jnp.stack([u_s, v_s], -1)
    mat_s = s_ints[:, 1]
    light_s = s_ints[:, 2]

    sel = is_tri[..., None]
    return ShadingPoint(
        p=p,
        ns=jnp.where(sel, ns_t, ns_s),
        ng=jnp.where(sel, ng_t, ns_s),
        uv=jnp.where(sel, uv_t, uv_s),
        mat=jnp.where(is_tri, mat_t, mat_s),
        light=jnp.where(is_tri, light_t, light_s),
        face=jnp.where(is_tri, t_ints[:, 2], 0),
    )


def _infinite_light_le(ds, st):
    """Constant-radiance sum of non-env infinite lights (the env-mapped
    light's L is baked into its map)."""
    if st.n_lights == 0:
        return jnp.zeros(3)
    is_inf = ds.light_type == LIGHT_INFINITE
    if st.env_light_id >= 0:
        idx = jnp.arange(ds.light_type.shape[0])
        is_inf = is_inf & (idx != st.env_light_id)
    return jnp.sum(jnp.where(is_inf[:, None], ds.light_L, 0.0), axis=0)


def miss_radiance_and_pdf(ds, st, d):
    """(Le, light-sampling pdf) for escaped rays: env-map radiance + any
    constant infinite lights; pdf for the MIS weight of the BSDF sample."""
    n = d.shape[0]
    le = jnp.broadcast_to(_infinite_light_le(ds, st), (n, 3))
    pdf = jnp.full(n, 1.0 / (4.0 * np.pi))
    if st.env_w > 0:
        from tpupt.lights.lights import env_pdf, env_radiance

        le = le + env_radiance(ds, st, d)
        pdf = env_pdf(ds, st, d)
    return le, pdf


def _expand_bits9(v):
    """Spread 9 bits to every 3rd position (uint32)."""
    v = v.astype(jnp.uint32)
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def ray_sort_keys(o, d, tmax, world_lo, world_hi, spatial: bool = False):
    """Coherence keys: dead bit (tmax == 0) | origin Morton (27 bits when
    `spatial`). Packet traversal efficiency is set by intra-packet
    coherence, so secondary bounces are re-sorted every traversal (the
    wavefront analog of the reference's tile decomposition); terminated
    lanes cluster into packets that exit on the root test.

    spatial=False (single-level VMEM kernel): the incoming PIXEL-TILE
    order is already origin-coherent and reordering HURTS (measured — it
    scatters tight origin clusters), so only the dead bit partitions.
    spatial=True (two-level streamed kernel): secondary bounces cluster by
    direction OCTANT, then origin Morton — packets become coherent ray
    tubes. Origin clustering alone does NOT help there (measured: ~81
    treelets/packet either way on the 1M museum): a packet with random
    directions crosses treelet bounds along every ray's whole path, and
    the front-to-back cull (skip treelets beyond the packet's worst
    current hit) never fires because someone always flies far. Same-octant
    tubes terminate at similar depths, so the cull prunes the tail."""
    dead = (tmax <= 0.0).astype(jnp.uint32)
    if not spatial:
        return dead
    octant = ((d[:, 0] < 0).astype(jnp.uint32) * 4
              + (d[:, 1] < 0).astype(jnp.uint32) * 2
              + (d[:, 2] < 0).astype(jnp.uint32))
    # NOTE: adding dominant-axis bits after the octant (to make packets
    # kz-uniform for the kernels' static-permutation leaf fast path) was
    # measured SLOWER end-to-end (1266 -> 1311 ms killeroo): splitting
    # direction classes ahead of the Morton bits fragments origin
    # clusters, and the extra node pops cost more than the collapsed
    # permutation where-chains save. Packets that happen to be kz-uniform
    # still take the fast leaf branch via the per-packet dispatch in
    # traverse_loop.
    ext = jnp.maximum(world_hi - world_lo, 1e-6)
    q = jnp.clip((o - world_lo) / ext * 511.0, 0.0, 511.0).astype(jnp.uint32)
    morton = (_expand_bits9(q[:, 0]) << jnp.uint32(2)) \
        | (_expand_bits9(q[:, 1]) << jnp.uint32(1)) | _expand_bits9(q[:, 2])
    return (dead << jnp.uint32(31)) | (octant << jnp.uint32(28)) | morton


def _permute_packed(arrays, perm):
    """Permute several same-length arrays with ONE row gather.

    TPU gathers are LATENCY-bound per row (~4.5 ms per 131k random rows
    on v5e, nearly independent of row width), so permuting k fields as k
    separate gathers costs k times more than concatenating them into one
    (N, c) matrix, gathering once, and slicing columns back out. Ints
    ride as bitcast f32 columns."""
    cols = []
    specs = []  # (ndim, dtype, width)
    for a in arrays:
        two_d = a.ndim == 2
        w = a.shape[1] if two_d else 1
        col = a if two_d else a[:, None]
        if col.dtype != jnp.float32:
            col = jax.lax.bitcast_convert_type(
                col.astype(jnp.int32), jnp.float32)
        cols.append(col)
        specs.append((two_d, a.dtype, w))
    packed = jnp.concatenate(cols, axis=1)[perm]
    out = []
    off = 0
    for two_d, dtype, w in specs:
        col = packed[:, off:off + w]
        off += w
        if dtype == jnp.bool_:
            col = jax.lax.bitcast_convert_type(col, jnp.int32) != 0
        elif dtype != jnp.float32:
            col = jax.lax.bitcast_convert_type(col, jnp.int32).astype(dtype)
        out.append(col if two_d else col[:, 0])
    return out


def make_sorted_isect(isect, isect_p, spatial=None):
    """Wrap traversal calls with coherence sorting + inverse scatter.
    spatial=None keys off st.two_level (historic default); True forces the
    octant+Morton keys — measured +23% whole-render on killeroo when
    applied to the single-level packet kernel's SECONDARY bounces (the
    hard image batches improve 25-31%; bounce-0 camera rays are already
    tile-coherent and sorting them only costs). Forward and inverse
    permutations are single packed row-gathers (see _permute_packed)."""

    def isect_sorted(ds, st, o, d, tmax, **kw):
        n = o.shape[0]
        sp = st.two_level if spatial is None else spatial
        perm = jnp.argsort(ray_sort_keys(o, d, tmax, ds.world_lo,
                                         ds.world_hi, spatial=sp))
        t_arr = kw.pop("time", None)
        if t_arr is not None:
            o2, d2, t2, time2 = _permute_packed([o, d, tmax, t_arr], perm)
            kw["time"] = time2
        else:
            o2, d2, t2 = _permute_packed([o, d, tmax], perm)
        hit, stats = isect(ds, st, o2, d2, t2, **kw)
        inv = jnp.zeros(n, jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32))
        h_leaves = jax.tree.leaves(hit)
        s_leaves = jax.tree.leaves(stats)
        un = _permute_packed(h_leaves + s_leaves, inv)
        hit = jax.tree.unflatten(jax.tree.structure(hit),
                                 un[: len(h_leaves)])
        stats = jax.tree.unflatten(jax.tree.structure(stats),
                                   un[len(h_leaves):])
        return hit, stats

    def isect_p_sorted(ds, st, o, d, tmax, **kw):
        n = o.shape[0]
        sp = st.two_level if spatial is None else spatial
        perm = jnp.argsort(ray_sort_keys(o, d, tmax, ds.world_lo,
                                         ds.world_hi, spatial=sp))
        t_arr = kw.pop("time", None)
        if t_arr is not None:
            o2, d2, t2, time2 = _permute_packed([o, d, tmax, t_arr], perm)
            kw["time"] = time2
        else:
            o2, d2, t2 = _permute_packed([o, d, tmax], perm)
        occ, stats = isect_p(ds, st, o2, d2, t2, **kw)
        inv = jnp.zeros(n, jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32))
        s_leaves = jax.tree.leaves(stats)
        un = _permute_packed([occ] + s_leaves, inv)
        stats = jax.tree.unflatten(jax.tree.structure(stats), un[1:])
        return un[0], stats

    return isect_sorted, isect_p_sorted


def pick_traversal(st: SceneStatics, force: str = None,
                   with_stats: bool = True):
    """Choose the intersection backend: the pallas packet kernel when the
    scene tables fit in VMEM, the two-level HBM-streamed pallas kernel when
    they don't but treelet tables were built (and we're on TPU), else the
    XLA wide-BVH path. with_stats=False compiles the GeneralStats counters
    out of the pallas hot loop (~10% traversal throughput on killeroo)."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_pallas = traverse_pallas.vmem_budget_ok(
        st.n_wide_nodes, st.n_tris + st.n_spheres) and not st.two_level
    use_stream = st.two_level
    if force == "pallas":
        use_pallas, use_stream = True, False
    elif force == "stream":
        use_pallas, use_stream = False, True
    elif force == "xla":
        use_pallas = use_stream = False
    elif not on_tpu:
        use_pallas = use_stream = False
    if getattr(st, "has_motion", False):
        # the pallas packet kernels intersect baked static rows; motion
        # scenes run the XLA wide path with per-ray vertex-lerp
        use_pallas = use_stream = False
    if use_pallas or use_stream:
        from tpupt.ops.traverse_stream import intersect_packets_streamed

        base = (intersect_packets_streamed if use_stream
                else traverse_pallas.intersect_packets)
        isect = partial(base, with_stats=with_stats)

        def isect_p(ds, st, o, d, tmax):
            hit, stats = base(ds, st, o, d, tmax, any_hit=True,
                              with_stats=with_stats)
            return hit.valid, stats

        if use_stream:
            # spatial+octant ray sort keeps each packet inside few
            # treelets (DMA locality). For the VMEM-resident single-level
            # kernel the sort costs more than the divergence it removes
            # (measured: +7 ms/call sort vs ~6 ms whole traversal)
            return make_sorted_isect(isect, isect_p)
        return isect, isect_p
    return trav.intersect_wide, trav.intersect_p


def path_li(ds: DeviceScene, st: SceneStatics, sampler: WavefrontSampler,
            max_depth: int, rr_threshold: float,
            px, py, sample_idx, o, d, isect=None, isect_p=None, time=None,
            unroll=False, remat=False, sort_secondary=False):
    if isect is None:
        isect, isect_p = pick_traversal(st)
    # coherence re-sort for the packet kernels: secondary-bounce rays and
    # NEE shadow rays come out scrambled in direction space, and a packet
    # pays the UNION of its lanes' node sets — octant+Morton sorting
    # restores coherent ray tubes (measured +23% on killeroo). Camera rays
    # keep their pixel-tile order (sorting them is pure overhead).
    if sort_secondary:
        isect_srt, isect_p_srt = make_sorted_isect(isect, isect_p,
                                                   spatial=True)
    else:
        isect_srt, isect_p_srt = isect, isect_p

    def _detach(a, k):
        # Detach the traversal INPUTS, not just its outputs: pallas_call's
        # jvp rule materializes a combined primal+tangent kernel (2x scoped
        # VMEM -> OOM on real chips under value_and_grad), so tangents must
        # never reach it. Inputs are (ds, st, o, d, tmax): st is static
        # metadata; everything array-valued gets stop_gradient.
        ds_ = jax.tree.map(jax.lax.stop_gradient, a[0])
        rest = tuple(jax.tree.map(jax.lax.stop_gradient, x) for x in a[2:])
        k = {kk: jax.tree.map(jax.lax.stop_gradient, vv)
             if kk == "time" else vv for kk, vv in k.items()}
        return (ds_, a[1]) + rest, k

    def intersect(*a, sorted_=False, **k):
        # Traversal is non-differentiable (integer hit ids; while_loop /
        # pallas have no reverse rule). Detached-geometry gradients: material
        # and light cotangents flow through the shading chain only
        # (SURVEY.md §7 step 7 — detached-sampling estimator).
        if time is not None:
            k.setdefault("time", time)
        a, k = _detach(a, k)
        hit, stats = (isect_srt if sorted_ else isect)(*a, **k)
        return jax.tree.map(jax.lax.stop_gradient, hit), stats

    def intersect_p(*a, sorted_=False, **k):
        if time is not None:
            k.setdefault("time", time)
        a, k = _detach(a, k)
        occ, stats = (isect_p_srt if sorted_ else isect_p)(*a, **k)
        return jax.lax.stop_gradient(occ), stats
    """Trace one batch of camera rays to completion.

    Vertex-count semantics match path.cpp: the bounce loop visits maxDepth
    NEE/scatter vertices plus one final emission-only vertex (path.cpp:82's
    `if (bounces >= maxDepth) break` sits after the emission block).

    The loop body is a single `lax.fori_loop` iteration (one compiled
    traversal + one shadow traversal, not per-bounce copies); per-bounce
    sampler dimensions are precomputed into (D, 7, N) tensors since LDS bases
    are static per dimension. Returns (L (N,3), aov (N,4))."""
    n = o.shape[0]

    # spectral transport (SampledSpectrum, spectrum.h:289): when the scene
    # statics ask for 60 channels, every color is uplifted to a 60-bin SPD
    # at the point it enters the throughput chain (RGB tables stay RGB —
    # the uplift matmul rides the MXU), beta/L are spectral, and L converts
    # to RGB after the bounce loop. C == 3 compiles the uplift away.
    n_chan = getattr(st, "n_channels", 3)
    if n_chan == 3:
        def spec(x):
            return x
    else:
        from tpupt.core.spectrum import rgb_to_spectrum as spec

    # precompute all per-bounce sample dimensions (static dim indices)
    dims = []
    for bounce in range(max_depth):
        base = 5 + bounce * 7
        dims.append(jnp.stack(
            [sampler.dim(px, py, sample_idx, base + k) for k in range(7)]))
    u_all = (jnp.stack(dims) if dims
             else jnp.zeros((1, 7, n)))  # (D, 7, N)

    inf_pmf = 1.0 / max(st.n_lights, 1)
    tmax_init = jnp.full(n, jnp.inf)
    light_cdf = jnp.cumsum(ds.light_pdf)

    def grid_cdf_row(p):
        """Per-point light-choice cdf row from the spatial voxel grid
        (SpatialLightDistribution::Lookup, lightdistrib.cpp:120)."""
        g = round(ds.light_grid_cdf.shape[0] ** (1.0 / 3.0))
        ext = jnp.maximum(ds.world_hi - ds.world_lo, 1e-6)
        v = jnp.clip(((p - ds.world_lo) / ext * g).astype(jnp.int32), 0, g - 1)
        flat = (v[..., 0] * g + v[..., 1]) * g + v[..., 2]
        return ds.light_grid_cdf[flat]  # (N, L)

    def pick_light(u, p):
        """(light id, pmf) under the active strategy."""
        if st.spatial_lights:
            row = grid_cdf_row(p)
            lid = jnp.clip(jnp.sum(u[..., None] > row, -1),
                           0, st.n_lights - 1).astype(jnp.int32)
            hi = jnp.take_along_axis(row, lid[..., None], -1)[..., 0]
            lo = jnp.where(lid > 0, jnp.take_along_axis(
                row, jnp.maximum(lid - 1, 0)[..., None], -1)[..., 0], 0.0)
            return lid, jnp.maximum(hi - lo, 1e-12)
        lid = jnp.clip(jnp.searchsorted(light_cdf, u, side="right"),
                       0, st.n_lights - 1).astype(jnp.int32)
        return lid, ds.light_pdf[lid]

    def light_pmf_at(p, lid):
        """pmf the strategy assigns to light lid from point p (for MIS)."""
        if st.spatial_lights:
            row = grid_cdf_row(p)
            hi = jnp.take_along_axis(row, lid[..., None], -1)[..., 0]
            lo = jnp.where(lid > 0, jnp.take_along_axis(
                row, jnp.maximum(lid - 1, 0)[..., None], -1)[..., 0], 0.0)
            return jnp.maximum(hi - lo, 1e-12)
        return ds.light_pdf[lid]

    class _S(NamedTuple):
        o: jnp.ndarray
        d: jnp.ndarray
        L: jnp.ndarray
        beta: jnp.ndarray
        alive: jnp.ndarray
        prev_specular: jnp.ndarray
        prev_pdf: jnp.ndarray
        prev_p: jnp.ndarray
        eta_scale: jnp.ndarray
        aov_nodes: jnp.ndarray
        aov_leaves: jnp.ndarray
        aov_tests: jnp.ndarray
        path_len: jnp.ndarray

    init = _S(o=o, d=d, L=jnp.zeros((n, n_chan)), beta=jnp.ones((n, n_chan)),
              alive=jnp.ones(n, bool), prev_specular=jnp.ones(n, bool),
              prev_pdf=jnp.ones(n), prev_p=o, eta_scale=jnp.ones(n),
              aov_nodes=jnp.zeros(n, jnp.int32),
              aov_leaves=jnp.zeros(n, jnp.int32),
              aov_tests=jnp.zeros(n, jnp.int32),
              path_len=jnp.zeros(n, jnp.int32))

    def body(bounce, s: _S):
        o, d = s.o, s.d
        L, beta, alive = s.L, s.beta, s.alive
        is_last = bounce >= max_depth  # emission-only final vertex
        # static under unroll: sort secondary-bounce rays only (camera
        # rays are tile-coherent); under fori the bounce is traced, so
        # sort_secondary sorts every bounce
        srt = sort_secondary and (not isinstance(bounce, int) or bounce > 0)

        hit, tstats = intersect(ds, st, o, d,
                                jnp.where(alive, tmax_init, 0.0),
                                sorted_=srt)
        aov_nodes = s.aov_nodes + jnp.where(alive, tstats.node_visits, 0)
        aov_leaves = s.aov_leaves + jnp.where(alive, tstats.leaf_visits, 0)
        aov_tests = s.aov_tests + jnp.where(alive, tstats.prim_tests, 0)
        path_len = s.path_len + alive.astype(jnp.int32)

        sp = shading_point(ds, st, hit, o, d)
        wo = -d

        # ---- emitted radiance at the hit (path.cpp:97-113) ----
        if st.n_lights > 0:
            le = emitted_radiance(ds, st, hit.prim, sp.light, wo, sp.ns)
            le = jnp.where((alive & hit.valid)[..., None], le, 0.0)
            # clamp inf miss-t BEFORE any differentiable expression — inf
            # primals make NaN partials that survive stop_gradient as NaN*0
            t_safe = jnp.where(hit.valid, hit.t, 1.0)
            lp = pdf_li(ds, st, s.prev_p, d, jnp.maximum(hit.prim, 0), t_safe)
            lp = jnp.where(hit.valid, lp, 0.0)
            lid0 = jnp.clip(sp.light, 0, max(st.n_lights - 1, 0))
            pmf0 = light_pmf_at(s.prev_p, lid0)
            w_bsdf = power_heuristic(1.0, s.prev_pdf, 1.0, lp * pmf0)
            w = jnp.where(s.prev_specular, 1.0, w_bsdf)
            L = L + beta * spec(le) * w[..., None]

            # miss -> infinite lights (path.cpp:100-107)
            miss = alive & ~hit.valid
            miss_le, miss_pdf = miss_radiance_and_pdf(ds, st, d)
            if st.spatial_lights and st.env_light_id >= 0:
                inf_pmf_r = light_pmf_at(
                    s.prev_p, jnp.full(n, st.env_light_id, jnp.int32))
            else:
                inf_pmf_r = inf_pmf
            w_inf = jnp.where(
                s.prev_specular, 1.0,
                power_heuristic(1.0, s.prev_pdf, 1.0, miss_pdf * inf_pmf_r))
            L = L + jnp.where(miss[..., None],
                              beta * spec(miss_le) * w_inf[..., None], 0.0)

        alive = alive & hit.valid & ~is_last

        # per-bounce sample dims (index clamped for the final vertex whose
        # shading results are masked out anyway)
        ub = u_all[jnp.minimum(bounce, max(max_depth - 1, 0))]

        # ---- material gather + local frame ----
        # ray-cone texture footprint for mip selection (the wavefront
        # stand-in for RayDifferential::ScaleDifferentials): pixel cone
        # angle x hit distance x the hit triangle's uv density
        tex_width = None
        tex_aniso = None
        if st.has_textures:
            pix_cone = jnp.linalg.norm(ds.raster_to_camera[:3, 1])
            prim0 = jnp.maximum(hit.prim, 0)
            tid0 = jnp.clip(prim0, 0, max(st.n_tris - 1, 0))
            e1 = ds.tri_p1[tid0] - ds.tri_p0[tid0]
            e2 = ds.tri_p2[tid0] - ds.tri_p0[tid0]
            w_area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
            du1 = ds.tri_uv1[tid0] - ds.tri_uv0[tid0]
            du2 = ds.tri_uv2[tid0] - ds.tri_uv0[tid0]
            uv_area = 0.5 * jnp.abs(du1[..., 0] * du2[..., 1]
                                    - du1[..., 1] * du2[..., 0])
            dens = jnp.sqrt(uv_area / jnp.maximum(w_area, 1e-12))
            dens = jnp.where(prim0 < st.n_tris, dens, 1.0)
            t_hit = jnp.where(hit.valid, hit.t, 1.0)
            tex_width = pix_cone * t_hit * dens

            # anisotropic footprint (mipmap.h EWA via ray cones): the pixel
            # cone hits the surface in an ellipse with minor diameter
            # cone*t and major diameter cone*t/|cos|; project the major
            # axis (the in-plane component of the view direction) onto the
            # triangle's uv parametrization. Eccentricity clamped to the
            # reference's MaxAnisotropy=8 (mipmap.h:180).
            cos_i = jnp.abs(dot(d, sp.ns))
            h = d - dot(d, sp.ns)[..., None] * sp.ns
            h_len = jnp.linalg.norm(h, axis=-1)
            h_unit = h / jnp.maximum(h_len, 1e-12)[..., None]
            major_w = pix_cone * t_hit / jnp.maximum(cos_i, 1.0 / 8.0)
            a = h_unit * major_w[..., None]
            # dpdu/dpdv from the uv deltas (triangle.cpp:87)
            det_uv = du1[..., 0] * du2[..., 1] - du1[..., 1] * du2[..., 0]
            inv_det = jnp.where(jnp.abs(det_uv) > 1e-12, 1.0 / det_uv, 0.0)
            dpdu = (du2[..., 1:2] * e1 - du1[..., 1:2] * e2) * inv_det[..., None]
            dpdv = (-du2[..., 0:1] * e1 + du1[..., 0:1] * e2) * inv_det[..., None]
            g11 = dot(dpdu, dpdu)
            g12 = dot(dpdu, dpdv)
            g22 = dot(dpdv, dpdv)
            det_g = g11 * g22 - g12 * g12
            b1_ = dot(a, dpdu)
            b2_ = dot(a, dpdv)
            ok_g = (jnp.abs(det_g) > 1e-18) & (prim0 < st.n_tris) \
                & (h_len > 1e-9)
            inv_g = jnp.where(ok_g, 1.0 / jnp.where(ok_g, det_g, 1.0), 0.0)
            du_ = (g22 * b1_ - g12 * b2_) * inv_g
            dv_ = (g11 * b2_ - g12 * b1_) * inv_g
            tex_aniso = jnp.where(ok_g[..., None],
                                  jnp.stack([du_, dv_], -1), 0.0)

        mp = bx.gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p, face=sp.face,
                                  has_textures=st.has_textures,
                                  has_mix="mix" in st.mat_features,
                                  fourier_meta=st.fourier,
                                  tex_width=tex_width,
                                  tex_aniso=tex_aniso)
        t_f, b_f, n_f = bx.make_frame(sp.ns)
        wo_l = bx.to_local(t_f, b_f, n_f, wo)

        # ---- NEE (UniformSampleOneLight, integrator.cpp:86) ----
        if st.n_lights > 0:
            lid, pmf = pick_light(ub[0], sp.p)
            ls = sample_li(ds, st, lid, sp.p, ub[1], ub[2])
            wi_l = bx.to_local(t_f, b_f, n_f, ls.wi)
            f_l, pdf_b = bx.eval_pdf(mp, wo_l, wi_l, st.mat_features)
            f_l = f_l * absdot(ls.wi, sp.ns)[..., None]
            can = alive & (ls.pdf > 0.0) & (jnp.max(f_l, -1) > 0.0)
            # shadow ray (VisibilityTester::Unoccluded, light.h:99)
            o_sh = offset_ray_origin(sp.p, sp.ng, ls.wi)
            occluded, sstats = intersect_p(
                ds, st, o_sh, ls.wi,
                jnp.where(can, ls.dist * 0.999, 0.0),
                sorted_=sort_secondary)
            aov_nodes += jnp.where(can, sstats.node_visits, 0)
            aov_tests += jnp.where(can, sstats.prim_tests, 0)
            # MIS weight over the effective light-strategy density
            # ls.pdf * pmf — the BSDF-hit side (below) weighs against
            # lp * pmf, so both strategies see the same density and the
            # pair sums to 1 (EstimateDirect, integrator.cpp:130)
            w_l = jnp.where(ls.is_delta, 1.0,
                            power_heuristic(1.0, ls.pdf * pmf, 1.0, pdf_b))
            # separate uplifts: the PRODUCT of the f and Li spectra is what
            # distinguishes spectral from RGB transport (metamer products)
            contrib = beta * spec(f_l) * spec(ls.li) * (
                w_l / jnp.maximum(ls.pdf * pmf, 1e-12))[..., None]
            L = L + jnp.where((can & ~occluded)[..., None], contrib, 0.0)

        # ---- BSDF sampling (path.cpp:144-160) ----
        bs = bx.sample(mp, wo_l, ub[3], ub[4], ub[5], st.mat_features)
        wi_w = bx.to_world(t_f, b_f, n_f, bs.wi)
        cos_w = absdot(wi_w, sp.ns)
        ok = bs.pdf > 1e-9
        thru = spec(bs.f) * (cos_w / jnp.maximum(bs.pdf, 1e-9))[..., None]
        spawn_p, spawn_ng = sp.p, sp.ng
        bs_specular, bs_pdf = bs.specular, bs.pdf

        if "sss" in st.mat_features:
            # BSSRDF: lanes that transmitted through a subsurface interface
            # resume the path at a Burley-sampled exit point with its own
            # NEE + Sw exit lobe (path.cpp:167-189; bssrdf.cpp Sample_S)
            from tpupt.materials.bssrdf import sss_exit, sw_lobe
            from tpupt.core.sampling import cosine_sample_hemisphere

            is_sss = ((mp.type == bx.MAT_SUBSURFACE)
                      | (mp.type == bx.MAT_KDSUBSURFACE))
            entered = (alive & ok & is_sss
                       & (bs.wi[..., 2] * wo_l[..., 2] < 0.0))
            key_sss = rngm.hash_combine(
                rngm.hash_combine(px.astype(jnp.uint32) * 7919
                                  + py.astype(jnp.uint32),
                                  jnp.uint32(sample_idx)),
                jnp.uint32(1000 + bounce))
            pe, ne, w_prof, c_norm, ok_sss = sss_exit(
                ds, st, isect, mp, sp, entered, key_sss)
            eta1 = mp.eta[..., 0]
            # throughput AT the exit vertex
            beta_exit = beta * thru * spec(w_prof)
            te, be_ = bx.coordinate_system(ne)

            # --- NEE at the exit vertex (UniformSampleOneLight) ---
            if st.n_lights > 0:
                u_n0 = rngm.uniform_float(key_sss, 110)
                lid_e, pmf_e = pick_light(u_n0, pe)
                ls_e = sample_li(ds, st, lid_e, pe,
                                 rngm.uniform_float(key_sss, 111),
                                 rngm.uniform_float(key_sss, 112))
                cos_e = dot(ls_e.wi, ne)
                f_sw = sw_lobe(eta1, c_norm, cos_e)
                can_e = (entered & ok_sss & (ls_e.pdf > 0.0)
                         & (cos_e > 1e-6))
                o_she = offset_ray_origin(pe, ne, ls_e.wi)
                occ_e, _ = intersect_p(
                    ds, st, o_she, ls_e.wi,
                    jnp.where(can_e, ls_e.dist * 0.997, 0.0))
                w_mis = jnp.where(ls_e.is_delta, 1.0, power_heuristic(
                    1.0, ls_e.pdf * pmf_e, 1.0,
                    jnp.maximum(cos_e, 0.0) / jnp.pi))
                contrib_e = beta_exit * (f_sw * cos_e * w_mis / jnp.maximum(
                    ls_e.pdf * pmf_e, 1e-12))[..., None] * spec(ls_e.li)
                L = L + jnp.where((can_e & ~occ_e)[..., None], contrib_e,
                                  0.0)

            # --- Sw exit continuation: cosine hemisphere at ne ---
            wi_le = cosine_sample_hemisphere(
                rngm.uniform_float(key_sss, 104),
                rngm.uniform_float(key_sss, 105))
            wi_sss = bx.to_world(te, be_, ne, wi_le)
            pdf_sss = jnp.maximum(wi_le[..., 2] / jnp.pi, 1e-9)
            f_cont = sw_lobe(eta1, c_norm, wi_le[..., 2])
            # thru at exit = w_prof * Sw * cos / pdf
            thru_sss = spec(w_prof) * (f_cont * wi_le[..., 2]
                                       / pdf_sss)[..., None]
            wi_w = jnp.where(entered[..., None], wi_sss, wi_w)
            thru = jnp.where(entered[..., None],
                             jnp.where(ok_sss[..., None], thru * thru_sss,
                                       0.0),
                             thru)
            spawn_p = jnp.where(entered[..., None], pe, spawn_p)
            spawn_ng = jnp.where(entered[..., None], ne, spawn_ng)
            bs_specular = jnp.where(entered, False, bs_specular)
            bs_pdf = jnp.where(entered, pdf_sss, bs_pdf)
            ok = ok & (~entered | ok_sss)

        beta = beta * jnp.where((ok & alive)[..., None], thru,
                                jnp.where(alive[..., None], 0.0, 1.0))
        alive = alive & ok & (jnp.max(beta, -1) > 0.0)
        eta_scale = s.eta_scale * jnp.where(alive, bs.eta_scale, 1.0)
        prev_specular = jnp.where(alive, bs_specular, s.prev_specular)
        prev_pdf = jnp.where(alive, jnp.maximum(bs_pdf, 1e-12), s.prev_pdf)
        prev_p = jnp.where(alive[..., None], spawn_p, s.prev_p)

        # ---- spawn next ray ----
        o = jnp.where(alive[..., None],
                      offset_ray_origin(spawn_p, spawn_ng, wi_w), o)
        d = jnp.where(alive[..., None], wi_w, d)

        # ---- russian roulette (path.cpp:193-199) ----
        rr_beta = jnp.max(beta * eta_scale[..., None], -1)
        q = jnp.maximum(0.05, 1.0 - rr_beta)
        do_rr = (bounce >= _RR_START) & (rr_beta < rr_threshold) & alive
        die = do_rr & (ub[6] < q)
        alive = alive & ~die
        denom = jnp.where(do_rr & ~die, jnp.maximum(1.0 - q, 1e-6), 1.0)
        beta = jnp.where(die[..., None], 0.0, beta / denom[..., None])

        return _S(o, d, L, beta, alive, prev_specular, prev_pdf, prev_p,
                  eta_scale, aov_nodes, aov_leaves, aov_tests, path_len)

    if unroll:
        # Python-unrolled bounce loop for reverse-mode AD: linearizing the
        # fori_loop wraps its body in a closed_call, inside which Mosaic
        # stack-allocates the pallas traversal's FULL operands in scoped
        # VMEM (~32 MB > the 16 MB limit on v5e). Straight-line code keeps
        # the pallas calls at jit top level where operands stream from HBM.
        # remat=True additionally rematerializes each bounce
        # (jax.checkpoint): the backward pass replays the bounce instead of
        # storing its shading intermediates — ~2x less memory, measured
        # ~1.8x slower on killeroo (the replay re-runs the traversal), so
        # it is opt-in for memory-constrained gradient runs
        out = init
        for bounce in range(max_depth + 1):
            fn = jax.checkpoint(partial(body, bounce)) if remat \
                else partial(body, bounce)
            out = fn(out)
    else:
        out = jax.lax.fori_loop(0, max_depth + 1, body, init)
    L_out = out.L
    if n_chan != 3:
        from tpupt.core.spectrum import sampled_to_rgb

        L_out = sampled_to_rgb(L_out)
    aov = jnp.stack([out.aov_nodes.astype(jnp.float32),
                     out.aov_leaves.astype(jnp.float32),
                     out.aov_tests.astype(jnp.float32),
                     out.path_len.astype(jnp.float32)], -1)
    return L_out, aov


def _enable_compile_cache():
    """Persistent XLA compilation cache — wavefront pipelines are large
    programs and TPU compiles are expensive; cache them across processes."""
    import os

    if jax.config.jax_compilation_cache_dir is None:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass


class Renderer:
    """SamplerIntegrator::Render counterpart (integrator.cpp:230): drives
    sample-indexed full-frame wavefronts and accumulates the film."""

    def __init__(self, scene: FlatScene, light_strategy: str = None,
                 collect_stats: bool = False, spectral: bool = False):
        """collect_stats compiles the per-ray GeneralStats counters into
        the pallas traversal (node/leaf/prim-test AOVs; ~10% slower) —
        the CLI turns it on for --stats/--writestats. The XLA fallback
        path always collects. spectral=True renders with full 60-bin
        sampled-spectrum transport (spectrum.h:289; path integrator)."""
        _enable_compile_cache()
        strategy = light_strategy or scene.integrator.light_strategy
        self.scene = scene
        _SPECTRAL = ("path", "volpath", "bdpt", "mlt", "directlighting",
                     "whitted", "ambientocclusion")
        if spectral and scene.integrator.name not in _SPECTRAL:
            import warnings

            warnings.warn("spectral transport covers the path/volpath/bdpt/"
                          f"mlt integrator families; {scene.integrator.name}"
                          " renders in RGB")
            spectral = False
        self.ds, self.st = upload(scene, light_strategy=strategy,
                                  spectral=spectral)
        self.sampler = WavefrontSampler(
            scene.sampler.name, scene.film.xres, scene.film.yres,
            scene.sampler.spp, scene.sampler.seed)
        self.cfg = scene.film
        cam = scene.camera
        xres, yres = self.cfg.xres, self.cfg.yres

        px, py = np.meshgrid(np.arange(xres, dtype=np.int32),
                             np.arange(yres, dtype=np.int32), indexing="xy")
        # crop window (pbrt.cpp:94, film.cpp GetSampleBounds)
        cx0, cx1, cy0, cy1 = self.cfg.crop
        mask = ((px >= cx0 * xres) & (px < max(cx1 * xres, cx0 * xres + 1))
                & (py >= cy0 * yres) & (py < max(cy1 * yres, cy0 * yres + 1)))
        pxf = px.ravel()[mask.ravel()]
        pyf = py.ravel()[mask.ravel()]
        # order pixels in 32x32 tiles so each 1024-ray packet of the pallas
        # traversal is a coherent screen tile (cf. the reference's 16x16
        # tiles, integrator.cpp:237) — film scatter is order-independent
        tile_key = ((pyf // 32).astype(np.int64) * ((xres + 31) // 32)
                    + pxf // 32) * 1024 + (pyf % 32) * 32 + pxf % 32
        order = np.argsort(tile_key)
        pxf, pyf = pxf[order], pyf[order]
        # fixed-size wavefront batches: ONE compiled step serves every
        # resolution / spp (the batch shape is the only traced shape)
        self.batch = min(BATCH_RAYS, 1 << int(np.ceil(np.log2(max(len(pxf), 1024)))))
        npad = (-len(pxf)) % self.batch
        valid = np.ones(len(pxf) + npad, bool)
        if npad:
            valid[len(pxf):] = False
            pxf = np.concatenate([pxf, np.zeros(npad, np.int32)])
            pyf = np.concatenate([pyf, np.zeros(npad, np.int32)])
        self.px = jnp.asarray(pxf)
        self.py = jnp.asarray(pyf)
        self.valid = jnp.asarray(valid)
        self.n_batches = len(pxf) // self.batch

        accel = (scene.accelerator_name or "bvh").lower()
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # packet kernels on TPU: unroll the bounce loop (straight-line
        # pallas calls stream operands from HBM; the fori wrapper stages
        # them in scoped VMEM and measured ~10% slower) and re-sort
        # secondary rays for packet coherence (+23% measured; the
        # two-level streamed path sorts inside pick_traversal already)
        self._unroll = False
        self._sort_secondary = False
        if accel in ("bvh", "bvhold"):
            self._isect, self._isect_p = pick_traversal(
                self.st, with_stats=collect_stats)
            use_packets = (on_tpu and not getattr(self.st, "has_motion", False)
                           and (self.st.two_level
                                or traverse_pallas.vmem_budget_ok(
                                    self.st.n_wide_nodes,
                                    self.st.n_tris + self.st.n_spheres)))
            self._unroll = use_packets
            self._sort_secondary = use_packets and not self.st.two_level
            self.accel_stats = {"kind": "bvh", "n_nodes": self.st.n_nodes}
        else:
            # thesis kd/RBSP/BSP family via the native builders + unified
            # projected-plane traversal (research-parity path)
            from tpupt.accel.kdbsp import build_alt_accel, intersect_kdbsp

            nodes, dirs, max_leaf, astats = build_alt_accel(
                scene, accel, scene.accelerator_params)
            self.accel_stats = {"kind": accel, **astats}
            self.accel_nodes, self.accel_dirs = nodes, dirs
            per_node = "ndir" in nodes
            # thread the tables through ds (a jit ARGUMENT): closure-
            # captured tables become HLO literals whose lowering takes
            # minutes at killeroo scale on TPU (see DeviceScene.alt_*)
            self.ds = self.ds._replace(
                alt_flags=nodes["flags"], alt_split=nodes["split"],
                alt_above=nodes["above"], alt_nprims=nodes["nprims"],
                alt_prim_rows=nodes["prim_rows"],
                alt_ndir=nodes.get("ndir"), alt_dirs=jnp.asarray(dirs),
                alt_pack=nodes["pack"])

            from tpupt.ops.traverse_kdbsp import (intersect_kdbsp_packets,
                                                  kdbsp_vmem_ok)

            if on_tpu and kdbsp_vmem_ok(int(nodes["flags"].shape[0]),
                                        astats.get("tree_depth", 0)):
                # Pallas packet walker (ops/traverse_kdbsp.py) — the XLA
                # lockstep walker runs ~100x slower on incoherent bounces.
                # path_li gates the per-bounce coherence sort (camera rays
                # stay in tile order, secondaries re-sort spatially)
                def isect(ds, st, o, d, tmax, any_hit=False, **kw):
                    return intersect_kdbsp_packets(
                        ds, st, o, d, tmax, any_hit=any_hit,
                        with_stats=collect_stats)

                def isect_p(ds, st, o, d, tmax, **kw):
                    hit, stats = isect(ds, st, o, d, tmax, any_hit=True)
                    return hit.valid, stats

                self._isect, self._isect_p = isect, isect_p
                self._unroll = True
                self._sort_secondary = True
            else:
                def isect(ds, st, o, d, tmax, any_hit=False, **kw):
                    # kd/BSP trees are built over shutter-union bounds but
                    # test static mid-shutter prims; time is ignored here
                    nd = {"flags": ds.alt_flags, "split": ds.alt_split,
                          "above": ds.alt_above, "nprims": ds.alt_nprims,
                          "prim_rows": ds.alt_prim_rows}
                    if per_node:
                        nd["ndir"] = ds.alt_ndir
                    return intersect_kdbsp(nd, ds.alt_dirs, ds, st, o, d,
                                           tmax, max_leaf, any_hit=any_hit)

                def isect_p(ds, st, o, d, tmax, **kw):
                    hit, stats = isect(ds, st, o, d, tmax, any_hit=True)
                    return hit.valid, stats

                self._isect, self._isect_p = isect, isect_p

        max_depth = scene.integrator.max_depth
        rr_threshold = scene.integrator.rr_threshold
        st, sampler = self.st, self.sampler

        # media now live in the DeviceScene tables (per-interface,
        # media/media.py MediaTable); keep a MediumParams handle for tools
        # that inspect the (legacy) global-medium configuration
        # exit-pupil bounds for the realistic camera (BoundExitPupil,
        # realistic.cpp:231 — rear-element sampling wastes most lanes to
        # vignetting without them)
        self._pupil = None
        if cam.lens_data is not None:
            from tpupt.cameras.realistic import bound_exit_pupil

            self._pupil = jnp.asarray(bound_exit_pupil(
                cam.lens_data, cam.lens_z, cam.film_diag))

        self._medium = None
        if scene.media:
            from tpupt.media.media import build_medium

            first = next(iter(scene.media.values()))
            self._medium = build_medium(first, scene)

        # NOTE: ds is a jit ARGUMENT, not a closure — closure-captured scene
        # tensors become HLO constants and inflate compile time
        def step(ds, film, sample_idx, px_b, py_b, valid_b):
            jx, jy = sampler.camera_jitter(px_b, py_b, sample_idx)
            p_raster = jnp.stack([px_b.astype(jnp.float32) + jx,
                                  py_b.astype(jnp.float32) + jy], -1)
            ul1 = sampler.dim(px_b, py_b, sample_idx, 2)
            ul2 = sampler.dim(px_b, py_b, sample_idx, 3)
            # per-ray shutter time (CameraSample::time, camera.h:67):
            # normalized to [0,1] for the vertex-lerp motion tables
            if st.has_motion or st.cam_animated:
                time = sampler.dim(px_b, py_b, sample_idx, 4)
            else:
                time = None
            if cam.lens_data is not None:
                # realistic lens-stack camera (cameras/realistic.py);
                # vignetted lanes contribute black
                from tpupt.cameras.realistic import realistic_rays

                o, d, cam_alive, cam_w = realistic_rays(
                    cam.lens_data, cam.lens_z, ds.cam_to_world, p_raster,
                    jnp.stack([ul1, ul2], -1), xres, yres, cam.film_diag,
                    pupil=self._pupil)
            else:
                o, d = generate_rays(cam.type, ds.raster_to_camera,
                                     ds.cam_to_world, p_raster,
                                     jnp.stack([ul1, ul2], -1),
                                     cam.lens_radius, cam.focal_distance,
                                     xres, yres,
                                     cam_q=(ds.cam_q if st.cam_animated
                                            else None),
                                     cam_tr=(ds.cam_tr if st.cam_animated
                                             else None),
                                     time=time)
                cam_alive = None
                cam_w = None
            name = scene.integrator.name
            if name == "volpath" and st.n_media > 0:
                from tpupt.integrators.volpath import volpath_li

                L, aov = volpath_li(ds, st, sampler, max_depth,
                                    rr_threshold, px_b, py_b, sample_idx,
                                    o, d, self._isect, self._isect_p)
            elif name == "bdpt":
                from tpupt.integrators.bdpt import bdpt_li

                L, aov, sp_p, sp_L = bdpt_li(
                    ds, st, sampler, max_depth, px_b, py_b, sample_idx,
                    o, d, self._isect, self._isect_p, xres, yres,
                    valid=valid_b)
                film = filmmod.add_splats(film, self.cfg, sp_p, sp_L)
            elif name in ("path", "volpath", "mlt", "sppm"):
                # mlt/sppm run through their own Render drivers; inside the
                # shared sample loop they estimate with the path kernel
                L, aov = path_li(ds, st, sampler, max_depth, rr_threshold,
                                 px_b, py_b, sample_idx, o, d,
                                 isect=self._isect, isect_p=self._isect_p,
                                 time=time, unroll=self._unroll,
                                 sort_secondary=self._sort_secondary)
            elif name in ("directlighting", "whitted"):
                from tpupt.integrators.direct import direct_lighting_li

                strat = scene.integrator.strategy if name == "directlighting" else "all"
                L, aov = direct_lighting_li(
                    ds, st, sampler, max_depth, strat, px_b, py_b,
                    sample_idx, o, d, self._isect, self._isect_p)
            elif name == "ambientocclusion":
                from tpupt.integrators.direct import ao_li

                L, aov = ao_li(ds, st, sampler,
                               min(scene.integrator.n_ao_samples, 16),
                               scene.integrator.cos_sample, px_b, py_b,
                               sample_idx, o, d, self._isect, self._isect_p)
            else:
                L, aov = path_li(ds, st, sampler, max_depth, rr_threshold,
                                 px_b, py_b, sample_idx, o, d,
                                 time=time, unroll=self._unroll,
                                 sort_secondary=self._sort_secondary,
                                 isect=self._isect, isect_p=self._isect_p)
            # NaN/inf clamping to black (integrator.cpp:300-321): the
            # reference kills samples with NEGATIVE LUMINANCE (y < -1e-5),
            # not per-channel negatives — spectral->RGB conversion puts
            # small legitimate out-of-gamut negatives in saturated colors
            from tpupt.core.spectrum import luminance as _lum

            bad = ~jnp.isfinite(L).all(-1) | (_lum(L) < -1e-5)
            L = jnp.where(bad[..., None], 0.0, L)
            if cam_alive is not None:
                L = jnp.where(cam_alive[..., None], L, 0.0)
                if cam_w is not None:
                    # exit-pupil box measure -> rear-disk normalization
                    L = L * cam_w[..., None]
            if np.isfinite(self.cfg.max_sample_luminance):
                from tpupt.core.spectrum import luminance

                lum = luminance(L)
                s = jnp.where(lum > self.cfg.max_sample_luminance,
                              self.cfg.max_sample_luminance / jnp.maximum(lum, 1e-9),
                              1.0)
                L = L * s[..., None]
            return filmmod.add_samples(film, self.cfg, p_raster, L, aov,
                                       mask=valid_b)

        # raw (unjitted) step — ShardedRenderer re-jits the SAME step with
        # mesh shardings, so the sharded path carries the full single-chip
        # feature matrix (all integrators, bdpt splats, crop, clamping)
        self._step_py = step
        self._step_fn = jax.jit(step, donate_argnums=(1,))

        # whole-sample step: scan over the wavefront batches INSIDE one jit
        # call — each host->device call through the PJRT tunnel costs
        # ~0.3 s of dispatch overhead, so per-batch host loops dominate
        # once the device work is fast
        def spp_step(ds, film, sample_idx, px_all, py_all, valid_all):
            def body(f, xs):
                px_b, py_b, valid_b = xs
                return step(ds, f, sample_idx, px_b, py_b, valid_b), None

            film, _ = jax.lax.scan(body, film,
                                   (px_all, py_all, valid_all))
            return film

        self._spp_fn = jax.jit(spp_step, donate_argnums=(1,))
        nb = self.n_batches
        self._px_b = self.px.reshape(nb, self.batch)
        self._py_b = self.py.reshape(nb, self.batch)
        self._valid_b = self.valid.reshape(nb, self.batch)

    def _step(self, film, sample_idx, px_b, py_b, valid_b):
        return self._step_fn(self.ds, film, sample_idx, px_b, py_b, valid_b)

    def _spp(self, film, sample_idx):
        """One full sample over every batch in a single device call."""
        return self._spp_fn(self.ds, film, sample_idx, self._px_b,
                            self._py_b, self._valid_b)

    def render(self, spp: int = None, film=None, verbose: bool = False):
        spp = spp or self.scene.sampler.spp
        # splat normalization tracks samples accumulated into THIS film: a
        # fresh render resets the count, a passed-in film continues it
        # (repeat renders previously inflated the divisor -> splats shrank)
        if film is None:
            self._spp_rendered = spp
            film = filmmod.new_film(self.cfg.xres, self.cfg.yres)
        else:
            self._spp_rendered = getattr(self, "_spp_rendered", 0) + spp
        b = self.batch
        import time as _time

        t0 = _time.time()
        for s in range(spp):
            film = self._spp(film, jnp.uint32(s))
            if verbose:
                # progress bar + ETA (ProgressReporter, progressreporter.h:50)
                jax.block_until_ready(film.rgb)
                done = s + 1
                el = _time.time() - t0
                eta = el / done * (spp - done)
                nbar = 24
                fill = int(nbar * done / spp)
                print(f"\r  [{'+' * fill}{' ' * (nbar - fill)}] "
                      f"{done}/{spp} spp  ({el:.1f}s | ETA {eta:.1f}s) ",
                      end="" if done < spp else "\n", flush=True)
        return film

    def save_checkpoint(self, film, path: str, sample_done: int):
        """Film snapshot for resumable renders (the reference has none —
        SURVEY.md §5 flags this as a required addition)."""
        np.savez(path, rgb=np.asarray(film.rgb),
                 weight=np.asarray(film.weight),
                 splat=np.asarray(film.splat), aov=np.asarray(film.aov),
                 sample_done=sample_done)

    def load_checkpoint(self, path: str):
        """Returns (film, next_sample_index)."""
        z = np.load(path)
        film = filmmod.Film(rgb=jnp.asarray(z["rgb"]),
                            weight=jnp.asarray(z["weight"]),
                            splat=jnp.asarray(z["splat"]),
                            aov=jnp.asarray(z["aov"]))
        return film, int(z["sample_done"])

    def render_resumable(self, spp: int = None, checkpoint: str = None,
                         every: int = 4, verbose: bool = False):
        """Render with periodic film checkpoints; resumes if the file exists."""
        import os

        spp = spp or self.scene.sampler.spp
        film, start = (self.load_checkpoint(checkpoint)
                       if checkpoint and os.path.exists(checkpoint)
                       else (filmmod.new_film(self.cfg.xres, self.cfg.yres), 0))
        for s in range(start, spp):
            film = self._spp(film, jnp.uint32(s))
            if checkpoint and (s + 1) % every == 0:
                jax.block_until_ready(film.rgb)
                self.save_checkpoint(film, checkpoint, s + 1)
            if verbose:
                print(f"  sample {s + 1}/{spp}", flush=True)
        self._spp_rendered = spp  # total samples accumulated in this film
        return film

    def image(self, film):
        # splats (BDPT t==1 / MLT) are averaged over rendered samples
        # (Film::WriteImage splatScale, film.cpp:153)
        scale = 1.0 / max(getattr(self, "_spp_rendered", 0), 1)
        return np.asarray(filmmod.to_image(film, self.cfg, scale))

    def aovs(self, film):
        return {k: np.asarray(v)
                for k, v in filmmod.aov_images(film, self.cfg).items()}
