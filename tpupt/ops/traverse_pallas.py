"""Pallas TPU packet traversal — the hot intersection kernel.

Design (the TPU answer to bvh.cpp:354's per-ray stack walk): per-lane
divergent gathers are hostile to the VPU (HBM gathers cost ~constant per row,
VMEM per-lane gathers are unsupported), so traversal is *packet-based*:

  * a packet = 1024 coherent rays = one native (8, 128) VPU tile;
  * the node stack is SCALAR, one per packet, in SMEM — node/prim fetches
    are scalar loads broadcast to the vector unit, never gathers;
  * each wide-BVH child is slab-tested against the whole packet in a few
    (8, 128) VPU ops; a child is descended if ANY ray wants it (scalar
    reduction), so packet coherence determines efficiency — callers sort
    secondary rays to keep packets coherent;
  * leaves test up to 8 prims, each broadcast from its packed 32-float row
    (device.pack_prim_rows) against the whole packet.

Whole-scene node + prim tables live in VMEM (guard: ~12 MB); larger scenes
fall back to the XLA wide-BVH path in accel/traverse.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupt.shapes.quadric import quadric_test_parts

PACK = 1024  # rays per packet: one (8, 128) register tile
STACK = 64
_BIG = 3.0e38  # plain float: jnp scalars would be captured consts in the kernel


def traverse_loop(node_at, prim_at, rays, t_ref, gid_ref, b1_ref, b2_ref,
                  stack_ref, *, max_leaf: int, any_hit: bool,
                  has_spheres: bool, with_stats: bool, sp_init=None,
                  node_tile=None, prim_tile=None, perm_info=None):
    """The packet traversal while-loop, shared by the single-level kernel
    and the two-level streamed kernel (ops/traverse_stream.py).

    node_at(node, child, col) / prim_at(first, k, col) are scalar
    accessors into whatever node/prim block layout the caller streams in
    (k is the STATIC leaf-loop index so packed layouts can derive static
    lane offsets from it); t/gid/b1/b2 refs
    carry current-best hits ACROSS calls (the streamed kernel accumulates
    over several treelets into the same output tiles). stack_ref[0] must
    hold the local root id; sp_init=0 skips the walk (dead grid step).
    Returns the (nodes, leaves, tests) packet counters.

    node_tile(node) -> (8, 8), when given, fetches a whole wide node with
    ONE dynamic-major tile load; the 6 bounds per child then stay in the
    vector domain as (1, 1)-slice broadcasts (same pattern as the kd/BSP
    dense-tile walker, traverse_kdbsp.py) instead of 48 dynamic scalar
    VMEM loads per pop — the interior loop is scalar-issue-bound, so the
    collapsed loads are most of the pop cost. Only the m6/m7 control
    fields still load as scalars (they drive stack pushes)."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz,
     kx, ky, kz, sx, sy, sz, o_kx, o_ky, o_kz) = rays
    # FMA form of the slab test: (lo - o) * inv == lo * inv - o * inv,
    # with o * inv hoisted out of the node loop (saves 6 vector ops per
    # child = ~25% of interior cost)
    oix = ox * ix
    oiy = oy * iy
    oiz = oz * iz

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, c_nodes, c_leaves, c_tests = state
        raw = stack_ref[sp - 1]
        sp = sp - 1
        # GeneralStats (bvh.cpp:379): packet-uniform SCALAR counters in the
        # loop carry, compiled in only when instrumentation is requested —
        # the traversal loop is scalar-issue-bound, so even scalar counter
        # ops cost ~10% (tile adds cost ~20%)
        is_leaf_pop = raw < 0
        if with_stats:
            c_nodes = c_nodes + jnp.where(is_leaf_pop, 0, 1)
            c_leaves = c_leaves + jnp.where(is_leaf_pop, 1, 0)

        def interior(sp):
            node = raw
            t_cur = t_ref[0]
            if node_tile is not None:
                # ONE dynamic-major (8, 8) load for the whole wide node,
                # then lane-masked reductions give each bounds field as an
                # (8, 1) per-child column (child = sublane). The per-child
                # (1, 1) sublane slices below broadcast against the packet
                # tile in the vector domain (kdbsp dense-tile pattern —
                # Mosaic implements sublane-offset broadcasts; lane-offset
                # ones are "Not implemented"). Replaces 48 of the 64
                # dynamic scalar VMEM loads per pop in this
                # scalar-issue-bound loop.
                tile = node_tile(node)
                lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)

                def fcol(f):
                    return jnp.sum(jnp.where(lane8 == f, tile, 0.0),
                                   axis=1, keepdims=True)

                f_lox, f_loy, f_loz = fcol(0), fcol(1), fcol(2)
                f_hix, f_hiy, f_hiz = fcol(3), fcol(4), fcol(5)
            # static-unrolled 8 children; bounds are scalar loads broadcast
            # against the packet tile. (An approximate front-to-back push
            # order via a scalar centroid-key sorting network was measured
            # 2x SLOWER than slot order — the loop is scalar-issue-bound,
            # so ~20 extra scalar ops per child dominate the visits saved.)
            for c in range(8):
                if node_tile is not None:
                    lo_x = f_lox[c:c + 1]
                    lo_y = f_loy[c:c + 1]
                    lo_z = f_loz[c:c + 1]
                    hi_x = f_hix[c:c + 1]
                    hi_y = f_hiy[c:c + 1]
                    hi_z = f_hiz[c:c + 1]
                else:
                    lo_x = node_at(node, c, 0)
                    lo_y = node_at(node, c, 1)
                    lo_z = node_at(node, c, 2)
                    hi_x = node_at(node, c, 3)
                    hi_y = node_at(node, c, 4)
                    hi_z = node_at(node, c, 5)
                t1x = lo_x * ix - oix
                t2x = hi_x * ix - oix
                t1y = lo_y * iy - oiy
                t2y = hi_y * iy - oiy
                t1z = lo_z * iz - oiz
                t2z = hi_z * iz - oiz
                t_near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                 jnp.minimum(t1y, t2y)),
                                     jnp.minimum(t1z, t2z))
                t_far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                jnp.maximum(t1y, t2y)),
                                    jnp.maximum(t1z, t2z)) * 1.0000004
                hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_cur)
                # float-encoded meta: >0 interior id; <0 leaf count (first
                # in col 7); 0 empty. Empty slots MUST be gated explicitly:
                # their inverted inf/-inf boxes PASS the symmetrized slab
                # test (min/max turns them into [-inf,+inf]), and half of a
                # typical wide tree's child slots are empty — un-gated they
                # each cost a full masked leaf test per pop
                m6 = node_at(node, c, 6)
                m7 = node_at(node, c, 7)
                any_c = jnp.any(hit) & (m6 != 0.0)
                meta = jnp.where(
                    m6 > 0.0, m6.astype(jnp.int32),
                    -((m7.astype(jnp.int32) << 6) + (-m6).astype(jnp.int32)) - 1)

                @pl.when(any_c)
                def _():
                    stack_ref[sp] = meta

                sp = sp + jnp.where(any_c, 1, 0)
            return sp

        def leaf(sp, perm=None):
            v = -raw - 1
            first = v >> 6
            cnt = v & 63
            for k in range(max_leaf):
                # (prim rows stay scalar loads: a (1, 1) slice at lane
                # offset `col` cannot broadcast in Mosaic — "broadcast in
                # both sublanes and lanes" is unimplemented — and masked
                # lane reductions per column cost more vector ops than the
                # ~13 scalar loads they would replace)
                def ps(col, k=k):
                    return prim_at(first, k, col)

                t_cur = t_ref[0]
                p_gid = ps(18).astype(jnp.int32)
                p_is_tri = ps(19) == 1.0
                valid = k < cnt

                # ---- watertight triangle test (triangle.cpp:188) ----
                if perm is not None:
                    # packet-uniform permutation: the dominant-axis sort
                    # bits make (kx, ky, kz) identical across the packet,
                    # so the per-lane where-chains collapse to STATIC
                    # column loads (~20% of the leaf test's vector ops)
                    KX, KY, KZ = perm

                    def permsel(col):
                        return ps(col + KX), ps(col + KY), ps(col + KZ)
                else:
                    def permsel(col):
                        px, py, pz = ps(col), ps(col + 1), ps(col + 2)
                        ax_ = jnp.where(kx == 0, px,
                                        jnp.where(kx == 1, py, pz))
                        ay_ = jnp.where(ky == 0, px,
                                        jnp.where(ky == 1, py, pz))
                        az_ = jnp.where(kz == 0, px,
                                        jnp.where(kz == 1, py, pz))
                        return ax_, ay_, az_

                a0x, a0y, a0z = permsel(0)
                a1x, a1y, a1z = permsel(3)
                a2x, a2y, a2z = permsel(6)
                a0x = a0x - o_kx
                a0y = a0y - o_ky
                a0z = a0z - o_kz
                a1x = a1x - o_kx
                a1y = a1y - o_ky
                a1z = a1z - o_kz
                a2x = a2x - o_kx
                a2y = a2y - o_ky
                a2z = a2z - o_kz
                x0 = a0x - sx * a0z
                y0 = a0y - sy * a0z
                x1 = a1x - sx * a1z
                y1 = a1y - sy * a1z
                x2 = a2x - sx * a2z
                y2 = a2y - sy * a2z
                e0 = x1 * y2 - y1 * x2
                e1 = x2 * y0 - y2 * x0
                e2 = x0 * y1 - y0 * x1
                same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                       ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
                det = e0 + e1 + e2
                z0 = sz * a0z
                z1 = sz * a1z
                z2 = sz * a2z
                t_scaled = e0 * z0 + e1 * z1 + e2 * z2
                pos = det > 0
                # (bool selects are unsupported in Mosaic -> logical form)
                t_ok = (pos & (t_scaled > 1e-6 * det) & (t_scaled < t_cur * det)) \
                    | (~pos & (t_scaled < 1e-6 * det) & (t_scaled > t_cur * det))
                inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
                tt = t_scaled * inv_det
                win_t = valid & p_is_tri & same & (det != 0) & t_ok & (tt > 1e-6) \
                    & (tt < t_cur)
                t_new = jnp.where(win_t, tt, t_cur)
                gid_new = jnp.where(win_t, p_gid, gid_ref[0])
                b1_new = jnp.where(win_t, e1 * inv_det, b1_ref[0])
                b2_new = jnp.where(win_t, e2 * inv_det, b2_ref[0])

                if has_spheres:
                    # ---- quadric row: w2o 3x4 in cols 0-11, r/zmin/zmax/
                    # phimax in 12-15, kind/q1/q2/sin(pm)/cos(pm) in 20-24.
                    # One unified test covers the whole pbrt quadric family
                    # (shapes/quadric.py; sphere.cpp:118/cylinder.cpp:47/
                    # disk.cpp:47/cone.cpp:49/paraboloid.cpp:50/
                    # hyperboloid.cpp:88) ----
                    osx = ps(0) * ox + ps(1) * oy + ps(2) * oz + ps(3)
                    osy = ps(4) * ox + ps(5) * oy + ps(6) * oz + ps(7)
                    osz = ps(8) * ox + ps(9) * oy + ps(10) * oz + ps(11)
                    dsx = ps(0) * dx + ps(1) * dy + ps(2) * dz
                    dsy = ps(4) * dx + ps(5) * dy + ps(6) * dz
                    dsz = ps(8) * dx + ps(9) * dy + ps(10) * dz
                    hit_q, ts = quadric_test_parts(
                        ps(20), ps(12), ps(13), ps(14), ps(15),
                        ps(21), ps(22), ps(23), ps(24),
                        osx, osy, osz, dsx, dsy, dsz, t_new)
                    win_s = valid & ~p_is_tri & hit_q & (ts < t_new)
                    t_new = jnp.where(win_s, ts, t_new)
                    gid_new = jnp.where(win_s, p_gid, gid_new)

                t_ref[0] = t_new
                gid_ref[0] = gid_new
                b1_ref[0] = b1_new
                b2_ref[0] = b2_new

            if any_hit:
                # occluded lanes must stop voting for nodes: zeroing their
                # t kills them in every later slab test (t_near < t_cur),
                # so the packet's node-set union shrinks as lanes find
                # occluders. Without this, unoccluded-segment walks pay
                # the FULL union to the last lane (shadow traversals
                # measured 92/50/37 ms vs <8 ms for the matched primary
                # bounce on killeroo — they dominated the whole render).
                t_ref[0] = jnp.where(gid_ref[0] >= 0, 0.0, t_ref[0])
                sp = jnp.where(jnp.all(gid_ref[0] >= 0), 0, sp)
            return sp

        if with_stats:
            c_tests = c_tests + jnp.where(
                is_leaf_pop, jnp.minimum(-raw - 1 & 63, max_leaf), 0)
        if perm_info is None:
            leaf_fn = leaf
        else:
            # packet-uniform watertight permutation dispatch: with the
            # dominant-axis sort bits in the coherence key, almost every
            # packet is (kx, ky, kz)-uniform and takes a static branch
            uni, pidx = perm_info

            def leaf_uniform(sp):
                return jax.lax.switch(pidx, [
                    lambda s: leaf(s, (1, 2, 0)),   # kz=0
                    lambda s: leaf(s, (2, 1, 0)),   # kz=0, swapped
                    lambda s: leaf(s, (2, 0, 1)),   # kz=1
                    lambda s: leaf(s, (0, 2, 1)),   # kz=1, swapped
                    lambda s: leaf(s, (0, 1, 2)),   # kz=2
                    lambda s: leaf(s, (1, 0, 2)),   # kz=2, swapped
                ], sp)

            def leaf_fn(sp):
                return jax.lax.cond(uni, leaf_uniform,
                                    lambda s: leaf(s), sp)
        sp = jax.lax.cond(raw < 0, leaf_fn, interior, sp)
        return sp, c_nodes, c_leaves, c_tests

    zero = jnp.int32(0)
    sp0 = jnp.int32(1) if sp_init is None else sp_init.astype(jnp.int32)
    _, n_nodes, n_leaves, n_tests = jax.lax.while_loop(
        cond, body, (sp0, zero, zero, zero))
    return n_nodes, n_leaves, n_tests


def _kernel(nodes_ref, prims_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            ix_ref, iy_ref, iz_ref,
            kx_ref, ky_ref, kz_ref, sx_ref, sy_ref, sz_ref,
            tmax_ref,
            t_ref, gid_ref, b1_ref, b2_ref, visits_ref, leaves_ref,
            tests_ref,
            stack_ref,
            *, max_leaf: int, any_hit: bool, has_spheres: bool,
            with_stats: bool):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    ix, iy, iz = ix_ref[0], iy_ref[0], iz_ref[0]
    kx, ky, kz = kx_ref[0], ky_ref[0], kz_ref[0]
    sx, sy, sz = sx_ref[0], sy_ref[0], sz_ref[0]

    t_ref[0] = tmax_ref[0]
    gid_ref[0] = jnp.full((8, 128), -1, jnp.int32)
    b1_ref[0] = jnp.zeros((8, 128), jnp.float32)
    b2_ref[0] = jnp.zeros((8, 128), jnp.float32)
    stack_ref[0] = 0

    o_kx = jnp.where(kx == 0, ox, jnp.where(kx == 1, oy, oz))
    o_ky = jnp.where(ky == 0, ox, jnp.where(ky == 1, oy, oz))
    o_kz = jnp.where(kz == 0, ox, jnp.where(kz == 1, oy, oz))

    rays = (ox, oy, oz, dx, dy, dz, ix, iy, iz,
            kx, ky, kz, sx, sy, sz, o_kx, o_ky, o_kz)
    # packet-uniform permutation classification (see traverse_loop)
    kx_mx = jnp.max(kx)
    kz_mx = jnp.max(kz)
    uni = (jnp.min(kx) == kx_mx) & (jnp.min(kz) == kz_mx)
    swapped = (kx_mx == jax.lax.rem(kz_mx + 2, 3)).astype(jnp.int32)
    perm_info = (uni, kz_mx * 2 + swapped)
    n_nodes, n_leaves, n_tests = traverse_loop(
        lambda n, c, col: nodes_ref[n, c, col],
        lambda first, k, col: prims_ref[first + k, col],
        rays, t_ref, gid_ref, b1_ref, b2_ref, stack_ref,
        max_leaf=max_leaf, any_hit=any_hit, has_spheres=has_spheres,
        with_stats=with_stats,
        node_tile=lambda n: nodes_ref[n], perm_info=perm_info)
    # broadcast the packet-level counters to the per-ray tiles once
    visits_ref[0] = jnp.full((8, 128), n_nodes, jnp.int32)
    leaves_ref[0] = jnp.full((8, 128), n_leaves, jnp.int32)
    tests_ref[0] = jnp.full((8, 128), n_tests, jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_leaf", "any_hit",
                                             "has_spheres", "interpret",
                                             "with_stats"))
def _traverse(nodes_tiles, prim_rows,
              ox, oy, oz, dx, dy, dz, ix, iy, iz,
              kx, ky, kz, sx, sy, sz, tmax,
              max_leaf: int, any_hit: bool, has_spheres: bool,
              interpret: bool = False, with_stats: bool = False):
    n_packets = ox.shape[0]
    ray_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    shp = (n_packets, 8, 128)
    out_shapes = [
        jax.ShapeDtypeStruct(shp, jnp.float32),  # t
        jax.ShapeDtypeStruct(shp, jnp.int32),    # gid
        jax.ShapeDtypeStruct(shp, jnp.float32),  # b1
        jax.ShapeDtypeStruct(shp, jnp.float32),  # b2
        jax.ShapeDtypeStruct(shp, jnp.int32),    # node visits
        jax.ShapeDtypeStruct(shp, jnp.int32),    # leaf visits
        jax.ShapeDtypeStruct(shp, jnp.int32),    # prim tests
    ]
    kern = functools.partial(_kernel, max_leaf=max_leaf,
                             any_hit=any_hit, has_spheres=has_spheres,
                             with_stats=with_stats)
    return pl.pallas_call(
        kern,
        grid=(n_packets,),
        in_specs=[full, full] + [ray_spec] * 16,
        out_specs=[ray_spec] * 7,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            # inside the bounce fori_loop XLA stack-allocates every pallas
            # operand (scene tables + 16 ray tiles + 7 outputs) in scoped
            # VMEM — ~47 MB at 128 packets, over the default 16 MB budget
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nodes_tiles, prim_rows, ox, oy, oz, dx, dy, dz, ix, iy, iz,
      kx, ky, kz, sx, sy, sz, tmax)


def vmem_budget_ok(n_wide_nodes: int, n_prim_rows: int) -> bool:
    bytes_needed = n_wide_nodes * 8 * 8 * 4 + n_prim_rows * 32 * 4
    return bytes_needed < 12 * 1024 * 1024


def intersect_packets(ds, st, o, d, tmax, any_hit=False, interpret=False,
                      with_stats=True):
    """Drop-in packet-kernel version of accel.traverse.intersect_wide.
    Pads the batch to a PACK multiple. Returns (Hit, TraversalStats);
    with_stats=False compiles the counters out of the hot loop (stats come
    back as zeros)."""
    from tpupt.accel.traverse import Hit, TraversalStats
    from tpupt.core.vecmath import ray_inv_d
    from tpupt.shapes.triangle import ray_permutation

    n = o.shape[0]
    n_pad = (-n) % PACK
    if n_pad:
        o = jnp.concatenate([o, jnp.ones((n_pad, 3))])
        d = jnp.concatenate([d, jnp.ones((n_pad, 3))])
        tmax = jnp.concatenate([tmax, jnp.zeros(n_pad)])
    npk = o.shape[0] // PACK

    kx, ky, kz, sx, sy, sz = ray_permutation(d)
    inv_d = ray_inv_d(d)

    def pk(x, dtype=jnp.float32):
        return x.astype(dtype).reshape(npk, 8, 128)

    t, gid, b1, b2, visits, leaves, tests = _traverse(
        ds.wide_nodes_tiled, ds.prim_rows_padded,
        pk(o[:, 0]), pk(o[:, 1]), pk(o[:, 2]),
        pk(d[:, 0]), pk(d[:, 1]), pk(d[:, 2]),
        pk(inv_d[:, 0]), pk(inv_d[:, 1]), pk(inv_d[:, 2]),
        pk(kx, jnp.int32), pk(ky, jnp.int32), pk(kz, jnp.int32),
        pk(sx), pk(sy), pk(sz), pk(tmax),
        max_leaf=st.max_leaf, any_hit=any_hit,
        has_spheres=st.n_spheres > 0, interpret=interpret,
        with_stats=with_stats)

    t = t.reshape(-1)[:n]
    gid = gid.reshape(-1)[:n]
    b1 = b1.reshape(-1)[:n]
    b2 = b2.reshape(-1)[:n]
    visits = visits.reshape(-1)[:n]
    leaves = leaves.reshape(-1)[:n]
    tests = tests.reshape(-1)[:n]

    # sphere object-space hit point for shading (post-loop, cheap gather)
    if st.n_spheres > 0:
        sid = jnp.clip(gid - st.n_tris, 0, max(st.n_spheres - 1, 0))
        w2o = ds.sph_w2o[sid]
        o_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], o[:n]) + w2o[:, :3, 3]
        d_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], d[:n])
        p_obj = o_obj + t[:, None] * d_obj
    else:
        p_obj = jnp.zeros((n, 3))

    hit = Hit(valid=gid >= 0, t=t, prim=gid, b1=b1, b2=b2, p_obj=p_obj)
    stats = TraversalStats(visits, leaves, tests)
    return hit, stats
