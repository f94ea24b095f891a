"""Two-level HBM-streamed Pallas traversal — size-oblivious scenes.

Companion to ops/traverse_pallas.py (which requires the whole scene in
VMEM). Reference parity target: bvh.cpp:354-397 traverses arbitrary scene
sizes; here the wide BVH is split by accel/treelets.py into a VMEM-resident
top tree plus fixed-size treelet blocks living in HBM.

One UNIFIED kernel per 1024-ray packet interleaves the two levels:

  * the top tree is walked with a scalar SMEM stack exactly like the
    single-level kernel, except that popped treelet refs are appended to a
    small SMEM chunk list instead of being descended;
  * whenever the chunk fills (CHUNK entries) or the stack empties, the
    chunk is DRAINED: each treelet's node/prim blocks are double-buffered
    HBM->VMEM with explicit async DMA (the j+1 copy is issued before the
    j walk so the DMA rides under traversal compute), and the treelet is
    walked into the packet's persistent hit state (t/gid/b1/b2 VMEM
    tiles). Then the top walk resumes.

Because the chunk is drained and reused, a packet can enter ANY number of
treelets — there is no list capacity and therefore no truncation (the
earlier two-phase design materialized per-packet lists of at most 96
treelets and silently-counted overflow, which lost hits on incoherent
packets). Draining as-you-go also tightens the cull: both the top-tree
slab tests and the per-treelet skip test (entry distance vs the packet's
worst current best-t) read the LIVE t_ref, which already reflects every
previously drained treelet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupt.ops.traverse_pallas import STACK, traverse_loop

_BIG = 3.0e38
# streamed packets are 1024 rays like the single-level kernel (measured:
# 256-ray packets LOSE ~2.5x on incoherent bounces — per-treelet node
# unions shrink sublinearly in packet size, so 4x more treelet walks with
# their fixed DMA-issue/loop costs dominate)
ROWS = 8
PACK = ROWS * 128
CHUNK = 16  # treelet refs buffered between drains (double-buffer window)


def _kernel_unified(top_ref, nodes_hbm, prims_hbm,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    ix_ref, iy_ref, iz_ref,
                    kx_ref, ky_ref, kz_ref, sx_ref, sy_ref, sz_ref,
                    tmax_ref,
                    t_ref, gid_ref, b1_ref, b2_ref, visits_ref, leaves_ref,
                    tests_ref,
                    nodes_buf, prims_buf, sem_n, sem_p,
                    top_stack, top_tn, chunk_tid, chunk_tn, walk_stack,
                    *, tn: int, tp: int, chunk: int, max_leaf: int,
                    any_hit: bool, has_spheres: bool, with_stats: bool):
    """One packet per grid step; collect-then-drain over the top tree.

    Top-tile meta (treelets.py): col6 > 0 interior id; col6 == 0 empty;
    col6 < 0 treelet ref with tid = col7. The top stack carries -(tid+1)
    for treelet refs plus a parallel f32 stack of packet entry distances
    (min t_near over entering rays)."""
    t_ref[0] = tmax_ref[0]
    gid_ref[0] = jnp.full((ROWS, 128), -1, jnp.int32)
    b1_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    b2_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    visits_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    leaves_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    tests_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    ix, iy, iz = ix_ref[0], iy_ref[0], iz_ref[0]
    kx, ky, kz = kx_ref[0], ky_ref[0], kz_ref[0]
    sx, sy, sz = sx_ref[0], sy_ref[0], sz_ref[0]
    o_kx = jnp.where(kx == 0, ox, jnp.where(kx == 1, oy, oz))
    o_ky = jnp.where(ky == 0, ox, jnp.where(ky == 1, oy, oz))
    o_kz = jnp.where(kz == 0, ox, jnp.where(kz == 1, oy, oz))
    rays = (ox, oy, oz, dx, dy, dz, ix, iy, iz,
            kx, ky, kz, sx, sy, sz, o_kx, o_ky, o_kz)
    # packet-uniform watertight-permutation classification (see
    # traverse_pallas.traverse_loop) — computed once per packet
    kx_mx = jnp.max(kx)
    kz_mx = jnp.max(kz)
    k_uni = (jnp.min(kx) == kx_mx) & (jnp.min(kz) == kz_mx)
    k_swap = (kx_mx == jax.lax.rem(kz_mx + 2, 3)).astype(jnp.int32)
    perm_info = (k_uni, kz_mx * 2 + k_swap)

    top_stack[0] = 0
    top_tn[0] = 0.0

    def copies(j, slot):
        # blocks are 128-lane rows (nodes: 64 data floats + 64 pad;
        # prims: 4 rows packed with leaf starts 4-aligned) — Mosaic DMA
        # slices must be lane-aligned to 128
        tid = chunk_tid[j]
        return (
            pltpu.make_async_copy(
                nodes_hbm.at[pl.ds(tid * tn, tn)],
                nodes_buf.at[slot], sem_n.at[slot]),
            pltpu.make_async_copy(
                prims_hbm.at[pl.ds(tid * (tp // 4), tp // 4)],
                prims_buf.at[slot], sem_p.at[slot]),
        )

    def collect_cond(s):
        sp, cnt = s
        return (sp > 0) & (cnt < chunk)

    def collect_body(s):
        sp, cnt = s
        raw = top_stack[sp - 1]
        tn_e = top_tn[sp - 1]
        sp = sp - 1
        is_tl = raw < 0

        @pl.when(is_tl)
        def _():
            chunk_tid[cnt] = -raw - 1
            chunk_tn[cnt] = tn_e

        cnt = cnt + jnp.where(is_tl, 1, 0)

        def interior(sp):
            node = raw
            # dense-tile fetch of the whole top node (see traverse_pallas
            # traverse_loop): one dynamic-major (8, 8) load + lane-masked
            # reductions instead of 48 scalar VMEM loads per pop
            tile = top_ref[node]
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)

            def fcol(f):
                return jnp.sum(jnp.where(lane8 == f, tile, 0.0),
                               axis=1, keepdims=True)

            f_lox, f_loy, f_loz = fcol(0), fcol(1), fcol(2)
            f_hix, f_hiy, f_hiz = fcol(3), fcol(4), fcol(5)
            for c in range(8):
                lo_x = f_lox[c:c + 1]
                lo_y = f_loy[c:c + 1]
                lo_z = f_loz[c:c + 1]
                hi_x = f_hix[c:c + 1]
                hi_y = f_hiy[c:c + 1]
                hi_z = f_hiz[c:c + 1]
                t1x = (lo_x - ox) * ix
                t2x = (hi_x - ox) * ix
                t1y = (lo_y - oy) * iy
                t2y = (hi_y - oy) * iy
                t1z = (lo_z - oz) * iz
                t2z = (hi_z - oz) * iz
                t_near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                 jnp.minimum(t1y, t2y)),
                                     jnp.minimum(t1z, t2z))
                t_far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                jnp.maximum(t1y, t2y)),
                                    jnp.maximum(t1z, t2z)) * 1.0000004
                # live cull: t_ref already holds hits from drained treelets
                hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_ref[0])
                m6 = top_ref[node, c, 6]
                m7 = top_ref[node, c, 7]
                # explicit empty-slot gate: an inverted (inf/-inf) box PASSES
                # the symmetrized slab test (min/max turns it into
                # [-inf, +inf]), so col6 == 0 must be rejected here or every
                # packet walks treelet 0 once per empty slot
                any_c = jnp.any(hit) & (m6 != 0.0)
                tn_c = jnp.min(jnp.where(hit, jnp.maximum(t_near, 0.0), _BIG))
                meta = jnp.where(m6 > 0.0, m6.astype(jnp.int32),
                                 -(m7.astype(jnp.int32)) - 1)

                @pl.when(any_c)
                def _():
                    top_stack[sp] = meta
                    top_tn[sp] = tn_c

                sp = sp + jnp.where(any_c, 1, 0)
            return sp

        sp = jax.lax.cond(is_tl, lambda s: s, interior, sp)
        return sp, cnt

    def outer_cond(s):
        sp, done = s
        return (sp > 0) & ~done

    def outer_body(s):
        sp, done = s
        sp, cnt = jax.lax.while_loop(collect_cond, collect_body,
                                     (sp, jnp.int32(0)))

        @pl.when(cnt > 0)
        def _():
            for c in copies(0, 0):
                c.start()

        def drain(j, carry):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < cnt)
            def _():
                for c in copies(j + 1, 1 - slot):
                    c.start()

            for c in copies(j, slot):
                c.wait()

            # front-to-back cull: skip the walk when this treelet's entry
            # distance is beyond every lane's current best (or, any-hit,
            # when every lane already found an occluder)
            run = chunk_tn[j] < jnp.max(t_ref[0])
            if any_hit:
                run = run & ~jnp.all(gid_ref[0] >= 0)
            walk_stack[0] = 0
            n_nodes, n_leaves, n_tests = traverse_loop(
                lambda n, c, col: nodes_buf[slot, n, c * 8 + col],
                lambda first, k, col:
                    prims_buf[slot, (first >> 2) + (k >> 2),
                              ((k & 3) << 5) + col],
                rays, t_ref, gid_ref, b1_ref, b2_ref, walk_stack,
                max_leaf=max_leaf, any_hit=any_hit,
                has_spheres=has_spheres, with_stats=with_stats,
                sp_init=jnp.where(run, 1, 0), perm_info=perm_info)
            if with_stats:
                visits_ref[0] = visits_ref[0] + n_nodes
                leaves_ref[0] = leaves_ref[0] + n_leaves
                tests_ref[0] = tests_ref[0] + n_tests
            return carry

        jax.lax.fori_loop(0, cnt, drain, 0)
        if any_hit:
            done = jnp.all(gid_ref[0] >= 0)
        return sp, done

    jax.lax.while_loop(outer_cond, outer_body,
                       (jnp.int32(1), jnp.bool_(False)))


@functools.partial(jax.jit, static_argnames=(
    "tn", "tp", "chunk", "max_leaf", "any_hit", "has_spheres", "interpret",
    "with_stats"))
def _traverse_unified(top_tiles, tl_nodes, tl_prims,
                      ox, oy, oz, dx, dy, dz, ix, iy, iz,
                      kx, ky, kz, sx, sy, sz, tmax,
                      tn: int, tp: int, chunk: int, max_leaf: int,
                      any_hit: bool, has_spheres: bool,
                      interpret: bool = False, with_stats: bool = False):
    npk = ox.shape[0]
    shp = (npk, ROWS, 128)
    ray_spec = pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    out_shapes = [
        jax.ShapeDtypeStruct(shp, jnp.float32),  # t
        jax.ShapeDtypeStruct(shp, jnp.int32),    # gid
        jax.ShapeDtypeStruct(shp, jnp.float32),  # b1
        jax.ShapeDtypeStruct(shp, jnp.float32),  # b2
        jax.ShapeDtypeStruct(shp, jnp.int32),    # node visits
        jax.ShapeDtypeStruct(shp, jnp.int32),    # leaf visits
        jax.ShapeDtypeStruct(shp, jnp.int32),    # prim tests
    ]
    kern = functools.partial(_kernel_unified, tn=tn, tp=tp, chunk=chunk,
                             max_leaf=max_leaf, any_hit=any_hit,
                             has_spheres=has_spheres, with_stats=with_stats)
    return pl.pallas_call(
        kern,
        grid=(npk,),
        in_specs=[full, hbm, hbm] + [ray_spec] * 16,
        out_specs=[ray_spec] * 7,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, tn, 128), jnp.float32),
            pltpu.VMEM((2, tp // 4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SMEM((STACK,), jnp.float32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.float32),
            pltpu.SMEM((STACK,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # see traverse_pallas: operands are stack-allocated in scoped
            # VMEM when the kernel sits inside the bounce fori_loop
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(top_tiles, tl_nodes, tl_prims,
      ox, oy, oz, dx, dy, dz, ix, iy, iz, kx, ky, kz, sx, sy, sz, tmax)


# ------------------------------ driver --------------------------------------


def intersect_packets_streamed(ds, st, o, d, tmax, any_hit=False,
                               interpret=False, with_stats=True,
                               chunk=CHUNK):
    """Drop-in two-level version of traverse_pallas.intersect_packets for
    scenes whose tables exceed the single-level VMEM budget. Same (Hit,
    TraversalStats) contract. The unified collect/drain kernel has no
    per-packet treelet-list capacity, so stats.truncated is identically
    zero — every treelet any live ray enters is walked."""
    from tpupt.accel.traverse import Hit, TraversalStats
    from tpupt.core.vecmath import ray_inv_d
    from tpupt.shapes.triangle import ray_permutation

    assert st.two_level, "scene was uploaded without treelet tables"
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
        return x.astype(dtype).reshape(npk, ROWS, 128)

    t, gid, b1, b2, visits, leaves, tests = _traverse_unified(
        ds.top_tiles, ds.tl_nodes, ds.tl_prims,
        pk(o[:, 0]), pk(o[:, 1]), pk(o[:, 2]),
        pk(d[:, 0]), pk(d[:, 1]), pk(d[:, 2]),
        pk(inv_d[:, 0]), pk(inv_d[:, 1]), pk(inv_d[:, 2]),
        pk(kx, jnp.int32), pk(ky, jnp.int32), pk(kz, jnp.int32),
        pk(sx), pk(sy), pk(sz), pk(tmax),
        tn=st.tl_tn, tp=st.tl_tp, chunk=chunk, max_leaf=st.max_leaf,
        any_hit=any_hit, has_spheres=st.n_spheres > 0,
        interpret=interpret, with_stats=with_stats)

    t = t.reshape(-1)[:n]
    gid = gid.reshape(-1)[:n]
    b1 = b1.reshape(-1)[:n]
    b2 = b2.reshape(-1)[:n]
    visits = visits.reshape(-1)[:n]
    leaves = leaves.reshape(-1)[:n]
    tests = tests.reshape(-1)[:n]
    trunc = jnp.zeros_like(visits)

    if st.n_spheres > 0:
        sid = jnp.clip(gid - st.n_tris, 0, max(st.n_spheres - 1, 0))
        w2o = ds.sph_w2o[sid]
        o_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], o[:n]) + w2o[:, :3, 3]
        d_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], d[:n])
        p_obj = o_obj + t[:, None] * d_obj
    else:
        p_obj = jnp.zeros((n, 3))

    hit = Hit(valid=gid >= 0, t=t, prim=gid, b1=b1, b2=b2, p_obj=p_obj)
    stats = TraversalStats(visits, leaves, tests, trunc)
    return hit, stats
