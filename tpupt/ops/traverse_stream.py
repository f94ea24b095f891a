"""Two-level HBM-streamed Pallas traversal — size-oblivious scenes.

Companion to ops/traverse_pallas.py (which requires the whole scene in
VMEM). Reference parity target: bvh.cpp:354-397 traverses arbitrary scene
sizes; here the wide BVH is split by accel/treelets.py into a VMEM-resident
top tree plus fixed-size treelet blocks living in HBM, and traversal runs
in two phases:

  phase 1 (one grid step per 1024-ray packet): walk the top tree, slab-test
  children against the whole packet, and record every treelet whose bounds
  any live ray enters, with the packet's entry distance. Output: per-packet
  treelet lists (capacity TREELET_LIST_MAX; overflow is COUNTED, never
  silent — the farthest treelets are dropped after the front-to-back sort).

  phase 2 (grid = packets): each grid step owns ONE packet and loops over
  its front-to-back-sorted treelet list, double-buffering each treelet's
  node/prim blocks HBM->VMEM with explicit async DMA (the j+1 copy is
  issued before the j walk, so DMA rides under traversal compute). Hit
  state (t/gid/b1/b2) lives in the packet's VMEM output tiles for the
  whole step. A treelet is skipped (zero traversal trips — its DMA still
  lands but costs ~1us) when its entry distance exceeds every live ray's
  current-best t, or (any-hit) when every lane already hit. Per-packet
  work is therefore proportional to the packet's ACTUAL treelet count —
  the earlier design gridded over static (packet, pair-slot) products and
  paid a fixed step cost for every unused slot, which dominated wall-clock
  at large packet counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupt.accel.treelets import TREELET_LIST_MAX
from tpupt.ops.traverse_pallas import STACK, traverse_loop

_BIG = 3.0e38
# streamed packets are 1024 rays like the single-level kernel (measured:
# 256-ray packets LOSE ~2.5x on incoherent bounces — per-treelet node
# unions shrink sublinearly in packet size, so 4x more treelet walks with
# their fixed DMA-issue/loop costs dominate)
ROWS = 8
PACK = ROWS * 128


# --------------------------- phase 1: binning ------------------------------


def _kernel_top(nodes_ref,
                ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref, tmax_ref,
                tids_ref, tnear_ref, cnt_ref, ovf_ref,
                stack_ref, tstack_ref, *, list_max: int):
    """Bin one ray packet to the treelets it enters.

    Top-tile meta (treelets.py): col6 > 0 interior id; col6 == 0 empty;
    col6 < 0 treelet ref with tid = col7. The scalar stack carries
    -(tid+1) for treelet refs, plus a parallel f32 stack of packet entry
    distances (min t_near over entering rays)."""
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    ix, iy, iz = ix_ref[0], iy_ref[0], iz_ref[0]
    tmax = tmax_ref[0]

    stack_ref[0] = 0
    tstack_ref[0] = 0.0

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, cnt, ovf = state
        raw = stack_ref[sp - 1]
        tn = tstack_ref[sp - 1]
        sp = sp - 1
        is_tl = raw < 0
        room = cnt < list_max

        @pl.when(is_tl & room)
        def _():
            tids_ref[0, 0, cnt] = -raw - 1
            tnear_ref[0, 0, cnt] = tn

        cnt = cnt + jnp.where(is_tl & room, 1, 0)
        ovf = ovf + jnp.where(is_tl & ~room, 1, 0)

        def interior(sp):
            node = raw
            for c in range(8):
                lo_x = nodes_ref[node, c, 0]
                lo_y = nodes_ref[node, c, 1]
                lo_z = nodes_ref[node, c, 2]
                hi_x = nodes_ref[node, c, 3]
                hi_y = nodes_ref[node, c, 4]
                hi_z = nodes_ref[node, c, 5]
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
                hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < tmax)
                any_c = jnp.any(hit)
                tn_c = jnp.min(jnp.where(hit, jnp.maximum(t_near, 0.0), _BIG))
                m6 = nodes_ref[node, c, 6]
                m7 = nodes_ref[node, c, 7]
                meta = jnp.where(m6 > 0.0, m6.astype(jnp.int32),
                                 -(m7.astype(jnp.int32)) - 1)

                @pl.when(any_c)
                def _():
                    stack_ref[sp] = meta
                    tstack_ref[sp] = tn_c

                sp = sp + jnp.where(any_c, 1, 0)
            return sp

        sp = jax.lax.cond(is_tl, lambda s: s, interior, sp)
        return sp, cnt, ovf

    zero = jnp.int32(0)
    _, cnt, ovf = jax.lax.while_loop(cond, body, (jnp.int32(1), zero, zero))
    cnt_ref[0, 0, 0] = cnt
    ovf_ref[0, 0, 0] = ovf


@functools.partial(jax.jit, static_argnames=("list_max", "interpret"))
def _bin_packets(top_tiles, ox, oy, oz, ix, iy, iz, tmax,
                 list_max: int = TREELET_LIST_MAX, interpret: bool = False):
    npk = ox.shape[0]
    ray_spec = pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # singleton middle axis keeps Mosaic's last-two-dims block rule happy
    # (block dims equal the array dims there)
    list_spec = pl.BlockSpec((1, 1, list_max), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    one_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    kern = functools.partial(_kernel_top, list_max=list_max)
    tids, tnear, cnt, ovf = pl.pallas_call(
        kern,
        grid=(npk,),
        in_specs=[full] + [ray_spec] * 7,
        out_specs=[list_spec, list_spec, one_spec, one_spec],
        out_shape=[
            jax.ShapeDtypeStruct((npk, 1, list_max), jnp.int32),
            jax.ShapeDtypeStruct((npk, 1, list_max), jnp.float32),
            jax.ShapeDtypeStruct((npk, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((npk, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.float32)],
        interpret=interpret,
    )(top_tiles, ox, oy, oz, ix, iy, iz, tmax)
    return (tids[:, 0], tnear[:, 0], cnt[:, 0, 0], ovf[:, 0, 0])


# ------------------------ phase 2: streamed pairs ---------------------------


def _kernel_packet(tids_ref, tnear_ref, cnt_ref,
                   nodes_hbm, prims_hbm,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   ix_ref, iy_ref, iz_ref,
                   kx_ref, ky_ref, kz_ref, sx_ref, sy_ref, sz_ref,
                   tmax_ref,
                   t_ref, gid_ref, b1_ref, b2_ref, visits_ref, leaves_ref,
                   tests_ref,
                   nodes_buf, prims_buf, sem_n, sem_p, stack_ref,
                   *, tn: int, tp: int, max_leaf: int, any_hit: bool,
                   has_spheres: bool, with_stats: bool):
    """One PACKET per grid step; the packet's (sorted, front-to-back)
    treelet list is walked by an inner loop that double-buffers each
    treelet's node/prim blocks HBM->VMEM with explicit async DMA: the next
    treelet's copy is issued before the current one's walk, so the DMA
    rides under traversal compute. No dummy grid steps — per-packet work is
    exactly proportional to its treelet count (the previous pair-grid
    design paid a fixed step cost for every unused static pair slot, which
    dominated wall-clock at ~24x the mean pair count)."""
    cnt = cnt_ref[0, 0, 0]

    t_ref[0] = tmax_ref[0]
    gid_ref[0] = jnp.full((ROWS, 128), -1, jnp.int32)
    b1_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    b2_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    visits_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    leaves_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    tests_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)

    def copies(j, slot):
        # blocks are 128-lane rows (nodes: 64 data floats + 64 pad;
        # prims: 4 rows packed with leaf starts 4-aligned) — Mosaic DMA
        # slices must be lane-aligned to 128, and scalar VMEM loads need
        # static lane offsets
        tid = tids_ref[0, 0, j]
        return (
            pltpu.make_async_copy(
                nodes_hbm.at[pl.ds(tid * tn, tn)],
                nodes_buf.at[slot], sem_n.at[slot]),
            pltpu.make_async_copy(
                prims_hbm.at[pl.ds(tid * (tp // 4), tp // 4)],
                prims_buf.at[slot], sem_p.at[slot]),
        )

    @pl.when(cnt > 0)
    def _():
        for c in copies(0, 0):
            c.start()

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

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < cnt)
        def _():
            for c in copies(j + 1, 1 - slot):
                c.start()

        for c in copies(j, slot):
            c.wait()

        # front-to-back cull: skip the walk when this treelet's entry
        # distance is beyond every lane's current best (or every lane hit)
        run = tnear_ref[0, 0, j] < jnp.max(t_ref[0])
        if any_hit:
            run = run & ~jnp.all(gid_ref[0] >= 0)
        stack_ref[0] = 0
        n_nodes, n_leaves, n_tests = traverse_loop(
            lambda n, c, col: nodes_buf[slot, n, c * 8 + col],
            lambda first, k, col:
                prims_buf[slot, (first >> 2) + (k >> 2),
                          ((k & 3) << 5) + col],
            rays, t_ref, gid_ref, b1_ref, b2_ref, stack_ref,
            max_leaf=max_leaf, any_hit=any_hit, has_spheres=has_spheres,
            with_stats=with_stats, sp_init=jnp.where(run, 1, 0))
        if with_stats:
            visits_ref[0] = visits_ref[0] + n_nodes
            leaves_ref[0] = leaves_ref[0] + n_leaves
            tests_ref[0] = tests_ref[0] + n_tests
        return carry

    jax.lax.fori_loop(0, cnt, body, 0)


@functools.partial(jax.jit, static_argnames=(
    "tn", "tp", "max_leaf", "any_hit", "has_spheres", "interpret",
    "with_stats", "list_max"))
def _traverse_packets(tids, tnear, cnt,
                      tl_nodes, tl_prims,
                      ox, oy, oz, dx, dy, dz, ix, iy, iz,
                      kx, ky, kz, sx, sy, sz, tmax,
                      tn: int, tp: int, max_leaf: int, any_hit: bool,
                      has_spheres: bool, list_max: int,
                      interpret: bool = False, with_stats: bool = False):
    npk = ox.shape[0]
    shp = (npk, ROWS, 128)
    ray_spec = pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    list_spec = pl.BlockSpec((1, 1, list_max), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    one_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
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
    kern = functools.partial(_kernel_packet, tn=tn, tp=tp,
                             max_leaf=max_leaf, any_hit=any_hit,
                             has_spheres=has_spheres, with_stats=with_stats)
    return pl.pallas_call(
        kern,
        grid=(npk,),
        in_specs=[list_spec, list_spec, one_spec, hbm, hbm]
        + [ray_spec] * 16,
        out_specs=[ray_spec] * 7,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, tn, 128), jnp.float32),
            pltpu.VMEM((2, tp // 4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((STACK,), jnp.int32),
        ],
        interpret=interpret,
    )(tids, tnear, cnt, tl_nodes, tl_prims,
      ox, oy, oz, dx, dy, dz, ix, iy, iz, kx, ky, kz, sx, sy, sz, tmax)


# ------------------------------ driver --------------------------------------


def intersect_packets_streamed(ds, st, o, d, tmax, any_hit=False,
                               interpret=False, with_stats=True,
                               list_max=TREELET_LIST_MAX):
    """Drop-in two-level version of traverse_pallas.intersect_packets for
    scenes whose tables exceed the single-level VMEM budget. Same (Hit,
    TraversalStats) contract; stats.truncated carries the per-ray count of
    treelets dropped by phase-1 list overflow (farthest-first after the
    front-to-back sort; nonzero truncation means a possible missed hit and
    is surfaced, never silent)."""
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

    pox, poy, poz = pk(o[:, 0]), pk(o[:, 1]), pk(o[:, 2])
    pix, piy, piz = pk(inv_d[:, 0]), pk(inv_d[:, 1]), pk(inv_d[:, 2])
    ptm = pk(tmax)

    tids, tnear, cnt, ovf = _bin_packets(
        ds.top_tiles, pox, poy, poz, pix, piy, piz, ptm,
        list_max=list_max, interpret=interpret)

    # front-to-back sort per packet
    slot = jnp.arange(list_max)[None, :]
    valid = slot < cnt[:, None]
    order = jnp.argsort(jnp.where(valid, tnear, jnp.inf), axis=1)
    tids_s = jnp.take_along_axis(tids, order, 1)
    tnear_s = jnp.take_along_axis(tnear, order, 1)
    tids_s = jnp.where(valid, jnp.clip(tids_s, 0, st.n_treelets - 1), 0)
    tnear_s = jnp.where(valid, tnear_s, _BIG)

    t, gid, b1, b2, visits, leaves, tests = _traverse_packets(
        tids_s[:, None, :], tnear_s[:, None, :],
        jnp.minimum(cnt, list_max)[:, None, None],
        ds.tl_nodes, ds.tl_prims,
        pox, poy, poz,
        pk(d[:, 0]), pk(d[:, 1]), pk(d[:, 2]),
        pix, piy, piz,
        pk(kx, jnp.int32), pk(ky, jnp.int32), pk(kz, jnp.int32),
        pk(sx), pk(sy), pk(sz), ptm,
        tn=st.tl_tn, tp=st.tl_tp, max_leaf=st.max_leaf, any_hit=any_hit,
        has_spheres=st.n_spheres > 0, list_max=list_max,
        interpret=interpret, with_stats=with_stats)

    t = t.reshape(-1)[:n]
    gid = gid.reshape(-1)[:n]
    b1 = b1.reshape(-1)[:n]
    b2 = b2.reshape(-1)[:n]
    visits = visits.reshape(-1)[:n]
    leaves = leaves.reshape(-1)[:n]
    tests = tests.reshape(-1)[:n]
    # truncation = phase-1 list overflow (farthest-first after the sort);
    # nonzero means a possible missed hit and is surfaced, never silent
    trunc = jnp.repeat(ovf, PACK)[:n]

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
