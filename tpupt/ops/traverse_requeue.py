"""Treelet-major ray-requeue traversal — the incoherent-bounce engine for
scenes larger than VMEM.

Why: the packet-streamed kernel (ops/traverse_stream.py) walks each treelet
with ALL 1024 lanes of a ray packet, so an incoherent packet pays for the
UNION of its rays' node sets — measured 88 ms per 131k diffuse-bounce rays
on the 1M-triangle museum vs 27 ms coherent, with DMA only ~4% of that.
The reference's per-ray stacks (bvh.cpp:354) have no such union cost but
don't vectorize.

The TPU answer is to re-queue rays by treelet between walks:

  phase 1   one top-tree walk per packet emits a PER-RAY list of up to
            R_LIST (treelet id, entry t) pairs (kernel: _kernel_top_perlane).
  rounds    up to ROUNDS times: every unfinished ray nominates its nearest
            unvisited treelet (cursor into its tnear-sorted list, culled by
            its current best hit t); rays are argsorted by (treelet id,
            direction octant) — 0.03 ms on-chip for 131k keys — and walked
            in 1024-lane chunks whose lanes ALL want the same treelet
            (chunks are cut into <= SEGS same-treelet segments; lanes of
            other segments are parked by setting their best-t to -inf, so
            they neither update hits nor force node descents). A treelet's
            node/prim blocks are DMA'd once per residency change, not once
            per packet. Results scatter-min back by ray id, the cull
            tightens, and most rays finish in 1-2 rounds.

Early termination comes from the cull itself: a ray whose next-nearest
treelet lies beyond its current best hit never re-enters a chunk. Any
pairs still live after ROUNDS rounds are counted in stats.truncated
(possible missed hit, surfaced per the no-silent-truncation rule), as are
per-ray phase-1 list overflows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupt.ops.traverse_pallas import STACK, traverse_loop

_BIG = 3.0e38
ROWS = 8
PACK = ROWS * 128
R_LIST = 16   # per-ray treelet-list capacity (phase 1)
SEGS = 8      # max distinct treelets per 1024-lane chunk per round


# ----------------------- phase 1: per-ray binning ---------------------------


def _kernel_top_perlane(nodes_ref,
                        ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
                        tmax_ref,
                        tid_ref, tn_ref, ovf_ref,
                        stack_ref, *, r_list: int):
    """Walk the VMEM top tree once per packet and record, PER LANE, every
    treelet whose bounds that lane's ray enters (cf. _kernel_top which
    records one packet-level list). Top-tile meta: col6 > 0 interior id;
    col6 == 0 empty; col6 < 0 treelet ref with tid = col7."""
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    ix, iy, iz = ix_ref[0], iy_ref[0], iz_ref[0]
    tmax = tmax_ref[0]

    for r in range(r_list):
        tid_ref[0, r] = jnp.full((ROWS, 128), -1, jnp.int32)
        tn_ref[0, r] = jnp.full((ROWS, 128), _BIG, jnp.float32)
    ovf_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    stack_ref[0] = 0

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, cnt = state
        node = stack_ref[sp - 1]
        sp = sp - 1
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
            m6 = nodes_ref[node, c, 6]
            m7 = nodes_ref[node, c, 7]
            is_tl = m6 <= 0.0  # empties never pass the slab test

            @pl.when(any_c & is_tl)
            def _():
                tid = m7.astype(jnp.int32)
                tnc = jnp.maximum(t_near, 0.0)
                for r in range(r_list):
                    sel = hit & (cnt == r)
                    tid_ref[0, r] = jnp.where(sel, tid, tid_ref[0, r])
                    tn_ref[0, r] = jnp.where(sel, tnc, tn_ref[0, r])
                ovf_ref[0] = ovf_ref[0] + (hit & (cnt >= r_list)).astype(
                    jnp.int32)

            @pl.when(any_c & ~is_tl)
            def _():
                stack_ref[sp] = m6.astype(jnp.int32)

            cnt = cnt + jnp.where(any_c & is_tl, hit.astype(jnp.int32), 0)
            sp = sp + jnp.where(any_c & ~is_tl, 1, 0)
        return sp, cnt

    jax.lax.while_loop(cond, body,
                       (jnp.int32(1), jnp.zeros((ROWS, 128), jnp.int32)))


@functools.partial(jax.jit, static_argnames=("r_list", "interpret"))
def _bin_rays(top_tiles, ox, oy, oz, ix, iy, iz, tmax,
              r_list: int = R_LIST, interpret: bool = False):
    """Per-ray treelet lists: (tid (N, R) i32 | -1, tnear (N, R) f32 | BIG,
    ovf (N,) i32) for N = npk * PACK rays."""
    npk = ox.shape[0]
    ray_spec = pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    list_spec = pl.BlockSpec((1, r_list, ROWS, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_top_perlane, r_list=r_list)
    tid, tn, ovf = pl.pallas_call(
        kern,
        grid=(npk,),
        in_specs=[full] + [ray_spec] * 7,
        out_specs=[list_spec, list_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((npk, r_list, ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((npk, r_list, ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((npk, ROWS, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
    )(top_tiles, ox, oy, oz, ix, iy, iz, tmax)
    n = npk * PACK
    tid = tid.transpose(0, 2, 3, 1).reshape(n, r_list)
    tn = tn.transpose(0, 2, 3, 1).reshape(n, r_list)
    return tid, tn, ovf.reshape(n)


# ------------------------- round kernel: chunk walk --------------------------


def _kernel_chunk(seg_tid_ref, seg_start_ref, seg_end_ref,
                  nodes_hbm, prims_hbm,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  ix_ref, iy_ref, iz_ref,
                  kx_ref, ky_ref, kz_ref, sx_ref, sy_ref, sz_ref,
                  tin_ref,
                  t_ref, gid_ref, b1_ref, b2_ref, visits_ref, leaves_ref,
                  tests_ref,
                  nodes_buf, prims_buf, sem_n, sem_p, stack_ref, last_ref,
                  *, tn: int, tp: int, max_leaf: int, any_hit: bool,
                  has_spheres: bool, with_stats: bool, segs: int,
                  always_copy: bool):
    """Walk one 1024-lane chunk through its <= SEGS same-treelet segments.
    The treelet's node/prim blocks stay VMEM-resident across grid steps
    (last_ref tracks residency), so consecutive chunks of one big treelet
    pay zero extra DMA. Lanes outside the active segment are parked with
    best-t = -BIG, which kills both their hit updates and their influence
    on the packet's node descents (traverse_loop descends on ANY lane)."""
    t_ref[0] = tin_ref[0]
    gid_ref[0] = jnp.full((ROWS, 128), -1, jnp.int32)
    b1_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    b2_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    visits_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    leaves_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    tests_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        last_ref[0] = -1

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

    lane = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1))

    for s in range(segs):
        tid = seg_tid_ref[0, 0, s]
        run = tid >= 0
        # interpret mode may not persist scratch across grid steps, so the
        # residency skip is compiled out there (copies are cheap on CPU)
        stale = True if always_copy else (tid != last_ref[0])

        @pl.when(run & stale)
        def _():
            last_ref[0] = tid
            cn = pltpu.make_async_copy(
                nodes_hbm.at[pl.ds(tid * tn, tn)], nodes_buf, sem_n)
            cp = pltpu.make_async_copy(
                prims_hbm.at[pl.ds(tid * (tp // 4), tp // 4)],
                prims_buf, sem_p)
            cn.start()
            cp.start()
            cn.wait()
            cp.wait()

        @pl.when(run)
        def _():
            start = seg_start_ref[0, 0, s]
            end = seg_end_ref[0, 0, s]
            in_seg = (lane >= start) & (lane < end)
            saved = t_ref[0]
            t_ref[0] = jnp.where(in_seg, saved, -_BIG)
            stack_ref[0] = 0
            n_nodes, n_leaves, n_tests = traverse_loop(
                lambda n, c, col: nodes_buf[n, c * 8 + col],
                lambda first, k, col:
                    prims_buf[(first >> 2) + (k >> 2), ((k & 3) << 5) + col],
                rays, t_ref, gid_ref, b1_ref, b2_ref, stack_ref,
                max_leaf=max_leaf, any_hit=any_hit,
                has_spheres=has_spheres, with_stats=with_stats,
                sp_init=jnp.int32(1))
            t_ref[0] = jnp.where(in_seg, t_ref[0], saved)
            if with_stats:
                visits_ref[0] = visits_ref[0] + n_nodes
                leaves_ref[0] = leaves_ref[0] + n_leaves
                tests_ref[0] = tests_ref[0] + n_tests


@functools.partial(jax.jit, static_argnames=(
    "tn", "tp", "max_leaf", "any_hit", "has_spheres", "segs", "interpret",
    "with_stats"))
def _walk_chunks(seg_tid, seg_start, seg_end, tl_nodes, tl_prims,
                 ox, oy, oz, dx, dy, dz, ix, iy, iz,
                 kx, ky, kz, sx, sy, sz, tin,
                 tn: int, tp: int, max_leaf: int, any_hit: bool,
                 has_spheres: bool, segs: int,
                 interpret: bool = False, with_stats: bool = False):
    nch = ox.shape[0]
    shp = (nch, ROWS, 128)
    ray_spec = pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((1, 1, segs), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    kern = functools.partial(_kernel_chunk, tn=tn, tp=tp, max_leaf=max_leaf,
                             any_hit=any_hit, has_spheres=has_spheres,
                             with_stats=with_stats, segs=segs,
                             always_copy=interpret)
    return pl.pallas_call(
        kern,
        grid=(nch,),
        in_specs=[seg_spec] * 3 + [hbm, hbm] + [ray_spec] * 16,
        out_specs=[ray_spec] * 7,
        out_shape=[
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 128), jnp.float32),
            pltpu.VMEM((tp // 4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(seg_tid[:, None, :], seg_start[:, None, :], seg_end[:, None, :],
      tl_nodes, tl_prims,
      ox, oy, oz, dx, dy, dz, ix, iy, iz, kx, ky, kz, sx, sy, sz, tin)


# ------------------------------- driver --------------------------------------


def intersect_packets_requeue(ds, st, o, d, tmax, any_hit=False,
                              interpret=False, with_stats=True,
                              r_list=R_LIST, rounds=None, segs=SEGS):
    """Drop-in two-level traversal with treelet-major re-queueing. Same
    (Hit, TraversalStats) contract as intersect_packets_streamed. Rounds
    run under a lax.while_loop that exits as soon as no ray has a live
    (un-culled, unvisited) treelet left, so converged waves cost nothing;
    `rounds` (default r_list + 4) only caps pathological segment deferral,
    with the remainder surfaced in stats.truncated."""
    from tpupt.accel.traverse import Hit, TraversalStats
    from tpupt.core.vecmath import ray_inv_d
    from tpupt.shapes.triangle import ray_permutation

    assert st.two_level, "scene was uploaded without treelet tables"
    i32 = jnp.int32
    n0 = o.shape[0]
    n_pad = (-n0) % PACK
    if n_pad:
        o = jnp.concatenate([o, jnp.ones((n_pad, 3))])
        d = jnp.concatenate([d, jnp.ones((n_pad, 3))])
        tmax = jnp.concatenate([tmax, jnp.zeros(n_pad)])
    n = o.shape[0]
    npk = n // PACK
    nch = npk  # one-pair-per-ray rounds: chunks == packets

    kx, ky, kz, sx, sy, sz = ray_permutation(d)
    inv_d = ray_inv_d(d)

    def pk(x, dtype=jnp.float32):
        return x.astype(dtype).reshape(npk, ROWS, 128)

    tid_l, tn_l, ovf = _bin_rays(
        ds.top_tiles, pk(o[:, 0]), pk(o[:, 1]), pk(o[:, 2]),
        pk(inv_d[:, 0]), pk(inv_d[:, 1]), pk(inv_d[:, 2]), pk(tmax),
        r_list=r_list, interpret=interpret)
    # nearest-first per-ray lists (empties carry key BIG -> sorted last)
    tn_l, tid_l = jax.lax.sort_key_val(tn_l, tid_l, dimension=1)

    octant = ((d[:, 0] < 0).astype(i32) + 2 * (d[:, 1] < 0).astype(i32)
              + 4 * (d[:, 2] < 0).astype(i32))
    sent = i32(st.n_treelets) * 8 + 8  # sort-key sentinel: "no work"
    lane_in_chunk = jnp.tile(jnp.arange(PACK, dtype=i32), nch)
    rows_idx = jnp.repeat(jnp.arange(nch, dtype=i32), PACK).reshape(nch, PACK)
    arange_n = jnp.arange(n, dtype=i32)

    if rounds is None:
        rounds = r_list + 4

    def _cursor_state(cursor, t_best):
        cur = jnp.minimum(cursor, r_list - 1)
        tid_c = jnp.take_along_axis(tid_l, cur[:, None], 1)[:, 0]
        tn_c = jnp.take_along_axis(tn_l, cur[:, None], 1)[:, 0]
        live = (cursor < r_list) & (tid_c >= 0) & (tn_c < t_best)
        return tid_c, live

    def round_cond(s):
        i, t_best, gid, b1, b2, cursor, nv, nl, nt = s
        _, live = _cursor_state(cursor, t_best)
        return jnp.any(live) & (i < rounds)

    def round_body(s):
        i, t_best, gid, b1, b2, cursor, nv_acc, nl_acc, nt_acc = s
        tid_c, live = _cursor_state(cursor, t_best)
        key = jnp.where(live, tid_c * 8 + octant, sent)
        perm = jnp.argsort(key)
        inv = jnp.zeros(n, i32).at[perm].set(arange_n)

        stile = jnp.where(key[perm] < sent, key[perm] >> 3, -1) \
            .reshape(nch, PACK)
        prev = jnp.concatenate(
            [jnp.full((nch, 1), -2, i32), stile[:, :-1]], 1)
        newseg = stile != prev
        seg_id = jnp.cumsum(newseg.astype(i32), 1) - 1
        in_cap = (seg_id < segs) & (stile >= 0)
        sc = jnp.minimum(seg_id, segs - 1)
        lane2 = lane_in_chunk.reshape(nch, PACK)
        seg_tid = jnp.full((nch, segs), -1, i32).at[rows_idx, sc].max(
            jnp.where(in_cap, stile, -1))
        seg_start = jnp.full((nch, segs), PACK, i32).at[rows_idx, sc].min(
            jnp.where(in_cap, lane2, PACK))
        seg_end = jnp.zeros((nch, segs), i32).at[rows_idx, sc].max(
            jnp.where(in_cap, lane2 + 1, 0))

        def g(x, dtype=jnp.float32):
            return x[perm].astype(dtype).reshape(nch, ROWS, 128)

        t_o, gid_o, b1_o, b2_o, nv, nl, nt = _walk_chunks(
            seg_tid, seg_start, seg_end, ds.tl_nodes, ds.tl_prims,
            g(o[:, 0]), g(o[:, 1]), g(o[:, 2]),
            g(d[:, 0]), g(d[:, 1]), g(d[:, 2]),
            g(inv_d[:, 0]), g(inv_d[:, 1]), g(inv_d[:, 2]),
            g(kx, i32), g(ky, i32), g(kz, i32),
            g(sx), g(sy), g(sz), g(t_best),
            tn=st.tl_tn, tp=st.tl_tp, max_leaf=st.max_leaf, any_hit=any_hit,
            has_spheres=st.n_spheres > 0, segs=segs, interpret=interpret,
            with_stats=with_stats)

        t_n = t_o.reshape(-1)[inv]
        gid_n = gid_o.reshape(-1)[inv]
        win = (gid_n >= 0) & (t_n < t_best)
        t_best = jnp.where(win, t_n, t_best)
        gid = jnp.where(win, gid_n, gid)
        b1 = jnp.where(win, b1_o.reshape(-1)[inv], b1)
        b2 = jnp.where(win, b2_o.reshape(-1)[inv], b2)
        if any_hit:
            # park occluded rays: every remaining treelet fails tn < -1
            t_best = jnp.where(gid >= 0, -1.0, t_best)
        if with_stats:
            nv_acc = nv_acc + nv.reshape(-1)[inv]
            nl_acc = nl_acc + nl.reshape(-1)[inv]
            nt_acc = nt_acc + nt.reshape(-1)[inv]
        processed = in_cap.reshape(-1)[inv] & live
        cursor = cursor + processed.astype(i32)
        return i + 1, t_best, gid, b1, b2, cursor, nv_acc, nl_acc, nt_acc

    zf = jnp.zeros(n, jnp.float32)
    zi = jnp.zeros(n, i32)
    (_, t_best, gid, b1, b2, cursor, nv_acc, nl_acc, nt_acc) = \
        jax.lax.while_loop(round_cond, round_body,
                           (jnp.int32(0), jnp.asarray(tmax, jnp.float32),
                            jnp.full(n, -1, i32), zf, zf, zi, zi, zi, zi))

    # leftovers after ROUNDS rounds = possible missed hits, counted
    slot = jnp.arange(r_list, dtype=i32)[None, :]
    rem = ((slot >= cursor[:, None]) & (tid_l >= 0)
           & (tn_l < t_best[:, None])).sum(1).astype(i32)
    trunc = (rem + ovf)[:n0]

    t = t_best[:n0]
    gid = gid[:n0]
    b1 = b1[:n0]
    b2 = b2[:n0]
    if any_hit:
        t = jnp.where(gid >= 0, jnp.zeros_like(t), t)

    if st.n_spheres > 0:
        sid = jnp.clip(gid - st.n_tris, 0, max(st.n_spheres - 1, 0))
        w2o = ds.sph_w2o[sid]
        o_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], o[:n0]) \
            + w2o[:, :3, 3]
        d_obj = jnp.einsum("nij,nj->ni", w2o[:, :3, :3], d[:n0])
        p_obj = o_obj + t[:, None] * d_obj
    else:
        p_obj = jnp.zeros((n0, 3))

    hit = Hit(valid=gid >= 0, t=t, prim=gid, b1=b1, b2=b2, p_obj=p_obj)
    stats = TraversalStats(nv_acc[:n0], nl_acc[:n0], nt_acc[:n0], trunc)
    return hit, stats
