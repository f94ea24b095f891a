"""Treelet-major pair traversal — the incoherent-bounce engine for scenes
larger than VMEM.

Why: the unified streamed kernel (ops/traverse_stream.py) walks each
treelet with ALL 1024 lanes of a ray packet, so an incoherent packet pays
for the UNION of its rays' node sets inside every treelet it touches —
measured ~3.8k prim tests per bounce ray on the 1M-triangle museum. The
reference's per-ray stacks (bvh.cpp:354) have no union cost but don't
vectorize.

The TPU answer is to decompose traversal into (ray, treelet) PAIRS and
re-group the pairs by treelet:

  phase 1   one top-tree walk per packet emits a PER-RAY list of up to
            R_LIST (treelet id, entry t) pairs, nearest-first
            (kernel: _kernel_top_perlane).
  pass 0    every ray's nearest <= 2 treelets are walked: all live pairs
            are argsorted by (treelet id, direction octant) — on-chip
            milliseconds for millions of keys — and cut into 1024-lane
            chunks whose lanes all want the same treelet (<= SEGS
            same-treelet segments per chunk; lanes of other segments are
            parked by setting their best-t to -inf, so they neither update
            hits nor force node descents). A treelet's node/prim blocks
            are DMA'd once per residency change, not once per packet.
            Results scatter-min back by ray id.
  pass 1-2  the remaining pairs, CULLED by each ray's current best t
            (pass 0 established it from the nearest treelets, so far
            treelets usually fail `tnear < t` and never enter a chunk),
            are walked the same way. Pass 2 exists only to catch pairs a
            pass deferred because a chunk exceeded SEGS distinct treelets
            (rare after sorting); anything still live after it is counted
            in stats.truncated.
  fallback  rays whose phase-1 list overflowed R_LIST (ovf > 0) are
            re-traced exactly through the unified streamed kernel (which
            has no list capacity) and take their whole result from it —
            so truncation never loses hits.

Inside a same-treelet chunk the walked node set is the union over ~1024
rays that all chose that treelet, so leaf tests amortize across the wave
instead of multiplying per packet.
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
SEGS = 16     # max distinct treelets per 1024-lane chunk per pass
WAVE0 = 2     # nearest treelets walked in pass 0 (establishes the cull t)


# ----------------------- phase 1: per-ray binning ---------------------------


def _kernel_top_perlane(nodes_ref,
                        ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
                        tmax_ref,
                        tid_ref, tn_ref, ovf_ref,
                        stack_ref, *, r_list: int):
    """Walk the VMEM top tree once per packet and record, PER LANE, every
    treelet whose bounds that lane's ray enters. Top-tile meta: col6 > 0
    interior id; col6 == 0 empty; col6 < 0 treelet ref with tid = col7."""
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
            m6 = nodes_ref[node, c, 6]
            m7 = nodes_ref[node, c, 7]
            # empty slots (col6 == 0, inverted inf/-inf bounds) DO pass the
            # symmetrized slab test, so they must be gated out explicitly —
            # otherwise every lane burns one R_LIST slot per empty slot and
            # overflows into the streamed fallback
            any_c = jnp.any(hit) & (m6 != 0.0)
            is_tl = m6 < 0.0

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


# ------------------------- chunk-walk kernel --------------------------------


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
                              r_list=R_LIST, segs=SEGS, wave0=WAVE0):
    """Drop-in two-level traversal with treelet-major pair re-grouping.
    Same (Hit, TraversalStats) contract as intersect_packets_streamed;
    rays whose phase-1 list overflows take their result from the streamed
    fallback, so the result is exact for every ray (stats.truncated counts
    only pairs deferred past the final pass, which would need a chunk with
    > SEGS distinct treelets twice in a row)."""
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

    ray_fields = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                  inv_d[:, 0], inv_d[:, 1], inv_d[:, 2])
    perm_fields = (kx, ky, kz, sx, sy, sz)

    zf = jnp.zeros(n, jnp.float32)
    zi = jnp.zeros(n, i32)
    t_best = jnp.asarray(tmax, jnp.float32)
    gid = jnp.full(n, -1, i32)
    b1, b2 = zf, zf
    nv_acc, nl_acc, nt_acc = zi, zi, zi
    processed = jnp.zeros((n, r_list), jnp.bool_)
    slot_idx = jnp.arange(r_list, dtype=i32)[None, :]

    def run_pass(state, slot_limit):
        """Walk every live (ray, slot<slot_limit) pair grouped by treelet."""
        t_best, gid, b1, b2, processed, nv_acc, nl_acc, nt_acc = state
        cull = tn_l < t_best[:, None]
        live = (~processed) & (tid_l >= 0) & cull & (slot_idx < slot_limit)
        if any_hit:
            live = live & (gid < 0)[:, None]

        p_total = n * r_list
        rid = jnp.repeat(jnp.arange(n, dtype=i32)[:, None], r_list, 1) \
            .reshape(p_total)
        p_tid = tid_l.reshape(p_total)
        p_live = live.reshape(p_total)
        key = jnp.where(p_live, p_tid * 8 + octant[rid], sent)
        perm = jnp.argsort(key)
        key_s = key[perm]
        rid_s = rid[perm]

        n_pairs_pad = (-p_total) % PACK
        if n_pairs_pad:
            key_s = jnp.concatenate(
                [key_s, jnp.full(n_pairs_pad, sent, i32)])
            rid_s = jnp.concatenate([rid_s, jnp.zeros(n_pairs_pad, i32)])
        p_pad = key_s.shape[0]
        nch = p_pad // PACK

        stile = jnp.where(key_s < sent, key_s >> 3, -1).reshape(nch, PACK)
        prev = jnp.concatenate(
            [jnp.full((nch, 1), -2, i32), stile[:, :-1]], 1)
        newseg = stile != prev
        seg_id = jnp.cumsum(newseg.astype(i32), 1) - 1
        in_cap = (seg_id < segs) & (stile >= 0)
        sc = jnp.minimum(seg_id, segs - 1)
        lane2 = jnp.tile(jnp.arange(PACK, dtype=i32), nch).reshape(nch, PACK)
        rows_idx = jnp.repeat(jnp.arange(nch, dtype=i32), PACK) \
            .reshape(nch, PACK)
        seg_tid = jnp.full((nch, segs), -1, i32).at[rows_idx, sc].max(
            jnp.where(in_cap, stile, -1))
        seg_start = jnp.full((nch, segs), PACK, i32).at[rows_idx, sc].min(
            jnp.where(in_cap, lane2, PACK))
        seg_end = jnp.zeros((nch, segs), i32).at[rows_idx, sc].max(
            jnp.where(in_cap, lane2 + 1, 0))

        def g(x, dtype=jnp.float32):
            v = x[rid_s]
            return v.astype(dtype).reshape(nch, ROWS, 128)

        fo = [g(f) for f in ray_fields]
        fp = [g(kx, i32), g(ky, i32), g(kz, i32), g(sx), g(sy), g(sz)]
        t_o, gid_o, b1_o, b2_o, nv, nl, nt = _walk_chunks(
            seg_tid, seg_start, seg_end, ds.tl_nodes, ds.tl_prims,
            *fo[:9], *fp, g(t_best),
            tn=st.tl_tn, tp=st.tl_tp, max_leaf=st.max_leaf, any_hit=any_hit,
            has_spheres=st.n_spheres > 0, segs=segs, interpret=interpret,
            with_stats=with_stats)

        # ---- scatter-combine pair results back to rays ----
        t_p = t_o.reshape(-1)
        gid_p = gid_o.reshape(-1)
        hit_p = gid_p >= 0
        win_t = jnp.full(n, _BIG).at[rid_s].min(
            jnp.where(hit_p, t_p, _BIG))
        improve = win_t < t_best
        # winner pair = lowest pair index among exact-t matches (exact
        # equality holds: win_t is a copy of some t_p)
        is_win = hit_p & (t_p == win_t[rid_s]) & improve[rid_s]
        widx = jnp.full(n, p_pad, i32).at[rid_s].min(
            jnp.where(is_win, jnp.arange(p_pad, dtype=i32), p_pad))
        wclip = jnp.minimum(widx, p_pad - 1)
        t_best = jnp.where(improve, win_t, t_best)
        gid = jnp.where(improve, gid_p[wclip], gid)
        b1 = jnp.where(improve, b1_o.reshape(-1)[wclip], b1)
        b2 = jnp.where(improve, b2_o.reshape(-1)[wclip], b2)
        if with_stats:
            # chunk counters are packet-scalar; within a pass a ray takes
            # the MAX over the chunks its pairs appeared in (packet-
            # approximate, like the single-level kernel), and passes SUM so
            # per-ray totals stay additive like the streamed kernel's
            nv_acc = nv_acc + zi.at[rid_s].max(nv.reshape(-1))
            nl_acc = nl_acc + zi.at[rid_s].max(nl.reshape(-1))
            nt_acc = nt_acc + zi.at[rid_s].max(nt.reshape(-1))

        inv_perm = jnp.zeros(p_total, i32).at[perm].set(
            jnp.arange(p_total, dtype=i32))
        walked = p_live & in_cap.reshape(-1)[inv_perm]
        processed = processed | walked.reshape(n, r_list)
        return (t_best, gid, b1, b2, processed, nv_acc, nl_acc, nt_acc)

    state = (t_best, gid, b1, b2, processed, nv_acc, nl_acc, nt_acc)
    state = run_pass(state, wave0)      # nearest treelets -> cull t
    state = run_pass(state, r_list)     # the culled remainder
    state = run_pass(state, r_list)     # capacity-deferred leftovers
    t_best, gid, b1, b2, processed, nv_acc, nl_acc, nt_acc = state

    # honest leftovers: live pairs after the final pass ("possible missed
    # hit"); a definitively occluded any-hit ray has none by definition
    cull = tn_l < t_best[:, None]
    rem = ((~processed) & (tid_l >= 0) & cull).sum(1).astype(i32)
    if any_hit:
        rem = jnp.where(gid >= 0, 0, rem)

    # ---- exact fallback for phase-1 list overflow ----
    need_fb = ovf > 0
    if any_hit:
        need_fb = need_fb & (gid < 0)

    def with_fallback(args):
        from tpupt.ops.traverse_stream import intersect_packets_streamed

        t_best, gid, b1, b2 = args
        hit_fb, _ = intersect_packets_streamed(
            ds, st, o, d, jnp.where(need_fb, tmax, 0.0),
            any_hit=any_hit, interpret=interpret, with_stats=False)
        t_best = jnp.where(need_fb, hit_fb.t, t_best)
        gid = jnp.where(need_fb, hit_fb.prim, gid)
        b1 = jnp.where(need_fb, hit_fb.b1, b1)
        b2 = jnp.where(need_fb, hit_fb.b2, b2)
        return t_best, gid, b1, b2

    if interpret:
        # interpret mode runs eagerly, so the overflow test is concrete
        if bool(jnp.any(need_fb)):
            t_best, gid, b1, b2 = with_fallback((t_best, gid, b1, b2))
    else:
        t_best, gid, b1, b2 = jax.lax.cond(
            jnp.any(need_fb), with_fallback, lambda a: a,
            (t_best, gid, b1, b2))

    trunc = jnp.where(need_fb, 0, rem)[:n0]
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
