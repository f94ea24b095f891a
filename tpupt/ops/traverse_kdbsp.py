"""Pallas packet traversal for the thesis kd/RBSP/BSP family.

The XLA lockstep walker (accel/kdbsp.py intersect_kdbsp) advances every
ray one node per while-iteration, so a wavefront pays max-over-rays
iterations times full-batch gathers — measured ~2.3k rays/s on killeroo
bounce rays, ~100x slower than the reference's per-ray recursion
(kdtreeaccel.cpp:410). This kernel is the TPU-first redesign: Wald-style
coherent PACKET kd traversal with per-packet scalar node stacks and
per-ray [t_lo, t_hi] interval tiles.

  * the packed node table lives in VMEM as DENSE (K/128, 8, 128) tiles
    (node i -> tile i>>7, lane i&127, 8 fields down the sublanes: split
    direction xyz, split offset, leaf flag, above-child/prim-row, prim
    count, spare). Dense matters: a (K,1,8) row layout pads each node to
    a full 512-byte lane row in VMEM, which capped the walker at ~200k
    nodes and faulted the chip on the 1.06M-node killeroo rbsp-3 table;
    tiled it is a true 32 B/node (34 MB), resident in the 128 MB v5e
    VMEM. Per-node fields come out with one dynamic-major tile load + a
    lane-mask reduction (dynamic-lane scalar loads are illegal in
    Mosaic). kd/RBSP/BSP all reduce to the same walker because the
    split plane is carried as an explicit direction, so the projected
    plane distance is a 6-flop dot per ray (rbsp.cpp:68-80 does the
    same with precomputed projections);
  * the stack holds (node, per-ray interval tile) pairs: node ids in
    SMEM, interval tiles in VMEM scratch — a ray is active in a popped
    cell iff its interval is nonempty and nearer than its current best
    (per-ray early exit, kdtreeaccel.cpp:489);
  * both children are pushed when any ray wants both, with per-ray
    clipped intervals (rays whose direction sign disagrees with the
    packet majority simply get the swapped intervals — correctness is
    per-ray, only the VISIT ORDER is majority-approximate);
  * leaf prims stream HBM->VMEM in double-buffered 16-prim chunks
    (4x128-lane rows per DMA; leaf starts are 4-aligned by the
    builder), so arbitrarily large bad-refine leaves (killeroo kd peaks
    at 347 prims, kdtreeaccel.cpp:482's badRefine escape) cost chunked
    DMA instead of a 347-iteration lockstep stall.

Reference parity: kdtreeaccel.cpp:410-532 (traversal), rbsp/BSP
generalization genericBSP.h + rbsp.cpp:61-120.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpupt.shapes.quadric import quadric_test_parts

ROWS = 8
PACK = ROWS * 128
STACK = 96  # kd maxdepth = 8 + 1.3*log2(n) (~40 at 16M prims) + slack
_BIG = 3.0e38


def _test_prim_row(buf_at, rays, t_ref, gid_ref, b1_ref, b2_ref, lane_act,
                   *, has_spheres: bool, j: int):
    """Test prim j (static, 0..3) of a DMA'd 128-lane prim row against the
    packet, masked by the per-lane active tile. Same packed-row layout as
    device.pack_prim_rows (watertight triangle cols 0-9, quadric cols
    0-15/20-24, gid/kind cols 18-19)."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz,
     kx, ky, kz, sx, sy, sz, o_kx, o_ky, o_kz) = rays

    def ps(col):
        return buf_at(j, col)

    t_cur = t_ref[0]
    p_gid = ps(18).astype(jnp.int32)
    p_is_tri = ps(19) == 1.0

    def permsel(col):
        px, py, pz = ps(col), ps(col + 1), ps(col + 2)
        ax_ = jnp.where(kx == 0, px, jnp.where(kx == 1, py, pz))
        ay_ = jnp.where(ky == 0, px, jnp.where(ky == 1, py, pz))
        az_ = jnp.where(kz == 0, px, jnp.where(kz == 1, py, pz))
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
    t_ok = (pos & (t_scaled > 1e-6 * det) & (t_scaled < t_cur * det)) \
        | (~pos & (t_scaled < 1e-6 * det) & (t_scaled > t_cur * det))
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    tt = t_scaled * inv_det
    win_t = lane_act & p_is_tri & same & (det != 0) & t_ok & (tt > 1e-6) \
        & (tt < t_cur)
    t_new = jnp.where(win_t, tt, t_cur)
    gid_new = jnp.where(win_t, p_gid, gid_ref[0])
    b1_new = jnp.where(win_t, e1 * inv_det, b1_ref[0])
    b2_new = jnp.where(win_t, e2 * inv_det, b2_ref[0])

    if has_spheres:
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
        win_s = lane_act & ~p_is_tri & hit_q & (ts < t_new)
        t_new = jnp.where(win_s, ts, t_new)
        gid_new = jnp.where(win_s, p_gid, gid_new)

    t_ref[0] = t_new
    gid_ref[0] = gid_new
    b1_ref[0] = b1_new
    b2_ref[0] = b2_new


def _kernel_kdbsp(nodes_ref, prims_hbm,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  t0_ref, t1_ref, tmax_ref,
                  t_ref, gid_ref, b1_ref, b2_ref, visits_ref, leaves_ref,
                  tests_ref,
                  prim_buf, sem_p, nstk, lo_stk, hi_stk,
                  *, any_hit: bool, has_spheres: bool, with_stats: bool):
    """One 1024-ray packet per grid step through the kd/BSP tree.

    Only o/d/t tiles arrive as operands — the watertight-test permutation
    and shear are derived in-kernel (a dozen VPU ops once per packet) to
    keep the scoped-VMEM operand footprint down: this kernel runs inside
    the bounce fori_loop, where XLA stack-allocates every pallas operand
    in scoped VMEM."""
    t_ref[0] = tmax_ref[0]
    gid_ref[0] = jnp.full((ROWS, 128), -1, jnp.int32)
    b1_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    b2_ref[0] = jnp.zeros((ROWS, 128), jnp.float32)
    visits_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    leaves_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)
    tests_ref[0] = jnp.zeros((ROWS, 128), jnp.int32)

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    # inverse direction + watertight permutation/shear in-kernel
    # (shapes/triangle.py ray_permutation semantics)
    ix = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
    iy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
    iz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
    ax_, ay_, az_ = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where((az_ >= ax_) & (az_ >= ay_), 2,
                   jnp.where(ay_ >= ax_, 1, 0)).astype(jnp.int32)
    kx = jnp.where(kz == 2, 0, kz + 1)
    ky = jnp.where(kx == 2, 0, kx + 1)
    d_kx = jnp.where(kx == 0, dx, jnp.where(kx == 1, dy, dz))
    d_ky = jnp.where(ky == 0, dx, jnp.where(ky == 1, dy, dz))
    d_kz = jnp.where(kz == 0, dx, jnp.where(kz == 1, dy, dz))
    inv_kz = 1.0 / jnp.where(d_kz == 0.0, 1e-30, d_kz)
    sx = d_kx * inv_kz
    sy = d_ky * inv_kz
    sz = inv_kz
    o_kx = jnp.where(kx == 0, ox, jnp.where(kx == 1, oy, oz))
    o_ky = jnp.where(ky == 0, ox, jnp.where(ky == 1, oy, oz))
    o_kz = jnp.where(kz == 0, ox, jnp.where(kz == 1, oy, oz))
    rays = (ox, oy, oz, dx, dy, dz, ix, iy, iz,
            kx, ky, kz, sx, sy, sz, o_kx, o_ky, o_kz)

    nstk[0] = 0
    # interval stacks are stored flattened (STACK*ROWS, 128): tile access
    # at a dynamic stack index must use pl.ds on the sublane dim — 3D
    # dynamic leading-index tile reads hang Mosaic on real chips
    lo_stk[pl.ds(0, ROWS), :] = t0_ref[0]
    hi_stk[pl.ds(0, ROWS), :] = t1_ref[0]

    lanes128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def cond(sp):
        return sp > 0

    def body(sp):
        node = nstk[sp - 1]
        lo = lo_stk[pl.ds((sp - 1) * ROWS, ROWS), :]
        hi = hi_stk[pl.ds((sp - 1) * ROWS, ROWS), :]
        sp = sp - 1

        act = (lo <= hi) & (lo < t_ref[0])
        if any_hit:
            act = act & (gid_ref[0] < 0)
        run = jnp.any(act)

        # ---- node-field extraction from the dense tile: one (8,128)
        # load + lane-mask reduction; split-plane fields stay in the
        # vector domain ((8,1) broadcasts), control fields reduce to
        # scalars ----
        tile = nodes_ref[node >> 7]
        sel = jnp.where(lanes128 == (node & 127), tile, 0.0)
        fields = jnp.sum(sel, axis=1, keepdims=True)  # (8,1)
        is_leaf = jnp.sum(sel[4:5, :]) > 0.5
        do_int = run & ~is_leaf
        do_leaf = run & is_leaf

        # ---- interior split (computed unconditionally — the loads read
        # leaf cols under a different interpretation but results are
        # gated; this keeps the hot path branch-free) ----
        nx = fields[0:1]
        ny = fields[1:2]
        nz = fields[2:3]
        split = fields[3:4]
        c5 = jnp.sum(sel[5:6, :]).astype(jnp.int32)

        op = ox * nx + oy * ny + oz * nz
        dp = dx * nx + dy * ny + dz * nz
        tp = (split - op) / jnp.where(dp == 0.0, 1e-30, dp)
        below_first = (op < split) | ((op == split) & (dp <= 0.0))
        # first-child interval [lo, min(tp, hi)] unless the plane is
        # behind (tp <= 0 -> first child only, full interval);
        # second-child interval [max(tp, lo), hi] (empty when tp <= 0 or
        # tp > hi) — kdtreeaccel.cpp:430-450 per-ray, vectorized
        plane_fwd = tp > 0.0
        hi_f = jnp.where(plane_fwd, jnp.minimum(tp, hi), hi)
        lo_s = jnp.where(plane_fwd, jnp.maximum(tp, lo), _BIG)
        # map (first, second) -> (below, above) per ray
        lo_b = jnp.where(below_first, lo, lo_s)
        hi_b = jnp.where(below_first, hi_f, hi)
        lo_a = jnp.where(below_first, lo_s, lo)
        hi_a = jnp.where(below_first, hi, hi_f)
        lo_b = jnp.where(act, lo_b, _BIG)
        hi_b = jnp.where(act, hi_b, -_BIG)
        lo_a = jnp.where(act, lo_a, _BIG)
        hi_a = jnp.where(act, hi_a, -_BIG)
        want_b = do_int & jnp.any((lo_b <= hi_b) & (lo_b < t_ref[0]))
        want_a = do_int & jnp.any((lo_a <= hi_a) & (lo_a < t_ref[0]))
        # majority vote picks which child pops first (pushed last);
        # per-ray intervals keep minority-sign rays correct either way
        n_bf = jnp.sum(jnp.where(act & below_first, 1, 0))
        n_act = jnp.sum(jnp.where(act, 1, 0))
        below_near = n_bf * 2 >= n_act
        if with_stats:
            visits_ref[0] = visits_ref[0] + jnp.where(
                do_int, act.astype(jnp.int32), 0)

        def push(sp, cid, lo_t, hi_t, on):
            @pl.when(on)
            def _():
                nstk[sp] = cid
                lo_stk[pl.ds(sp * ROWS, ROWS), :] = lo_t
                hi_stk[pl.ds(sp * ROWS, ROWS), :] = hi_t
            return sp + jnp.where(on, 1, 0)

        # far child first so the near child pops first
        sp = push(sp, c5, lo_a, hi_a, want_a & below_near)
        sp = push(sp, node + 1, lo_b, hi_b, want_b & ~below_near)
        sp = push(sp, c5, lo_a, hi_a, want_a & ~below_near)
        sp = push(sp, node + 1, lo_b, hi_b, want_b & below_near)

        # ---- leaf: double-buffered 16-prim chunks DMA'd from HBM ----
        cnt0 = jnp.sum(sel[6:7, :]).astype(jnp.int32)
        cnt = jnp.where(do_leaf, cnt0, 0)
        if with_stats:
            leaves_ref[0] = leaves_ref[0] + jnp.where(
                do_leaf, act.astype(jnp.int32), 0)
            tests_ref[0] = tests_ref[0] + jnp.where(
                do_leaf & act, cnt, 0)
        first4 = c5 >> 2
        n_chunks = (cnt + 15) >> 4

        def copy(c, slot):
            return pltpu.make_async_copy(
                prims_hbm.at[pl.ds(first4 + c * 4, 4)],
                prim_buf.at[slot], sem_p.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            copy(0, 0).start()

        def chunk(c, carry):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                copy(c + 1, 1 - slot).start()

            copy(c, slot).wait()
            for r in range(4):
                for j in range(4):
                    def buf_at(jj, col, r=r, slot=slot):
                        return prim_buf[slot, r, jj * 32 + col]

                    k = c * 16 + r * 4 + j
                    lane_act = act & (k < cnt)
                    _test_prim_row(
                        buf_at, rays, t_ref, gid_ref, b1_ref, b2_ref,
                        lane_act, has_spheres=has_spheres, j=j)
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk, 0)
        if any_hit:
            sp = jnp.where(jnp.all(gid_ref[0] >= 0), 0, sp)
        return sp

    jax.lax.while_loop(cond, body, jnp.int32(1))


@functools.partial(jax.jit, static_argnames=(
    "any_hit", "has_spheres", "interpret", "with_stats"))
def _traverse_kdbsp(nodes_pack, prim_rows4,
                    ox, oy, oz, dx, dy, dz, t0, t1, tmax,
                    any_hit: bool, has_spheres: bool,
                    interpret: bool = False, with_stats: bool = False):
    npk = ox.shape[0]
    shp = (npk, ROWS, 128)
    ray_spec = pl.BlockSpec((1, ROWS, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shapes = [
        jax.ShapeDtypeStruct(shp, jnp.float32),
        jax.ShapeDtypeStruct(shp, jnp.int32),
        jax.ShapeDtypeStruct(shp, jnp.float32),
        jax.ShapeDtypeStruct(shp, jnp.float32),
        jax.ShapeDtypeStruct(shp, jnp.int32),
        jax.ShapeDtypeStruct(shp, jnp.int32),
        jax.ShapeDtypeStruct(shp, jnp.int32),
    ]
    kern = functools.partial(_kernel_kdbsp, any_hit=any_hit,
                             has_spheres=has_spheres, with_stats=with_stats)
    return pl.pallas_call(
        kern,
        grid=(npk,),
        in_specs=[full, hbm] + [ray_spec] * 9,
        out_specs=[ray_spec] * 7,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, 4, 128), jnp.float32),   # prim chunk buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.VMEM((STACK * ROWS, 128), jnp.float32),
            pltpu.VMEM((STACK * ROWS, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the interval stacks + node table legitimately exceed the
            # default 16 MB scoped-vmem budget when this kernel sits
            # inside the bounce fori_loop (operands are stack-allocated)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nodes_pack, prim_rows4, ox, oy, oz, dx, dy, dz, t0, t1, tmax)


def kdbsp_vmem_ok(n_nodes: int, tree_depth: int = 0) -> bool:
    """Node tiles (a true 32 B/node in the dense layout) + the two
    interval stacks must fit the 128 MB v5e VMEM with headroom for ray
    tiles/outputs and the bounce-loop's stack-allocated operands, and
    the tree depth must fit the fixed DFS stacks (the packet DFS pushes
    at most depth+1 entries; deeper trees would write past nstk)."""
    fits = n_nodes * 32 + 2 * STACK * PACK * 4 < 56 * 1024 * 1024
    return fits and tree_depth + 2 <= STACK


def intersect_kdbsp_packets(ds, st, o, d, tmax, any_hit=False,
                            interpret=False, with_stats=True):
    """Packet-kernel version of accel.kdbsp.intersect_kdbsp reading the
    packed ds.alt_pack / ds.alt_prim_rows tables. Same (Hit,
    TraversalStats) contract (truncated == 0: the interval stack is
    exact)."""
    from tpupt.accel.traverse import Hit, TraversalStats
    from tpupt.core.vecmath import ray_inv_d

    n = o.shape[0]
    n_pad = (-n) % PACK
    if n_pad:
        o = jnp.concatenate([o, jnp.ones((n_pad, 3))])
        d = jnp.concatenate([d, jnp.ones((n_pad, 3))])
        tmax = jnp.concatenate([tmax, jnp.zeros(n_pad)])
    npk = o.shape[0] // PACK

    inv_d = ray_inv_d(d)
    # world-bounds clip (kdtreeaccel.cpp:413)
    t_lo = (ds.world_lo - o) * inv_d
    t_hi = (ds.world_hi - o) * inv_d
    t0 = jnp.maximum(jnp.max(jnp.minimum(t_lo, t_hi), -1), 0.0)
    t1 = jnp.minimum(jnp.min(jnp.maximum(t_lo, t_hi), -1), tmax)

    def pk(x, dtype=jnp.float32):
        return x.astype(dtype).reshape(npk, ROWS, 128)

    t, gid, b1, b2, visits, leaves, tests = _traverse_kdbsp(
        ds.alt_pack, ds.alt_prim_rows.reshape(-1, 128),
        pk(o[:, 0]), pk(o[:, 1]), pk(o[:, 2]),
        pk(d[:, 0]), pk(d[:, 1]), pk(d[:, 2]),
        pk(t0), pk(t1), pk(tmax),
        any_hit=any_hit, has_spheres=st.n_spheres > 0,
        interpret=interpret, with_stats=with_stats)

    t = t.reshape(-1)[:n]
    gid = gid.reshape(-1)[:n]
    b1 = b1.reshape(-1)[:n]
    b2 = b2.reshape(-1)[:n]
    visits = visits.reshape(-1)[:n]
    leaves = leaves.reshape(-1)[:n]
    tests = tests.reshape(-1)[:n]

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
