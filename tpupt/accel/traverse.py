"""Batched BVH traversal over wavefront ray queues (pure XLA path).

Counterpart of BVHAccel::Intersect/IntersectP (accelerators/bvh.cpp:354-437):
per-lane short stacks in a (N, DEPTH) register tensor, all rays step the tree
in lockstep inside one `lax.while_loop` (SIMT style), near-child ordering from
the stored split axis and per-ray direction sign, and instrumented node/leaf/
primitive counters matching the reference's per-ray `GeneralStats`
(geometry.h:1078, bvh.cpp:379,421). A Pallas VMEM-resident variant lives in
tpupt/ops/; this module is the portable reference path used for validation
and as the CPU fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpupt.core.vecmath import ray_inv_d
from tpupt.scene.device import DeviceScene, SceneStatics
from tpupt.shapes.quadric import intersect_quadric, quadric_test_parts
from tpupt.shapes.triangle import intersect_triangle, ray_permutation

STACK_DEPTH = 64  # matches the reference's todo[64] (bvh.cpp:363)


class Hit(NamedTuple):
    """SoA hit record (SurfaceInteraction precursor)."""

    valid: jnp.ndarray  # (N,) bool
    t: jnp.ndarray      # (N,)
    prim: jnp.ndarray   # (N,) global prim id (tris then spheres), -1 = miss
    b1: jnp.ndarray     # (N,) triangle barycentric of p1
    b2: jnp.ndarray     # (N,)
    p_obj: jnp.ndarray  # (N,3) sphere object-space hit point (valid for spheres)


class TraversalStats(NamedTuple):
    """GeneralStats counterpart: per-ray traversal counters."""

    node_visits: jnp.ndarray  # (N,) i32 bvh node traversals
    leaf_visits: jnp.ndarray  # (N,) i32
    prim_tests: jnp.ndarray   # (N,) i32 primitive intersection tests
    # treelets dropped by phase-1 list overflow in the two-level streamed
    # path (ops/traverse_stream.py) — a possible missed hit, surfaced as a
    # counter per the 'no silent truncation' rule; None on exact backends
    truncated: jnp.ndarray = None


def _motion_time(st, time, n):
    """Normalized shutter time in [0,1] for vertex-lerp motion; None when
    the scene is static (gates the delta gathers out of the trace)."""
    if not getattr(st, "has_motion", False):
        return None
    if time is None:
        return jnp.full(n, 0.5)  # mid-shutter fallback (pre-motion behavior)
    return time


def intersect(ds: DeviceScene, st: SceneStatics, o, d, tmax,
              any_hit: bool = False, time=None):
    """Closest-hit (or any-hit) traversal for a ray batch.

    o, d: (N,3); tmax: (N,); time: optional (N,) normalized shutter time
    for vertex-lerp motion blur. Returns (Hit, TraversalStats).
    """
    n = o.shape[0]
    time = _motion_time(st, time, n)
    perm = ray_permutation(d)
    inv_d = ray_inv_d(d)
    d_axis_sign = d >= 0.0  # (N,3)

    i32 = jnp.int32
    lane_iota = jax.lax.broadcasted_iota(i32, (n, STACK_DEPTH), 1)

    class _S(NamedTuple):
        sp: jnp.ndarray
        stack: jnp.ndarray
        t: jnp.ndarray
        prim: jnp.ndarray
        b1: jnp.ndarray
        b2: jnp.ndarray
        p_obj: jnp.ndarray
        nodes: jnp.ndarray
        leaves: jnp.ndarray
        tests: jnp.ndarray

    init = _S(
        sp=jnp.ones(n, i32),
        stack=jnp.zeros((n, STACK_DEPTH), i32),
        t=jnp.asarray(tmax, jnp.float32),
        prim=jnp.full(n, -1, i32),
        b1=jnp.zeros(n, jnp.float32),
        b2=jnp.zeros(n, jnp.float32),
        p_obj=jnp.zeros((n, 3), jnp.float32),
        nodes=jnp.zeros(n, i32),
        leaves=jnp.zeros(n, i32),
        tests=jnp.zeros(n, i32),
    )

    def cond(s: _S):
        return jnp.any(s.sp > 0)

    def body(s: _S):
        active = s.sp > 0
        top = jnp.maximum(s.sp - 1, 0)
        node = jnp.take_along_axis(s.stack, top[:, None], 1)[:, 0]
        sp = jnp.where(active, s.sp - 1, s.sp)

        lo = ds.bvh_lo[node]
        hi = ds.bvh_hi[node]
        cnt = ds.bvh_count[node]
        right = ds.bvh_right[node]
        first = ds.bvh_first[node]
        axis = ds.bvh_axis[node]

        # slab test (geometry.h Bounds3::IntersectP semantics)
        t_lo = (lo - o) * inv_d
        t_hi = (hi - o) * inv_d
        t_near = jnp.max(jnp.minimum(t_lo, t_hi), -1)
        t_far = jnp.min(jnp.maximum(t_lo, t_hi), -1) * (1.0 + 6.0 * 5.96e-08)
        box_hit = active & (t_near <= t_far) & (t_far > 0.0) & (t_near < s.t)

        nodes = s.nodes + active.astype(i32)
        is_leaf = cnt > 0
        leaves = s.leaves + (box_hit & is_leaf).astype(i32)

        # --- leaf: test up to max_leaf prims (static unroll) ---
        t_cur, prim, b1, b2, p_obj = s.t, s.prim, s.b1, s.b2, s.p_obj
        tests = s.tests
        for k in range(st.max_leaf):
            valid = box_hit & is_leaf & (k < cnt)
            pid = ds.bvh_prim_ids[jnp.clip(first + k, 0, ds.bvh_prim_ids.shape[0] - 1)]
            tests = tests + valid.astype(i32)
            is_tri = pid < st.n_tris
            if st.n_tris > 0:
                tid = jnp.clip(pid, 0, st.n_tris - 1)
                v0, v1, v2 = ds.tri_p0[tid], ds.tri_p1[tid], ds.tri_p2[tid]
                if time is not None:
                    tm = time[:, None]
                    v0 = v0 + tm * ds.tri_dp0[tid]
                    v1 = v1 + tm * ds.tri_dp1[tid]
                    v2 = v2 + tm * ds.tri_dp2[tid]
                h_t, tt, _, tb1, tb2 = intersect_triangle(
                    o, perm, v0, v1, v2, t_cur
                )
                win = valid & is_tri & h_t & (tt > 1e-6) & (tt < t_cur)
                t_cur = jnp.where(win, tt, t_cur)
                prim = jnp.where(win, pid, prim)
                b1 = jnp.where(win, tb1, b1)
                b2 = jnp.where(win, tb2, b2)
            if st.n_spheres > 0:
                sid = jnp.clip(pid - st.n_tris, 0, st.n_spheres - 1)
                h_s, ts_, po = intersect_quadric(
                    o, d, t_cur, ds.sph_w2o[sid], ds.sph_kind[sid],
                    ds.sph_radius[sid], ds.sph_zmin[sid], ds.sph_zmax[sid],
                    ds.sph_phimax[sid], ds.sph_q1[sid], ds.sph_q2[sid]
                )
                win = valid & ~is_tri & h_s & (ts_ < t_cur)
                t_cur = jnp.where(win, ts_, t_cur)
                prim = jnp.where(win, pid, prim)
                p_obj = jnp.where(win[:, None], po, p_obj)

        # --- interior: push far then near (near popped first) ---
        push = box_hit & ~is_leaf
        dsign = jnp.take_along_axis(d_axis_sign, axis[:, None], 1)[:, 0]
        left = node + 1
        near = jnp.where(dsign, left, right)
        far = jnp.where(dsign, right, left)
        stack = s.stack
        at0 = lane_iota == sp[:, None]
        stack = jnp.where(at0 & push[:, None], far[:, None], stack)
        sp1 = sp + push.astype(i32)
        at1 = lane_iota == sp1[:, None]
        stack = jnp.where(at1 & push[:, None], near[:, None], stack)
        sp2 = sp1 + push.astype(i32)

        if any_hit:
            sp2 = jnp.where(prim >= 0, 0, sp2)

        return _S(sp2, stack, t_cur, prim, b1, b2, p_obj, nodes, leaves, tests)

    out = jax.lax.while_loop(cond, body, init)
    hit = Hit(valid=out.prim >= 0, t=out.t, prim=out.prim, b1=out.b1,
              b2=out.b2, p_obj=out.p_obj)
    return hit, TraversalStats(out.nodes, out.leaves, out.tests)


def intersect_p(ds: DeviceScene, st: SceneStatics, o, d, tmax, time=None):
    """Shadow-ray occlusion test (BVHAccel::IntersectP, bvh.cpp:398)."""
    hit, stats = intersect_wide(ds, st, o, d, tmax, any_hit=True, time=time)
    return hit.valid, stats


# ----------------------- wide-BVH (packed-row) path -------------------------

WIDE_STACK = 48
_BIG = jnp.float32(3.0e38)

# optimal 19-comparator sorting network for 8 elements
_SORT8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
          (2, 4), (3, 5), (3, 4)]


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def intersect_wide(ds: DeviceScene, st: SceneStatics, o, d, tmax,
                   any_hit: bool = False, time=None):
    """The hot traversal: 8-wide BVH with one 256B node-row gather per step
    and one 128B prim-row gather per primitive test (see
    bvh.collapse_to_wide / device.pack_prim_rows for the layouts). Children
    are ordered by slab-entry distance with an 8-element sorting network and
    pushed far-to-near. Node bounds cover the shutter union, so with
    `time` set the per-prim vertex-lerp (prim_rows_dt) stays conservative.
    Returns (Hit, TraversalStats) like `intersect`."""
    n = o.shape[0]
    time = _motion_time(st, time, n)
    perm = ray_permutation(d)
    inv_d = ray_inv_d(d)
    i32 = jnp.int32
    lane_iota = jax.lax.broadcasted_iota(i32, (n, WIDE_STACK), 1)
    n_rows = ds.prim_rows.shape[0]
    meta_empty = jnp.int32(-2**31)

    class _S(NamedTuple):
        sp: jnp.ndarray
        stack: jnp.ndarray
        t: jnp.ndarray
        gid: jnp.ndarray    # global prim id of closest hit (-1 miss)
        ridx: jnp.ndarray   # leaf-order prim-row index of closest hit
        b1: jnp.ndarray
        b2: jnp.ndarray
        nodes: jnp.ndarray
        leaves: jnp.ndarray
        tests: jnp.ndarray

    init = _S(
        sp=jnp.ones(n, i32),
        stack=jnp.zeros((n, WIDE_STACK), i32),  # entry 0 = root node id 0
        t=jnp.asarray(tmax, jnp.float32),
        gid=jnp.full(n, -1, i32),
        ridx=jnp.zeros(n, i32),
        b1=jnp.zeros(n, jnp.float32),
        b2=jnp.zeros(n, jnp.float32),
        nodes=jnp.zeros(n, i32),
        leaves=jnp.zeros(n, i32),
        tests=jnp.zeros(n, i32),
    )

    def cond(s):
        return jnp.any(s.sp > 0)

    def body(s: _S):
        active = s.sp > 0
        top = jnp.maximum(s.sp - 1, 0)
        raw = jnp.take_along_axis(s.stack, top[:, None], 1)[:, 0]
        sp = jnp.where(active, s.sp - 1, s.sp)

        is_int = active & (raw >= 0)
        is_leaf = active & (raw < 0)
        node = jnp.where(is_int, raw, 0)

        # ---------- interior: one wide row gather, 8 slab tests ----------
        row = ds.wide_nodes[node]  # (N, 64)
        keys = []
        metas = []
        for c in range(8):
            lo = row[:, c * 6 : c * 6 + 3]
            hi = row[:, c * 6 + 3 : c * 6 + 6]
            t_lo = (lo - o) * inv_d
            t_hi = (hi - o) * inv_d
            t_near = jnp.max(jnp.minimum(t_lo, t_hi), -1)
            t_far = jnp.min(jnp.maximum(t_lo, t_hi), -1) * 1.0000004
            m = _bitcast_i32(row[:, 48 + c])
            ok = is_int & (t_near <= t_far) & (t_far > 0.0) & (t_near < s.t) \
                & (m != meta_empty)
            keys.append(jnp.where(ok, jnp.maximum(t_near, 0.0), _BIG))
            metas.append(m)
        # sort descending by key (farthest first) so nearest is pushed last
        for (a, b) in _SORT8:
            swap = keys[a] < keys[b]
            ka = jnp.where(swap, keys[b], keys[a])
            kb = jnp.where(swap, keys[a], keys[b])
            ma = jnp.where(swap, metas[b], metas[a])
            mb = jnp.where(swap, metas[a], metas[b])
            keys[a], keys[b], metas[a], metas[b] = ka, kb, ma, mb
        stack = s.stack
        for c in range(8):
            push = keys[c] < _BIG
            at = lane_iota == sp[:, None]
            stack = jnp.where(at & push[:, None], metas[c][:, None], stack)
            sp = sp + push.astype(i32)

        nodes = s.nodes + is_int.astype(i32)
        leaves = s.leaves + is_leaf.astype(i32)

        # ---------- leaf: packed prim rows ----------
        v = jnp.where(is_leaf, -raw - 1, 0)
        l_first = v >> 6
        l_count = v & 63
        t_cur, gid, ridx, b1, b2 = s.t, s.gid, s.ridx, s.b1, s.b2
        tests = s.tests
        for k in range(st.max_leaf):
            valid = is_leaf & (k < l_count)
            idx = jnp.minimum(l_first + k, n_rows - 1)
            prow = ds.prim_rows[idx]  # (N, 32)
            tests = tests + valid.astype(i32)
            p_is_tri = _bitcast_i32(prow[:, 17]) == 1
            p_gid = _bitcast_i32(prow[:, 16])
            # triangle test (vertex-lerped at the ray time under motion)
            v0, v1, v2 = prow[:, 0:3], prow[:, 3:6], prow[:, 6:9]
            if time is not None:
                drow = ds.prim_rows_dt[idx]
                tm = time[:, None]
                v0 = v0 + tm * drow[:, 0:3]
                v1 = v1 + tm * drow[:, 3:6]
                v2 = v2 + tm * drow[:, 6:9]
            h_t, tt, _, tb1, tb2 = intersect_triangle(
                o, perm, v0, v1, v2, t_cur)
            win = valid & p_is_tri & h_t & (tt > 1e-6) & (tt < t_cur)
            t_cur = jnp.where(win, tt, t_cur)
            gid = jnp.where(win, p_gid, gid)
            ridx = jnp.where(win, idx, ridx)
            b1 = jnp.where(win, tb1, b1)
            b2 = jnp.where(win, tb2, b2)
            if st.n_spheres > 0:
                # unified quadric test from the packed row (w2o 3x4 in
                # cols 0-11, r/zmin/zmax/phimax 12-15, kind/q1/q2/sin/cos
                # 20-24 — shapes/quadric.py)
                m3 = prow[:, 0:12].reshape(n, 3, 4)
                os_ = jnp.einsum("nij,nj->ni", m3[:, :, :3], o) + m3[:, :, 3]
                dsph = jnp.einsum("nij,nj->ni", m3[:, :, :3], d)
                h_s, ts_ = quadric_test_parts(
                    prow[:, 20], prow[:, 12], prow[:, 13], prow[:, 14],
                    prow[:, 15], prow[:, 21], prow[:, 22],
                    prow[:, 23], prow[:, 24],
                    os_[:, 0], os_[:, 1], os_[:, 2],
                    dsph[:, 0], dsph[:, 1], dsph[:, 2], t_cur)
                win_s = valid & ~p_is_tri & h_s & (ts_ < t_cur)
                t_cur = jnp.where(win_s, ts_, t_cur)
                gid = jnp.where(win_s, p_gid, gid)
                ridx = jnp.where(win_s, idx, ridx)

        if any_hit:
            sp = jnp.where(gid >= 0, 0, sp)

        return _S(sp, stack, t_cur, gid, ridx, b1, b2, nodes, leaves, tests)

    out = jax.lax.while_loop(cond, body, init)

    # reconstruct sphere object-space hit point for shading (post-loop)
    if st.n_spheres > 0:
        prow = ds.prim_rows[out.ridx]
        m3 = prow[:, 0:12].reshape(n, 3, 4)
        o_obj = jnp.einsum("nij,nj->ni", m3[:, :, :3], o) + m3[:, :, 3]
        d_obj = jnp.einsum("nij,nj->ni", m3[:, :, :3], d)
        p_obj = o_obj + out.t[:, None] * d_obj
    else:
        p_obj = jnp.zeros((n, 3))

    hit = Hit(valid=out.gid >= 0, t=out.t, prim=out.gid, b1=out.b1,
              b2=out.b2, p_obj=p_obj)
    return hit, TraversalStats(out.nodes, out.leaves, out.tests)


def intersect_brute(ds: DeviceScene, st: SceneStatics, o, d, tmax, time=None):
    """O(N*P) ground-truth intersector for validation (tests only)."""
    n = o.shape[0]
    time = _motion_time(st, time, n)
    perm = ray_permutation(d)
    t_cur = jnp.asarray(tmax, jnp.float32)
    prim = jnp.full(n, -1, jnp.int32)
    b1 = jnp.zeros(n, jnp.float32)
    b2 = jnp.zeros(n, jnp.float32)
    p_obj = jnp.zeros((n, 3), jnp.float32)
    for tid in range(st.n_tris):
        v0, v1, v2 = ds.tri_p0[tid], ds.tri_p1[tid], ds.tri_p2[tid]
        if time is not None:
            tm = time[:, None]
            v0 = v0 + tm * ds.tri_dp0[tid]
            v1 = v1 + tm * ds.tri_dp1[tid]
            v2 = v2 + tm * ds.tri_dp2[tid]
        h, tt, _, tb1, tb2 = intersect_triangle(
            o, perm, v0, v1, v2, t_cur)
        win = h & (tt > 1e-6) & (tt < t_cur)
        t_cur = jnp.where(win, tt, t_cur)
        prim = jnp.where(win, tid, prim)
        b1 = jnp.where(win, tb1, b1)
        b2 = jnp.where(win, tb2, b2)
    for sid in range(st.n_spheres):
        h, ts_, po = intersect_quadric(
            o, d, t_cur, ds.sph_w2o[sid], ds.sph_kind[sid],
            ds.sph_radius[sid], ds.sph_zmin[sid], ds.sph_zmax[sid],
            ds.sph_phimax[sid], ds.sph_q1[sid], ds.sph_q2[sid])
        win = h & (ts_ < t_cur)
        t_cur = jnp.where(win, ts_, t_cur)
        prim = jnp.where(win, jnp.int32(st.n_tris + sid), prim)
        p_obj = jnp.where(win[:, None], po, p_obj)
    return Hit(prim >= 0, t_cur, prim, b1, b2, p_obj)
