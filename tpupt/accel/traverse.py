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
from tpupt.shapes.sphere import intersect_sphere
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


def intersect(ds: DeviceScene, st: SceneStatics, o, d, tmax,
              any_hit: bool = False):
    """Closest-hit (or any-hit) traversal for a ray batch.

    o, d: (N,3); tmax: (N,). Returns (Hit, TraversalStats).
    """
    n = o.shape[0]
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
                h_t, tt, _, tb1, tb2 = intersect_triangle(
                    o, perm, ds.tri_p0[tid], ds.tri_p1[tid], ds.tri_p2[tid], t_cur
                )
                win = valid & is_tri & h_t & (tt > 1e-6) & (tt < t_cur)
                t_cur = jnp.where(win, tt, t_cur)
                prim = jnp.where(win, pid, prim)
                b1 = jnp.where(win, tb1, b1)
                b2 = jnp.where(win, tb2, b2)
            if st.n_spheres > 0:
                sid = jnp.clip(pid - st.n_tris, 0, st.n_spheres - 1)
                h_s, ts_, po = intersect_sphere(
                    o, d, t_cur, ds.sph_w2o[sid], ds.sph_radius[sid],
                    ds.sph_zmin[sid], ds.sph_zmax[sid], ds.sph_phimax[sid]
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


def intersect_p(ds: DeviceScene, st: SceneStatics, o, d, tmax):
    """Shadow-ray occlusion test (BVHAccel::IntersectP, bvh.cpp:398)."""
    hit, stats = intersect(ds, st, o, d, tmax, any_hit=True)
    return hit.valid, stats


def intersect_brute(ds: DeviceScene, st: SceneStatics, o, d, tmax):
    """O(N*P) ground-truth intersector for validation (tests only)."""
    n = o.shape[0]
    perm = ray_permutation(d)
    t_cur = jnp.asarray(tmax, jnp.float32)
    prim = jnp.full(n, -1, jnp.int32)
    b1 = jnp.zeros(n, jnp.float32)
    b2 = jnp.zeros(n, jnp.float32)
    p_obj = jnp.zeros((n, 3), jnp.float32)
    for tid in range(st.n_tris):
        h, tt, _, tb1, tb2 = intersect_triangle(
            o, perm, ds.tri_p0[tid], ds.tri_p1[tid], ds.tri_p2[tid], t_cur)
        win = h & (tt > 1e-6) & (tt < t_cur)
        t_cur = jnp.where(win, tt, t_cur)
        prim = jnp.where(win, tid, prim)
        b1 = jnp.where(win, tb1, b1)
        b2 = jnp.where(win, tb2, b2)
    for sid in range(st.n_spheres):
        h, ts_, po = intersect_sphere(
            o, d, t_cur, ds.sph_w2o[sid], ds.sph_radius[sid],
            ds.sph_zmin[sid], ds.sph_zmax[sid], ds.sph_phimax[sid])
        win = h & (ts_ < t_cur)
        t_cur = jnp.where(win, ts_, t_cur)
        prim = jnp.where(win, jnp.int32(st.n_tris + sid), prim)
        p_obj = jnp.where(win[:, None], po, p_obj)
    return Hit(prim >= 0, t_cur, prim, b1, b2, p_obj)
