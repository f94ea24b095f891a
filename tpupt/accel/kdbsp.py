"""Unified kd-tree / RBSP / BSP traversal over flat node tensors.

Counterpart of the reference's GenericBSP-family traversals
(kdtreeaccel.cpp:380-500, rbsp.cpp:405-477, BSPKd.h:59-83): a kd-tree is the
special case of a restricted BSP whose direction set is the three coordinate
axes, so ONE lockstep traversal serves every tree in the thesis family — the
split-plane distance is computed by projecting the ray onto the node's
direction (rbsp.cpp intersectInterior), which reduces to the classic
axis-aligned fast path when the direction is a basis vector.

Node tensors (from tpupt.native builders):
  flags (N,) i32  — direction index, == n_dirs for leaves
  split (N,) f32  — plane offset t (plane: dot(p, dir) = t)
  above (N,) i32  — above-child id (below child = node + 1)
  first/count     — leaf prim ranges into prim_ids
Per-ray stacks hold (node, tmin, tmax) like the reference's todo[] entries
(kdtreeaccel.cpp:397 KdToDo).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpupt.accel.traverse import Hit, TraversalStats
from tpupt.shapes.quadric import quadric_test_parts
from tpupt.shapes.triangle import intersect_triangle, ray_permutation

STACK_DEPTH = 64


def get_directions(n: int):
    """Fixed RBSP direction sets (RBSPShared.h:29-75 getDirections):
    3 = coordinate axes; 7 = + 4 main diagonals; 9 = + 6 edge diagonals;
    13 = all of the above."""
    import numpy as np

    axes = np.eye(3)
    s3 = 1.0 / np.sqrt(3.0)
    main_diag = np.array([[1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1]]) * s3
    s2 = 1.0 / np.sqrt(2.0)
    edge_diag = np.array([[1, 1, 0], [1, -1, 0], [1, 0, 1],
                          [1, 0, -1], [0, 1, 1], [0, 1, -1]]) * s2
    if n <= 3:
        return axes
    if n <= 7:
        return np.concatenate([axes, main_diag])
    if n <= 9:
        return np.concatenate([axes, edge_diag])
    return np.concatenate([axes, main_diag, edge_diag])


def scene_prim_points(scene, lo, hi):
    """Representative points + normals per primitive for the BSP-family
    builders: triangle vertices (Triangle::getBounds(Vector3f) projects
    vertices, triangle.cpp:661) and AABB corners for spheres; normals are
    the per-prim geometric normals (Primitive::Normal(), primitive.h:72)."""
    import numpy as np

    t = scene.triangles
    n_tri = t.count
    n_total = len(lo)
    pts = np.zeros((n_total, 8, 3))
    npts = np.zeros(n_total, np.int32)
    normals = np.zeros((n_total, 3))
    if n_tri:
        pts[:n_tri, 0] = t.p0
        pts[:n_tri, 1] = t.p1
        pts[:n_tri, 2] = t.p2
        npts[:n_tri] = 3
        nrm = np.cross(t.p1 - t.p0, t.p2 - t.p0)
        nl = np.linalg.norm(nrm, axis=-1, keepdims=True)
        normals[:n_tri] = nrm / np.maximum(nl, 1e-20)
    if n_total > n_tri:
        corners = np.stack(np.meshgrid(*[[0, 1]] * 3, indexing="ij"),
                           -1).reshape(8, 3)
        slo, shi = lo[n_tri:], hi[n_tri:]
        pts[n_tri:] = slo[:, None, :] + corners[None] * (shi - slo)[:, None, :]
        npts[n_tri:] = 8
        normals[n_tri:] = np.array([1.0, 0.0, 0.0])
    return pts, npts, normals


def pack_kdbsp_nodes(nodes, dirs):
    """Packed tables for the Pallas packet kernel (ops/traverse_kdbsp.py):

      pack  (K, 1, 8) f32 — [dir.xyz, split, is_leaf, above|first, count, 0]
      prim_rows4 / prim_ids4 / above4 — leaf prim runs re-packed with
      4-aligned starts (the kernel DMAs 4-row = 16-prim chunks whose lane
      offsets must be static), shared with the XLA fallback so both
      backends read one table.

    kd/RBSP trees carry a direction INDEX in flags (== n_dirs for leaves,
    genericBSP.h node encoding); unrestricted BSP carries flags 0/1 and a
    per-node direction. Both reduce to an explicit per-node direction
    here — the kernel's plane distance is a 6-flop dot either way."""
    import numpy as np

    flags = np.asarray(nodes["flags"])
    split = np.asarray(nodes["split"], np.float32)
    above = np.asarray(nodes["above"]).copy()
    nprims = np.asarray(nodes["nprims"])
    prim_rows = np.asarray(nodes["prim_rows"], np.float32)
    prim_ids = np.asarray(nodes["prim_ids"])
    dirs = np.asarray(dirs, np.float32)
    per_node = "ndir" in nodes
    k = len(flags)
    if per_node:
        is_leaf = flags == 1
        ndir = np.asarray(nodes["ndir"], np.float32)
    else:
        is_leaf = flags >= len(dirs)
        ndir = dirs[np.minimum(flags, len(dirs) - 1)]

    # 4-align leaf prim runs (stable order; pad rows repeat the run's last
    # row so over-reads inside a chunk are harmless garbage-tests)
    leaf_idx = np.flatnonzero(is_leaf & (nprims > 0))
    order = leaf_idx[np.argsort(above[leaf_idx], kind="stable")]
    starts4 = np.zeros(k, np.int64)
    cur = 0
    chunks_r, chunks_i = [], []
    for i in order:
        f, c = int(above[i]), int(nprims[i])
        starts4[i] = cur
        chunks_r.append(prim_rows[f: f + c])
        chunks_i.append(prim_ids[f: f + c])
        pad = (-c) % 4
        if pad:
            chunks_r.append(np.repeat(prim_rows[f + c - 1: f + c], pad, 0))
            chunks_i.append(np.repeat(prim_ids[f + c - 1: f + c], pad, 0))
        cur += c + pad
    # tail slack: the kernel's last 16-prim chunk may DMA up to 15 rows
    # past a run's end (tests are masked but the copy must stay in bounds),
    # plus round the table to a multiple of 4 for the (P/4, 128) reshape
    total_pad = ((-cur) % 4) + 16
    chunks_r.append(np.zeros((total_pad, prim_rows.shape[1]), np.float32))
    chunks_i.append(np.full(total_pad, -1, prim_ids.dtype))
    prim_rows4 = np.concatenate(chunks_r)
    prim_ids4 = np.concatenate(chunks_i)
    above4 = np.where(is_leaf, starts4, above).astype(np.int32)

    # DENSE tiled node table (K4, 8, 128): node i lives in tile i>>7 at
    # lane i&127, fields down the sublanes. A (K,1,8) row layout pads the
    # lane dim to 128 -> 512 B/node in VMEM (measured: a 1M-node rbsp
    # table asked for 512 MB and faulted the chip); the tiled layout is a
    # true 32 B/node, so killeroo rbsp-3 (1.06M nodes) is 34 MB and fits
    # the 128 MB v5e VMEM with room for the interval stacks. The kernel
    # extracts per-node fields with a lane-mask reduction (dynamic-lane
    # scalar loads are not legal in Mosaic).
    pack_rows = np.zeros((k, 8), np.float32)
    pack_rows[:, 0:3] = ndir
    pack_rows[:, 3] = split
    pack_rows[:, 4] = is_leaf.astype(np.float32)
    pack_rows[:, 5] = above4.astype(np.float32)
    pack_rows[:, 6] = nprims.astype(np.float32)
    k4 = (k + 127) // 128
    pad_n = k4 * 128 - k
    if pad_n:
        # padded slots are 0-prim leaves (never reachable, but harmless)
        pad_rows = np.zeros((pad_n, 8), np.float32)
        pad_rows[:, 4] = 1.0
        pack_rows = np.concatenate([pack_rows, pad_rows])
    pack = pack_rows.reshape(k4, 128, 8).transpose(0, 2, 1).copy()
    assert k < (1 << 24) and len(prim_rows4) < (1 << 24), \
        "node/prim ids must stay exact in f32"

    # tree depth for the packet kernel's fixed-size stacks (the DFS pushes
    # at most depth+1 entries; a deeper tree would overflow nstk/lo_stk)
    depth = np.zeros(k, np.int32)
    interior = np.flatnonzero(~is_leaf)
    assert (above[interior] > interior).all(), "preorder child-id invariant"
    for i in interior:  # children always have larger ids (preorder flatten)
        dn = depth[i] + 1
        if depth[i + 1] < dn:
            depth[i + 1] = dn
        a = above[i]
        if depth[a] < dn:
            depth[a] = dn
    return pack, prim_rows4, prim_ids4, above4, int(depth.max()) + 1


def build_alt_accel(scene, name: str, params=None):
    """MakeAccelerator counterpart for the kd/BSP family (api.cpp:790-1016):
    build the requested tree with the native builders and return the flat
    node dict (jnp) + direction table. Returns None for BVH names."""
    import jax.numpy as jnp
    import numpy as np

    from tpupt.accel.bvh import scene_prim_bounds
    from tpupt.native import build_bsp, build_kdtree, build_rbsp
    from tpupt.scene.device import pack_prim_rows

    if name in ("bvh", "bvhold", "", None):
        return None
    lo, hi = scene_prim_bounds(scene)
    p = params
    icost = p.find_one_float("intersectcost", 80.0) if p else 80.0
    tcost = p.find_one_float("traversalcost", 1.0) if p else 1.0
    ebonus = p.find_one_float("emptybonus", 0.5) if p else 0.5
    maxp = p.find_one_int("maxprims", 1) if p else 1
    maxd = p.find_one_int("maxdepth", -1) if p else -1

    if name in ("kdtree", "kdtreeold"):
        out = build_kdtree(lo, hi, icost, tcost, ebonus, maxp, maxd)
        dirs = np.eye(3)
    elif name.startswith("bsp"):
        # unrestricted-BSP family with per-node direction policies
        # (MakeAccelerator names api.cpp:847-1006): bsp{cluster,arbitrary,
        # random}[withkd|fastkd], bsppaper, bsppaperkd
        base = name[3:]
        if base.startswith("paper"):
            policy, kd_mode = "paper", ("fastkd" if base == "paperkd" else "")
        else:
            policy = next(q for q in ("cluster", "arbitrary", "random")
                          if base.startswith(q))
            kd_mode = base[len(policy):]
        n_dirs = p.find_one_int("nbDirections", 3) if p else 3
        tcost = p.find_one_float("traversalcost", 5.0) if p else 5.0
        kd_tcost = p.find_one_float("kdtraversalcost", 1.0) if p else 1.0
        ebonus = p.find_one_float("emptybonus", 0.0) if p else 0.0
        pts, npts, normals = scene_prim_points(scene, lo, hi)
        wlo, whi = scene.world_bounds()
        out = build_bsp(pts, npts, normals, wlo, whi, policy=policy,
                        kd_mode=kd_mode, k=n_dirs, isect_cost=icost,
                        traversal_cost=tcost, kd_traversal_cost=kd_tcost,
                        empty_bonus=ebonus, max_prims=maxp, max_depth=maxd)
        prim_rows = pack_prim_rows(scene, out["prim_ids"])
        max_leaf = int(out["nprims"].max()) if len(out["nprims"]) else 1
        raw = dict(flags=out["flags"], split=out["split"],
                   above=out["above"], nprims=out["nprims"],
                   prim_ids=out["prim_ids"], prim_rows=prim_rows,
                   ndir=out["ndir"])
        pack, prim_rows4, prim_ids4, above4, tree_depth = pack_kdbsp_nodes(
            raw, np.eye(3, dtype=np.float32))
        nodes = dict(
            flags=jnp.asarray(out["flags"]),
            split=jnp.asarray(out["split"]),
            above=jnp.asarray(above4),
            nprims=jnp.asarray(out["nprims"]),
            prim_ids=jnp.asarray(prim_ids4),
            prim_rows=jnp.asarray(prim_rows4),
            ndir=jnp.asarray(out["ndir"]),
            pack=jnp.asarray(pack),
        )
        stats = dict(n_nodes=out["n_nodes"],
                     build_seconds=out["build_seconds"], max_leaf=max_leaf,
                     n_leaves=int((out["flags"] == 1).sum()),
                     n_kd_nodes=out["n_kd_nodes"],
                     n_bsp_nodes=out["n_bsp_nodes"], tree_depth=tree_depth)
        return nodes, jnp.eye(3, dtype=jnp.float32), max_leaf, stats
    else:
        # RBSP defaults differ from kd (CreateRBSPTreeAccelerator,
        # rbsp.cpp:551-556): traversalcost 5, emptybonus 0
        n_dirs = p.find_one_int("nbDirections", 3) if p else 3
        tcost = p.find_one_float("traversalcost", 5.0) if p else 5.0
        ebonus = p.find_one_float("emptybonus", 0.0) if p else 0.0
        dirs = get_directions(n_dirs)
        t = scene.triangles
        # per-prim projected bounds along every direction
        # (Triangle::getBounds(Vector3f), triangle.cpp:661)
        if t.count:
            pr0 = t.p0 @ dirs.T
            pr1 = t.p1 @ dirs.T
            pr2 = t.p2 @ dirs.T
            tmin = np.minimum(np.minimum(pr0, pr1), pr2)
            tmax = np.maximum(np.maximum(pr0, pr1), pr2)
        else:
            tmin = np.zeros((0, len(dirs)))
            tmax = np.zeros((0, len(dirs)))
        if scene.spheres.count:
            # sphere projected bounds from AABB corners (conservative)
            corners = np.stack(np.meshgrid(*[[0, 1]] * 3, indexing="ij"),
                               -1).reshape(8, 3)
            slo, shi = lo[t.count:], hi[t.count:]
            pts = slo[:, None, :] + corners[None] * (shi - slo)[:, None, :]
            proj = pts @ dirs.T
            tmin = np.concatenate([tmin, proj.min(1)])
            tmax = np.concatenate([tmax, proj.max(1)])
        wlo, whi = scene.world_bounds()
        out = build_rbsp(dirs, tmin, tmax, wlo, whi, icost, tcost, ebonus,
                         maxp, maxd)

    prim_rows = pack_prim_rows(scene, out["prim_ids"])
    max_leaf = int(out["nprims"].max()) if len(out["nprims"]) else 1
    raw = dict(flags=out["flags"], split=out["split"], above=out["above"],
               nprims=out["nprims"], prim_ids=out["prim_ids"],
               prim_rows=prim_rows)
    pack, prim_rows4, prim_ids4, above4, tree_depth = pack_kdbsp_nodes(
        raw, dirs.astype(np.float32))
    nodes = dict(
        flags=jnp.asarray(out["flags"]),
        split=jnp.asarray(out["split"]),
        above=jnp.asarray(above4),
        nprims=jnp.asarray(out["nprims"]),
        prim_ids=jnp.asarray(prim_ids4),
        prim_rows=jnp.asarray(prim_rows4),
        pack=jnp.asarray(pack),
    )
    stats = dict(n_nodes=out["n_nodes"], build_seconds=out["build_seconds"],
                 max_leaf=max_leaf,
                 n_leaves=int((out["flags"] >= len(dirs)).sum()),
                 tree_depth=tree_depth)
    return nodes, jnp.asarray(dirs.astype(np.float32)), max_leaf, stats


def node_type_depth_maps(nodes, dirs):
    """Node-type depth histograms (GenericBSP::writeNodeTypeDepthMaps,
    genericBSP.h:132-152): {kd,bsp,leaf}NodeDepths as {depth: count}.
    KD = axis-aligned split direction, BSP = arbitrary direction."""
    import numpy as np

    flags = np.asarray(nodes["flags"])
    above = np.asarray(nodes["above"])
    per_node = "ndir" in nodes
    n_dirs = np.asarray(dirs).shape[0]
    if per_node:
        ndir = np.asarray(nodes["ndir"])
        is_leaf = flags == 1
        axis_aligned = (np.abs(ndir) > 1 - 1e-6).any(-1)
    else:
        is_leaf = flags >= n_dirs
        axis_aligned = flags < 3  # first 3 table entries are the axes
    maps = {"kdNodeDepths": {}, "bspNodeDepths": {}, "leafNodeDepths": {}}
    if not len(flags):
        return maps
    stack = [(0, 0)]
    while stack:
        node, depth = stack.pop()
        if is_leaf[node]:
            m = maps["leafNodeDepths"]
        elif axis_aligned[node]:
            m = maps["kdNodeDepths"]
        else:
            m = maps["bspNodeDepths"]
        m[depth] = m.get(depth, 0) + 1
        if not is_leaf[node]:
            stack.append((node + 1, depth + 1))
            stack.append((int(above[node]), depth + 1))
    return maps


def dump_tree(nodes, dirs, path):
    """Full-tree text serialization (GenericBSP::operator<<,
    genericBSP.h:107-130: direction count + directions, node count + nodes,
    then per-leaf prim ids). Off by default in the reference too
    (writeFile=false, api.cpp:794)."""
    import numpy as np

    flags = np.asarray(nodes["flags"])
    split = np.asarray(nodes["split"])
    above = np.asarray(nodes["above"])
    nprims = np.asarray(nodes["nprims"])
    prim_ids = np.asarray(nodes["prim_ids"])
    per_node = "ndir" in nodes
    d = np.asarray(dirs)
    with open(path, "w") as f:
        f.write(f"{len(d)}\n")
        for row in d:
            f.write(f"{row[0]} {row[1]} {row[2]}\n")
        f.write(f"{len(flags)}\n")
        nd = np.asarray(nodes["ndir"]) if per_node else None
        for i in range(len(flags)):
            leaf = (flags[i] == 1) if per_node else (flags[i] >= len(d))
            if leaf:
                ids = prim_ids[above[i]: above[i] + nprims[i]]
                f.write("L " + " ".join(str(int(x)) for x in ids) + "\n")
            elif per_node:
                f.write(f"B {nd[i][0]} {nd[i][1]} {nd[i][2]} "
                        f"{split[i]} {above[i]}\n")
            else:
                f.write(f"I {flags[i]} {split[i]} {above[i]}\n")


def intersect_kdbsp(nodes, dirs, ds, st, o, d, tmax, max_leaf: int,
                    any_hit: bool = False):
    """nodes: dict of jnp arrays (flags/split/above/first/count/prim_ids);
    dirs: (D, 3) direction table (D small: 3 for kd, <=13 for rbsp)."""
    n = o.shape[0]
    n_dirs = dirs.shape[0]
    perm = ray_permutation(d)
    i32 = jnp.int32
    lane = jax.lax.broadcasted_iota(i32, (n, STACK_DEPTH), 1)

    # unrestricted-BSP trees carry a full split direction per interior node
    # (BSP.h:11-60); kd/RBSP trees index a small shared direction table
    per_node = "ndir" in nodes

    # ray projections onto every direction (D small -> dense matmul, no
    # gathers; the kd fast path of rbspKd.cpp:69-90 falls out for free)
    o_proj = o @ dirs.T   # (N, D)
    d_proj = d @ dirs.T   # (N, D)

    # clip to world bounds for the initial (tmin, tmax)
    from tpupt.core.vecmath import ray_inv_d

    inv_d = ray_inv_d(d)
    t_lo = (ds.world_lo - o) * inv_d
    t_hi = (ds.world_hi - o) * inv_d
    t0 = jnp.maximum(jnp.max(jnp.minimum(t_lo, t_hi), -1), 0.0)
    t1 = jnp.minimum(jnp.min(jnp.maximum(t_lo, t_hi), -1), tmax)
    miss_world = t0 > t1

    class _S(NamedTuple):
        sp: jnp.ndarray
        snode: jnp.ndarray
        stmin: jnp.ndarray
        stmax: jnp.ndarray
        node: jnp.ndarray
        tmin: jnp.ndarray
        tmaxn: jnp.ndarray
        have: jnp.ndarray   # current (node,tmin,tmax) valid
        t: jnp.ndarray
        prim: jnp.ndarray
        b1: jnp.ndarray
        b2: jnp.ndarray
        p_obj: jnp.ndarray
        nodes_v: jnp.ndarray
        leaves_v: jnp.ndarray
        tests: jnp.ndarray

    init = _S(
        sp=jnp.zeros(n, i32),
        snode=jnp.zeros((n, STACK_DEPTH), i32),
        stmin=jnp.zeros((n, STACK_DEPTH)),
        stmax=jnp.zeros((n, STACK_DEPTH)),
        node=jnp.zeros(n, i32),
        tmin=t0, tmaxn=t1,
        have=~miss_world,
        t=jnp.asarray(tmax, jnp.float32),
        prim=jnp.full(n, -1, i32),
        b1=jnp.zeros(n), b2=jnp.zeros(n),
        p_obj=jnp.zeros((n, 3)),
        nodes_v=jnp.zeros(n, i32), leaves_v=jnp.zeros(n, i32),
        tests=jnp.zeros(n, i32),
    )

    flags = nodes["flags"]
    split = nodes["split"]
    above = nodes["above"]
    nprims = nodes["nprims"]
    first = nodes["above"]  # for leaves, 'above' holds the prim offset
    prim_rows = nodes["prim_rows"]
    n_rows = prim_rows.shape[0]

    def cond(s: _S):
        return jnp.any(s.have | (s.sp > 0))

    def body(s: _S):
        # refill from stack where no current node
        need = ~s.have & (s.sp > 0)
        top = jnp.maximum(s.sp - 1, 0)
        pn = jnp.take_along_axis(s.snode, top[:, None], 1)[:, 0]
        ptmin = jnp.take_along_axis(s.stmin, top[:, None], 1)[:, 0]
        ptmax = jnp.take_along_axis(s.stmax, top[:, None], 1)[:, 0]
        node = jnp.where(need, pn, s.node)
        tmin = jnp.where(need, ptmin, s.tmin)
        tmax_n = jnp.where(need, ptmax, s.tmaxn)
        sp = jnp.where(need, s.sp - 1, s.sp)
        have = s.have | need
        # early-out: ray already found a hit closer than this cell
        have = have & ~(s.t < tmin)

        fl = flags[node]
        is_leaf = (fl == 1) if per_node else (fl >= n_dirs)
        active_int = have & ~is_leaf
        active_leaf = have & is_leaf
        nodes_v = s.nodes_v + active_int.astype(i32)
        leaves_v = s.leaves_v + active_leaf.astype(i32)

        # ---- interior: projected plane distance (rbsp.cpp:68-80) ----
        if per_node:
            nd = nodes["ndir"][node]          # (N, 3) gather
            op = jnp.sum(o * nd, -1)
            dp = jnp.sum(d * nd, -1)
        else:
            didx = jnp.minimum(fl, n_dirs - 1)
            op = jnp.take_along_axis(o_proj, didx[:, None], 1)[:, 0]
            dp = jnp.take_along_axis(d_proj, didx[:, None], 1)[:, 0]
        sp_t = split[node]
        t_plane = (sp_t - op) / jnp.where(jnp.abs(dp) < 1e-12, 1e-12, dp)
        below_first = (op < sp_t) | ((op == sp_t) & (dp <= 0))
        below = node + 1
        abv = above[node]
        first_child = jnp.where(below_first, below, abv)
        second_child = jnp.where(below_first, abv, below)
        # which children to visit (kdtreeaccel.cpp:430-450)
        only_first = (t_plane > tmax_n) | (t_plane <= 0)
        # pbrt's if/elif: only_first has PRIORITY over only_second
        # (kdtreeaccel.cpp:430 — both can hold when t_plane <= 0)
        only_second = (t_plane < tmin) & ~only_first
        both = active_int & ~only_first & ~only_second
        # push second child
        at = lane == sp[:, None]
        snode = jnp.where(at & both[:, None], second_child[:, None], s.snode)
        stmin = jnp.where(at & both[:, None], t_plane[:, None], s.stmin)
        stmax = jnp.where(at & both[:, None], tmax_n[:, None], s.stmax)
        sp2 = sp + both.astype(i32)
        node_next = jnp.where(
            active_int,
            jnp.where(only_second, second_child, first_child), node)
        tmax_next = jnp.where(active_int & both, t_plane, tmax_n)

        # ---- leaf: test prims (packed rows, contiguous in leaf order) ----
        cnt = nprims[node]
        pofs = first[node]

        def leaf_body(k, carry):
            t_cur, prim, b1, b2, p_obj, tests = carry
            valid = active_leaf & (k < cnt)
            ridx = jnp.minimum(pofs + k, n_rows - 1)
            prow = prim_rows[ridx]
            tests = tests + valid.astype(i32)
            p_gid = jax.lax.bitcast_convert_type(prow[:, 16], jnp.int32)
            p_is_tri = jax.lax.bitcast_convert_type(prow[:, 17], jnp.int32) == 1
            h_t, tt, _, tb1, tb2 = intersect_triangle(
                o, perm, prow[:, 0:3], prow[:, 3:6], prow[:, 6:9], t_cur)
            win = valid & p_is_tri & h_t & (tt > 1e-6) & (tt < t_cur)
            t_cur = jnp.where(win, tt, t_cur)
            prim = jnp.where(win, p_gid, prim)
            b1 = jnp.where(win, tb1, b1)
            b2 = jnp.where(win, tb2, b2)
            if st.n_spheres > 0:
                # unified quadric test from the packed row (shapes/quadric.py)
                m3 = prow[:, 0:12].reshape(n, 3, 4)
                o_s = jnp.einsum("nij,nj->ni", m3[:, :, :3], o) + m3[:, :, 3]
                d_s = jnp.einsum("nij,nj->ni", m3[:, :, :3], d)
                h_s, ts_c = quadric_test_parts(
                    prow[:, 20], prow[:, 12], prow[:, 13], prow[:, 14],
                    prow[:, 15], prow[:, 21], prow[:, 22],
                    prow[:, 23], prow[:, 24],
                    o_s[:, 0], o_s[:, 1], o_s[:, 2],
                    d_s[:, 0], d_s[:, 1], d_s[:, 2], t_cur)
                win_s = valid & ~p_is_tri & h_s
                t_cur = jnp.where(win_s, ts_c, t_cur)
                prim = jnp.where(win_s, p_gid, prim)
                p_obj = jnp.where(win_s[:, None],
                                  o_s + ts_c[:, None] * d_s, p_obj)
            return (t_cur, prim, b1, b2, p_obj, tests)

        t_cur, prim, b1, b2, p_obj, tests = jax.lax.fori_loop(
            0, jnp.minimum(jnp.max(jnp.where(active_leaf, cnt, 0)), max_leaf),
            leaf_body, (s.t, s.prim, s.b1, s.b2, s.p_obj, s.tests))

        # leaf done -> need refill; kd early exit: hit within cell
        done_leaf = active_leaf
        exit_hit = done_leaf & (t_cur <= tmax_n)
        have2 = have & ~done_leaf
        sp3 = jnp.where(exit_hit, 0, sp2)
        if any_hit:
            sp3 = jnp.where(prim >= 0, 0, sp3)
            have2 = have2 & ~(prim >= 0)

        return _S(sp3, snode, stmin, stmax, node_next,
                  jnp.where(active_int & both, tmin, tmin), tmax_next,
                  have2, t_cur, prim, b1, b2, p_obj, nodes_v, leaves_v, tests)

    out = jax.lax.while_loop(cond, body, init)
    hit = Hit(valid=out.prim >= 0, t=out.t, prim=out.prim, b1=out.b1,
              b2=out.b2, p_obj=out.p_obj)
    return hit, TraversalStats(out.nodes_v, out.leaves_v, out.tests)
