"""Thesis accelerator-family tests: native builders, kDOP polytope areas
(pattern: src/tests/kdop.cpp), kd/RBSP traversal agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupt.native import (build_bvh_sah, build_kdtree, build_rbsp,
                          polytope_cut_area)
from tpupt.accel.kdbsp import build_alt_accel, get_directions, intersect_kdbsp
from tpupt.accel.traverse import intersect_wide
from tpupt.scene.device import upload
from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string
from tpupt.scene.params import ParamSet
from tpupt.cameras.perspective import generate_rays

S2, S3 = np.sqrt(2), np.sqrt(3)


# --------------------- kDOP polytope areas (kdop.cpp) ----------------------


@pytest.mark.parametrize("dirs,ts,want", [
    ([], [], 6.0),                                        # unit cube
    ([[1, 0, 0]], [0.5], 4.0),                            # axis cut
    ([[1 / S2, 1 / S2, 0]], [1 / S2], 3 + S2),            # edge-diagonal cut
    ([[1 / S3, 1 / S3, 1 / S3]], [1 / S3], 1.5 + S3 / 2),  # corner cut
    ([[1, 0, 0], [0, 1, 0]], [0.5, 0.5], 2.5),            # two cuts
    ([[1, 0, 0]], [2.0], 6.0),                            # cut outside
    ([[1, 0, 0]], [1.0], 6.0),                            # in-plane (CutFailing)
    ([[-1, 0, 0]], [-0.5], 4.0),                          # negative direction
])
def test_polytope_cut_areas(dirs, ts, want):
    got = polytope_cut_area([0, 0, 0], [1, 1, 1],
                            np.array(dirs).reshape(-1, 3), np.array(ts))
    assert abs(got - want) < 1e-9, (got, want)


def test_direction_sets():
    for n, count in ((3, 3), (7, 7), (9, 9), (13, 13)):
        d = get_directions(n)
        assert d.shape == (count, 3)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-12)


# --------------------------- native builders -------------------------------


def test_sweep_sah_bvh_structure():
    rng = np.random.default_rng(0)
    n = 500
    c = rng.random((n, 3))
    h = rng.random((n, 3)) * 0.05
    b = build_bvh_sah(c - h, c + h)
    covered = []
    for i in range(b.n_nodes):
        if b.count[i] > 0:
            covered.extend(b.prim_ids[b.first[i]: b.first[i] + b.count[i]])
    assert sorted(covered) == list(range(n))
    stack = [0]
    while stack:
        i = stack.pop()
        if b.count[i] == 0:
            for ch in (i + 1, int(b.right[i])):
                assert (b.lo[i] <= b.lo[ch] + 1e-6).all()
                assert (b.hi[i] >= b.hi[ch] - 1e-6).all()
            stack += [i + 1, int(b.right[i])]


def test_kdtree_covers_all_prims():
    rng = np.random.default_rng(1)
    n = 300
    c = rng.random((n, 3))
    h = rng.random((n, 3)) * 0.05
    out = build_kdtree(c - h, c + h)
    assert set(out["prim_ids"]) == set(range(n))
    assert (out["flags"] <= 3).all()
    assert out["build_seconds"] < 5.0


def test_rbsp_covers_all_prims():
    rng = np.random.default_rng(2)
    n = 100
    c = rng.random((n, 3))
    h = rng.random((n, 3)) * 0.05
    lo, hi = c - h, c + h
    dirs = get_directions(7)
    corners = np.stack(np.meshgrid(*[[0, 1]] * 3, indexing="ij"), -1).reshape(8, 3)
    pts = lo[:, None] + corners[None] * (hi - lo)[:, None]
    proj = pts @ dirs.T
    out = build_rbsp(dirs, proj.min(1), proj.max(1), lo.min(0), hi.max(0))
    assert set(out["prim_ids"]) == set(range(n))
    assert (out["flags"] <= len(dirs)).all()
    # some non-axis splits should be chosen for random geometry
    interior = out["flags"][out["flags"] < len(dirs)]
    assert len(interior) > 0


def test_bsp_family_covers_all_prims():
    """Every BSP-family policy partitions all prims into leaves, and the
    paper policy actually selects triangle-derived (non-axis) planes."""
    from tpupt.native import build_bsp

    rng = np.random.default_rng(3)
    n = 80
    v0 = rng.random((n, 3)) * 2 - 1
    v1 = v0 + rng.normal(0, 0.15, (n, 3))
    v2 = v0 + rng.normal(0, 0.15, (n, 3))
    pts = np.zeros((n, 8, 3))
    pts[:, 0], pts[:, 1], pts[:, 2] = v0, v1, v2
    npts = np.full(n, 3, np.int32)
    nrm = np.cross(v1 - v0, v2 - v0)
    nrm /= np.maximum(np.linalg.norm(nrm, -1, keepdims=True), 1e-20)
    lo = pts[:, :3].min(1).min(0) - 0.01
    hi = pts[:, :3].max(1).max(0) + 0.01
    for policy, kd_mode in [("cluster", ""), ("arbitrary", ""),
                            ("random", ""), ("cluster", "withkd"),
                            ("random", "fastkd"), ("paper", ""),
                            ("paper", "fastkd")]:
        out = build_bsp(pts, npts, nrm, lo, hi, policy=policy,
                        kd_mode=kd_mode, k=4)
        leaf = out["flags"] == 1
        assert set(out["prim_ids"]) == set(range(n)), (policy, kd_mode)
        # interior nodes carry unit split directions
        nd = out["ndir"][~leaf]
        if len(nd):
            np.testing.assert_allclose(np.linalg.norm(nd, axis=1), 1.0,
                                       atol=1e-5)
        if policy == "paper":
            assert out["n_bsp_nodes"] > 0  # non-axis planes chosen


# ----------------------- traversal cross-validation ------------------------

_SCENE = """
LookAt 3 2 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [40] "integer yresolution" [40]
WorldBegin
Material "matte"
Shape "trianglemesh" "point P" [-2 -1 0  2 -1 0  2 1 0  -2 1 0] "integer indices" [0 1 2 2 3 0]
Shape "sphere" "float radius" [0.6]
AttributeBegin
  Translate 0.8 0.5 1.2
  Shape "sphere" "float radius" [0.3]
AttributeEnd
Shape "trianglemesh" "point P" [-3 -3 -1  3 -3 -1  3 3 -1  -3 3 -1] "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _camera_rays(sc, ds, res=40):
    px, py = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
    pr = jnp.asarray(np.stack([px.ravel() + 0.5, py.ravel() + 0.5], -1),
                     jnp.float32)
    return generate_rays(0, ds.raster_to_camera, ds.cam_to_world, pr,
                         jnp.zeros((res * res, 2)), 0.0, 1e6)


@pytest.mark.parametrize("accel,ndirs", [
    ("kdtree", None), ("rbsp", 3), ("rbsp", 7), ("rbsp", 13),
    # unrestricted-BSP family: per-node direction policies
    # (bspCluster/bspArbitrary/bspRandom[.WithKd/.FastKd], bspPaper[Kd])
    ("bspcluster", 3), ("bsparbitrary", 4), ("bsprandom", 4),
    ("bspclusterwithkd", 6), ("bsparbitraryfastkd", 6),
    ("bsprandomwithkd", 6), ("bsppaper", None), ("bsppaperkd", None),
])
def test_kdbsp_traversal_matches_bvh(accel, ndirs):
    sc = flatten(parse_string(_SCENE))
    ds, st = upload(sc)
    ps = ParamSet()
    if ndirs:
        ps.add("integer nbDirections", [ndirs])
    nodes, dirs, max_leaf, stats = build_alt_accel(sc, accel, ps)
    o, d = _camera_rays(sc, ds)
    tmax = jnp.full(o.shape[0], jnp.inf)
    h_ref, _ = intersect_wide(ds, st, o, d, tmax)
    h, s = intersect_kdbsp(nodes, dirs, ds, st, o, d, tmax, max_leaf)
    v1, v2 = np.array(h_ref.valid), np.array(h.valid)
    assert (v1 == v2).all()
    m = v1 & v2
    assert (np.array(h_ref.prim)[m] == np.array(h.prim)[m]).all()
    np.testing.assert_allclose(np.array(h_ref.t)[m], np.array(h.t)[m],
                               rtol=1e-3)
    # any-hit agrees too
    occ, _ = intersect_kdbsp(nodes, dirs, ds, st, o, d, tmax, max_leaf,
                             any_hit=True)
    assert (np.array(occ.valid) == v1).all()


# ------------------ Pallas packet kd/BSP kernel (interpret) -----------------


@pytest.mark.parametrize("accel,ndirs", [
    ("kdtree", None), ("rbsp", 7), ("bspcluster", 3), ("bsppaper", None),
])
@pytest.mark.slow
def test_kdbsp_packets_match_xla(accel, ndirs):
    """ops/traverse_kdbsp.py packet kernel == the XLA lockstep walker on
    closest-hit AND any-hit, for kd, RBSP and per-node-direction BSP trees
    (the packed node rows carry explicit directions for all three)."""
    from tpupt.ops.traverse_kdbsp import intersect_kdbsp_packets

    sc = flatten(parse_string(_SCENE))
    ds, st = upload(sc)
    ps = ParamSet()
    if ndirs:
        ps.add("integer nbDirections", [ndirs])
    nodes, dirs, max_leaf, stats = build_alt_accel(sc, accel, ps)
    ds = ds._replace(alt_pack=nodes["pack"],
                     alt_prim_rows=nodes["prim_rows"])
    o, d = _camera_rays(sc, ds)
    # mix in incoherent rays: reversed directions from scattered origins
    o2 = jnp.concatenate([o, o[::-1] * 0.3 + 0.2])
    d2 = jnp.concatenate([d, -d[::-1]])
    tmax = jnp.full(o2.shape[0], jnp.inf)
    h_ref, _ = intersect_kdbsp(nodes, dirs, ds, st, o2, d2, tmax, max_leaf)
    h, s = intersect_kdbsp_packets(ds, st, o2, d2, tmax, interpret=True,
                                   with_stats=True)
    v1, v2 = np.array(h_ref.valid), np.array(h.valid)
    assert (v1 == v2).all()
    m = v1 & v2
    assert (np.array(h_ref.prim)[m] == np.array(h.prim)[m]).all()
    np.testing.assert_allclose(np.array(h_ref.t)[m], np.array(h.t)[m],
                               rtol=1e-3)
    assert int(np.asarray(s.node_visits).sum()) > 0
    # any-hit agreement
    h_any, _ = intersect_kdbsp_packets(ds, st, o2, d2, tmax, any_hit=True,
                                       interpret=True)
    assert (np.array(h_any.valid) == v1).all()


@pytest.mark.parametrize("accel,ndirs", [("kdtree", None), ("rbsp", 3)])
def test_kdbsp_packets_smoke_fast(accel, ndirs):
    """FAST-tier smoke of the Pallas packet walker (interpret mode, one
    1024-ray packet): the default CI run must exercise the kernel that is
    the production kd/BSP path on TPU — including an RBSP node table,
    whose 1M-node killeroo variant faulted the chip in round 4 while only
    kd tables were ever tested."""
    from tpupt.ops.traverse_kdbsp import intersect_kdbsp_packets

    sc = flatten(parse_string(_SCENE))
    ds, st = upload(sc)
    ps = ParamSet()
    if ndirs:
        ps.add("integer nbDirections", [ndirs])
    nodes, dirs, max_leaf, stats = build_alt_accel(sc, accel, ps)
    assert stats["tree_depth"] >= 1
    ds = ds._replace(alt_pack=nodes["pack"],
                     alt_prim_rows=nodes["prim_rows"])
    o, d = _camera_rays(sc, ds, res=32)  # exactly one 1024-ray packet
    tmax = jnp.full(o.shape[0], jnp.inf)
    h_ref, _ = intersect_kdbsp(nodes, dirs, ds, st, o, d, tmax, max_leaf)
    h, s = intersect_kdbsp_packets(ds, st, o, d, tmax, interpret=True,
                                   with_stats=True)
    v1, v2 = np.array(h_ref.valid), np.array(h.valid)
    assert (v1 == v2).all()
    m = v1 & v2
    assert (np.array(h_ref.prim)[m] == np.array(h.prim)[m]).all()
    np.testing.assert_allclose(np.array(h_ref.t)[m], np.array(h.t)[m],
                               rtol=1e-3)
    assert int(np.asarray(s.node_visits).sum()) > 0
