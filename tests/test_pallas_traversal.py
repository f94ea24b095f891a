"""Pallas packet-traversal kernel equivalence tests (interpret mode).

The make-or-break TPU kernel (ops/traverse_pallas.py) must agree with the
XLA wide-BVH walker and the O(N*P) brute-force intersector on identical
geometry — closest-hit AND any-hit — and emit the full GeneralStats triple
(node visits / leaf visits / prim tests, bvh.cpp:379,421 parity).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupt.accel.traverse import intersect_brute, intersect_wide
from tpupt.ops.traverse_pallas import intersect_packets
from tpupt.scene.device import upload
from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string


def _random_scene(n_tris=60, n_spheres=0, seed=3):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-3, 3, (n_tris, 3))
    e1 = rng.normal(0, 0.4, (n_tris, 3))
    e2 = rng.normal(0, 0.4, (n_tris, 3))
    pts, idx = [], []
    for i in range(n_tris):
        pts.extend([c[i], c[i] + e1[i], c[i] + e2[i]])
        idx.extend([3 * i, 3 * i + 1, 3 * i + 2])
    p_str = " ".join(f"{v:.5f}" for row in pts for v in row)
    i_str = " ".join(str(i) for i in idx)
    sph = ""
    for i in range(n_spheres):
        x, y, z = rng.uniform(-3, 3, 3)
        r = rng.uniform(0.2, 0.8)
        sph += (f'AttributeBegin\nTranslate {x:.4f} {y:.4f} {z:.4f}\n'
                f'Shape "sphere" "float radius" [{r:.4f}]\nAttributeEnd\n')
    txt = f"""
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path"
WorldBegin
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [{p_str}] "integer indices" [{i_str}]
{sph}
WorldEnd
"""
    return upload(flatten(parse_string(txt)))


def _quadric_scene(seed=5):
    """A few triangles plus one of EVERY analytic quadric kind, each under a
    random rigid transform — exercises the unified quadric row test
    (shapes/quadric.py) through every traversal backend."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(-3, 3, (20, 3))
    e1 = rng.normal(0, 0.5, (20, 3))
    e2 = rng.normal(0, 0.5, (20, 3))
    pts, idx = [], []
    for i in range(20):
        pts.extend([c[i], c[i] + e1[i], c[i] + e2[i]])
        idx.extend([3 * i, 3 * i + 1, 3 * i + 2])
    p_str = " ".join(f"{v:.5f}" for row in pts for v in row)
    i_str = " ".join(str(i) for i in idx)
    shapes = [
        'Shape "sphere" "float radius" [0.7]',
        'Shape "cylinder" "float radius" [0.5] "float zmin" [-0.6]'
        ' "float zmax" [0.9]',
        'Shape "disk" "float radius" [1.1] "float height" [0.2]'
        ' "float innerradius" [0.3]',
        'Shape "cone" "float radius" [0.8] "float height" [1.2]',
        'Shape "paraboloid" "float radius" [0.7] "float zmax" [1.0]',
        'Shape "hyperboloid" "point p1" [0.8 0 -0.3] "point p2" [0.4 0 0.9]',
        'Shape "cylinder" "float radius" [0.5] "float zmax" [1.0]'
        ' "float phimax" [220]',
    ]
    body = ""
    for s in shapes:
        x, y, z = rng.uniform(-2.5, 2.5, 3)
        ax = rng.normal(0, 1, 3)
        ax /= np.linalg.norm(ax)
        ang = rng.uniform(0, 360)
        body += (f'AttributeBegin\nTranslate {x:.4f} {y:.4f} {z:.4f}\n'
                 f'Rotate {ang:.3f} {ax[0]:.4f} {ax[1]:.4f} {ax[2]:.4f}\n'
                 f'{s}\nAttributeEnd\n')
    txt = f"""
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path"
WorldBegin
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [{p_str}] "integer indices" [{i_str}]
{body}
WorldEnd
"""
    sc = flatten(parse_string(txt))
    return (sc,) + upload(sc)


def test_quadric_kinds_all_backends():
    """Every quadric kind through pallas(interpret) == wide == brute,
    closest-hit t, prim id, and hit mask (cylinder.cpp/disk.cpp/cone.cpp/
    paraboloid.cpp/hyperboloid.cpp Intersect parity, batched)."""
    sc, ds, st = _quadric_scene()
    assert st.n_spheres == 7
    # aimed rays: origins on a radius-7 sphere, directions toward random
    # targets inside the geometry's extent (random-direction rays mostly
    # miss and leave the quadric branches untested)
    rng = np.random.default_rng(19)
    o = rng.normal(0, 1, (1024, 3))
    o = 7.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    tgt = rng.uniform(-2.5, 2.5, (1024, 3))
    d = tgt - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    tmax = jnp.full(1024, np.inf)
    hit_p, _ = intersect_packets(ds, st, o, d, tmax, interpret=True)
    hit_w, _ = intersect_wide(ds, st, o, d, tmax)
    hit_b = intersect_brute(ds, st, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(hit_p.valid),
                                  np.asarray(hit_b.valid))
    np.testing.assert_array_equal(np.asarray(hit_w.valid),
                                  np.asarray(hit_b.valid))
    m = np.asarray(hit_b.valid)
    assert m.sum() > 100  # the quadrics are actually being hit
    qhits = m & (np.asarray(hit_b.prim) >= st.n_tris)
    assert qhits.sum() > 50
    np.testing.assert_allclose(np.asarray(hit_p.t)[m],
                               np.asarray(hit_b.t)[m], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit_w.t)[m],
                               np.asarray(hit_b.t)[m], rtol=2e-4, atol=1e-5)
    same = np.asarray(hit_p.prim)[m] == np.asarray(hit_b.prim)[m]
    assert same.mean() > 0.99
    # the kd/BSP unified walker sees the same quadric rows
    from tpupt.accel.kdbsp import build_alt_accel, intersect_kdbsp
    from tpupt.scene.params import ParamSet

    nodes, dirs, max_leaf, _ = build_alt_accel(sc, "kdtree", ParamSet())
    hit_k, _ = intersect_kdbsp(nodes, dirs, ds, st, o, d, tmax, max_leaf)
    np.testing.assert_array_equal(np.asarray(hit_k.valid), m)
    np.testing.assert_allclose(np.asarray(hit_k.t)[m],
                               np.asarray(hit_b.t)[m], rtol=2e-4, atol=1e-5)


def _random_rays(n, seed=7):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.full(n, np.inf)


@pytest.mark.parametrize("n_spheres", [0, 5], ids=["tris", "tris+spheres"])
def test_pallas_matches_wide_and_brute(n_spheres):
    ds, st = _random_scene(n_spheres=n_spheres)
    o, d, tmax = _random_rays(256)

    hit_p, stats_p = intersect_packets(ds, st, o, d, tmax, interpret=True)
    hit_w, stats_w = intersect_wide(ds, st, o, d, tmax)
    hit_b = intersect_brute(ds, st, o, d, tmax)

    np.testing.assert_array_equal(np.asarray(hit_p.valid),
                                  np.asarray(hit_b.valid))
    np.testing.assert_array_equal(np.asarray(hit_w.valid),
                                  np.asarray(hit_b.valid))
    m = np.asarray(hit_b.valid)
    np.testing.assert_allclose(np.asarray(hit_p.t)[m],
                               np.asarray(hit_b.t)[m], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit_w.t)[m],
                               np.asarray(hit_b.t)[m], rtol=2e-4, atol=1e-5)
    # prim ids agree wherever the closest hit is unique (tie fraction ~0
    # for random geometry)
    same = np.asarray(hit_p.prim)[m] == np.asarray(hit_b.prim)[m]
    assert same.mean() > 0.99
    # barycentrics agree on matching triangle hits
    tri = m & (np.asarray(hit_b.prim) < st.n_tris) \
        & (np.asarray(hit_p.prim) == np.asarray(hit_b.prim))
    np.testing.assert_allclose(np.asarray(hit_p.b1)[tri],
                               np.asarray(hit_b.b1)[tri], atol=2e-3)


def test_pallas_any_hit_matches_wide():
    ds, st = _random_scene()
    o, d, tmax = _random_rays(256, seed=11)
    hit_p, _ = intersect_packets(ds, st, o, d, tmax, any_hit=True,
                                 interpret=True)
    hit_b = intersect_brute(ds, st, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(hit_p.valid),
                                  np.asarray(hit_b.valid))


def test_pallas_stats_nonzero():
    """Leaf visits and prim tests must be populated on the fast path —
    round 1 returned zeros exactly in the measured configuration."""
    ds, st = _random_scene()
    o, d, tmax = _random_rays(256)
    hit_p, stats = intersect_packets(ds, st, o, d, tmax, interpret=True)
    nodes = np.asarray(stats.node_visits)
    leaves = np.asarray(stats.leaf_visits)
    tests = np.asarray(stats.prim_tests)
    assert nodes.sum() > 0
    assert leaves.sum() > 0
    assert tests.sum() > 0
    # every hit needed at least one leaf visit and one prim test
    m = np.asarray(hit_p.valid)
    assert (leaves[m] >= 1).all()
    assert (tests[m] >= 1).all()
