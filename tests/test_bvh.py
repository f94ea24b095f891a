"""BVH build + traversal tests (pattern: reference kdop.cpp BVH tests and
the analytic validation strategy of SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpupt.accel.bvh import build_bvh
from tpupt.accel.traverse import intersect, intersect_brute, intersect_p
from tpupt.scene.api import MaterialSpec
from tpupt.scene.flatten import (CameraConfig, FilmConfig, FlatScene,
                                 IntegratorConfig, Lights, SamplerConfig,
                                 Spheres, Triangles, _MaterialTable)
from tpupt.scene.params import ParamSet
from tpupt.scene.device import upload


def _empty_lights():
    return Lights(np.zeros(0, np.int32), np.zeros((0, 3), np.float32),
                  np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                  np.zeros(0, np.int32), np.zeros(0, np.int32),
                  np.zeros(0, bool), np.zeros(0, np.float32),
                  np.zeros(0, np.float32))


def _empty_spheres():
    return Spheres(np.zeros((0, 4, 4), np.float32), np.zeros((0, 4, 4), np.float32),
                   np.zeros(0, np.float32), np.zeros(0, np.float32),
                   np.zeros(0, np.float32), np.zeros(0, np.float32),
                   np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0, bool))


def _tri_scene(p0, p1, p2):
    T = len(p0)
    z3 = np.zeros((T, 3), np.float32)
    z2 = np.zeros((T, 2), np.float32)
    tris = Triangles(p0.astype(np.float32), p1.astype(np.float32),
                     p2.astype(np.float32), z3, z3, z3, z2, z2, z2,
                     np.zeros(T, np.int32), np.full(T, -1, np.int32))
    mt = _MaterialTable({})
    mt.add(MaterialSpec("matte", ParamSet()))
    cam = CameraConfig(0, np.eye(4, dtype=np.float32),
                       np.eye(4, dtype=np.float32), 0, 1e6, 0, 1, 45)
    film = FilmConfig(16, 16, (0, 1, 0, 1), "x.exr", 0, (0.5, 0.5), (), 1.0,
                      np.inf, 35.0)
    return FlatScene(tris, _empty_spheres(), mt.finalize(), _empty_lights(),
                     cam, film, SamplerConfig("halton", 4),
                     IntegratorConfig("path", 5))


def _random_soup(T=300, seed=1):
    rng = np.random.default_rng(seed)
    c = rng.random((T, 3)) * 2 - 1
    e1 = rng.normal(size=(T, 3)) * 0.2
    e2 = rng.normal(size=(T, 3)) * 0.2
    return _tri_scene(c, c + e1, c + e2)


def test_build_structure_and_coverage():
    rng = np.random.default_rng(0)
    for n in (1, 2, 5, 64, 1000):
        c = rng.random((n, 3))
        h = rng.random((n, 3)) * 0.1
        b = build_bvh(c - h, c + h)
        covered = []
        for i in range(b.n_nodes):
            if b.count[i] > 0:
                covered.extend(b.prim_ids[b.first[i]: b.first[i] + b.count[i]])
        assert sorted(covered) == list(range(n))
        stack = [0]
        while stack:
            i = stack.pop()
            if b.count[i] == 0:
                for ch in (i + 1, b.right[i]):
                    assert (b.lo[i] <= b.lo[ch] + 1e-6).all()
                    assert (b.hi[i] >= b.hi[ch] - 1e-6).all()
                stack += [i + 1, int(b.right[i])]


def test_traversal_matches_brute_force_triangles():
    scene = _random_soup()
    ds, st = upload(scene)
    rng = np.random.default_rng(3)
    N = 512
    o = jnp.asarray((rng.normal(size=(N, 3)) * 3).astype(np.float32))
    tgt = jnp.asarray((rng.random((N, 3)) * 2 - 1).astype(np.float32))
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full(N, 1e30, jnp.float32)
    hit, stats = intersect(ds, st, o, d, tmax)
    bh = intersect_brute(ds, st, o, d, tmax)
    va, vb = np.array(hit.valid), np.array(bh.valid)
    assert va.sum() > N // 4  # rays aimed at the soup actually hit
    assert (va == vb).all()
    m = va & vb
    assert (np.array(hit.prim)[m] == np.array(bh.prim)[m]).all()
    np.testing.assert_allclose(np.array(hit.t)[m], np.array(bh.t)[m],
                               rtol=1e-4, atol=1e-5)
    assert float(stats.node_visits.mean()) > 0


def test_traversal_respects_tmax():
    scene = _tri_scene(np.array([[0, -1, -1.0]]), np.array([[0, 1, -1.0]]),
                       np.array([[0, 0, 2.0]]))
    ds, st = upload(scene)
    o = jnp.array([[-5.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    hit, _ = intersect(ds, st, o, d, jnp.array([10.0]))
    assert bool(hit.valid[0]) and np.isclose(float(hit.t[0]), 5.0, atol=1e-4)
    hit2, _ = intersect(ds, st, o, d, jnp.array([4.0]))
    assert not bool(hit2.valid[0])


def test_intersect_p_occlusion():
    scene = _random_soup()
    ds, st = upload(scene)
    rng = np.random.default_rng(4)
    N = 256
    o = jnp.asarray((rng.normal(size=(N, 3)) * 3).astype(np.float32))
    tgt = jnp.asarray((rng.random((N, 3)) * 2 - 1).astype(np.float32))
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full(N, 1e30, jnp.float32)
    occ, _ = intersect_p(ds, st, o, d, tmax)
    bh = intersect_brute(ds, st, o, d, tmax)
    assert (np.array(occ) == np.array(bh.valid)).all()


def test_watertight_shared_edge():
    # Two triangles sharing an edge: rays through the shared edge must hit
    # exactly one of them (no cracks) — the watertightness property the
    # reference gets from triangle.cpp:188's algorithm.
    p0 = np.array([[0, -1, 0], [0, -1, 0.0]])
    p1 = np.array([[0, 1, 0], [0, 1, 0.0]])
    p2 = np.array([[0, 0, 1], [0, 0, -1.0]])
    scene = _tri_scene(p0, p1, p2)
    ds, st = upload(scene)
    # rays exactly through the shared edge (z=0 line)
    ys = np.linspace(-0.9, 0.9, 64)
    o = jnp.asarray(np.stack([np.full_like(ys, -3), ys, np.zeros_like(ys)], -1),
                    dtype=jnp.float32)
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (64, 1))
    hit, _ = intersect(ds, st, o, d, jnp.full(64, 1e30, jnp.float32))
    assert bool(hit.valid.all()), "crack along shared edge"


def test_sphere_vs_triangle_mixed_scene():
    from tpupt.scene.loader import parse_string
    from tpupt.scene.flatten import flatten

    txt = """
    Camera "perspective" "float fov" [60]
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    WorldBegin
    Material "matte" "color Kd" [.5 .5 .5]
    Shape "sphere" "float radius" [1]
    Shape "trianglemesh" "point P" [ -5 -5 -3  5 -5 -3  5 5 -3  -5 5 -3 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    scene = flatten(parse_string(txt))
    ds, st = upload(scene)
    assert st.n_tris == 2 and st.n_spheres == 1
    # ray down the z axis hits the sphere first, then the plane behind
    o = jnp.array([[0.0, 0.0, 5.0], [3.0, 3.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit, _ = intersect(ds, st, o, d, jnp.full(2, 1e30, jnp.float32))
    assert bool(hit.valid[0]) and int(hit.prim[0]) == st.n_tris  # sphere id
    assert np.isclose(float(hit.t[0]), 4.0, atol=1e-3)
    assert bool(hit.valid[1]) and int(hit.prim[1]) < st.n_tris  # plane
    assert np.isclose(float(hit.t[1]), 8.0, atol=1e-3)


def test_middle_equalcounts_split_methods():
    """bvhOld's Middle/EqualCounts research comparators (bvhOld.h:58-65):
    both must produce valid trees covering all prims, and renders through
    them must match the SAH tree's hits."""
    import numpy as np
    from tpupt.accel.bvh import build_bvh_split

    rng = np.random.default_rng(11)
    n = 400
    c = rng.random((n, 3))
    h = rng.random((n, 3)) * 0.05
    for method in ("middle", "equalcounts"):
        b = build_bvh_split(c - h, c + h, method)
        assert sorted(b.prim_ids.tolist()) == list(range(n)), method
        # parent boxes contain children
        stack = [0]
        while stack:
            i = stack.pop()
            if b.count[i] == 0:
                for ch in (i + 1, int(b.right[i])):
                    assert (b.lo[i] <= b.lo[ch] + 1e-6).all()
                    assert (b.hi[i] >= b.hi[ch] - 1e-6).all()
                stack += [i + 1, int(b.right[i])]


def test_splitmethod_param_renders_same_image():
    from tpupt.scene.loader import parse_string
    from tpupt.scene.flatten import flatten
    from tpupt.scene.params import ParamSet
    from tpupt.integrators.path import Renderer
    import numpy as np

    txt = """
LookAt 0 0 4   0 0 0   0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [10] "integer yresolution" [10]
Sampler "random" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "point from" [0 2 2] "color I" [9 9 9]
Material "matte" "color Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [ -2 -1 0  2 -1 0  2 1 0  -2 1 0 ]
    "integer indices" [0 1 2 2 3 0]
WorldEnd
"""
    imgs = []
    for method in (None, "middle", "equalcounts"):
        scene = flatten(parse_string(txt))
        if method:
            ps = ParamSet()
            ps.add("string splitmethod", [method])
            scene.accelerator_params = ps
        r = Renderer(scene)
        imgs.append(r.image(r.render(spp=2)))
    np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5)
    np.testing.assert_allclose(imgs[0], imgs[2], atol=1e-5)
