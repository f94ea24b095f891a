"""L0 math unit tests (pattern: src/tests/{fp_tests,bounds,animatedtransform}.cpp)."""

import numpy as np
import jax.numpy as jnp

from tpupt.core import vecmath as vm
from tpupt.core import sampling
from tpupt.core.transforms import Transform, AnimatedTransform


def test_normalize_and_coordinate_system():
    v = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32))
    n = vm.normalize(v)
    np.testing.assert_allclose(np.array(vm.length(n)), 1.0, atol=1e-5)
    t, b = vm.coordinate_system(n)
    np.testing.assert_allclose(np.array(vm.dot(n, t)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.array(vm.dot(n, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.array(vm.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.array(vm.length(t)), 1.0, atol=1e-5)


def test_bounds_union_and_surface_area():
    b = vm.Bounds3(jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 2.0, 3.0]))
    assert np.isclose(float(b.surface_area()), 2 * (2 + 3 + 6))
    b2 = b.union_point(jnp.array([-1.0, 0.5, 4.0]))
    np.testing.assert_allclose(np.array(b2.lo), [-1, 0, 0])
    np.testing.assert_allclose(np.array(b2.hi), [1, 2, 4])


def test_bounds_intersect_p():
    b = vm.Bounds3(jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 1.0, 1.0]]))
    o = jnp.array([[0.5, 0.5, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit, t0, t1 = b.intersect_p(o, vm.ray_inv_d(d), jnp.array([np.inf]))
    assert bool(hit[0])
    assert np.isclose(float(t0[0]), 1.0, atol=1e-5)
    # ray pointing away
    hit2, _, _ = b.intersect_p(o, vm.ray_inv_d(-d), jnp.array([np.inf]))
    assert not bool(hit2[0])


def test_transform_roundtrip():
    t = (
        Transform.translate([1, 2, 3])
        * Transform.rotate(37.0, [0.2, 0.7, 0.1])
        * Transform.scale([2.0, 0.5, 1.5])
    )
    p = np.random.default_rng(1).normal(size=(32, 3))
    q = t.inverse().apply_point(t.apply_point(p))
    np.testing.assert_allclose(q, p, atol=1e-9)
    np.testing.assert_allclose(t.m @ t.m_inv, np.eye(4), atol=1e-9)


def test_transform_normal_orthogonality():
    t = Transform.scale([2.0, 1.0, 1.0])
    # tangent along x on a surface with normal z stays orthogonal
    n = t.apply_normal([[0.0, 0.0, 1.0]])
    v = t.apply_vector([[1.0, 0.0, 0.0]])
    assert abs(float(np.sum(n * v))) < 1e-12


def test_look_at_maps_origin_to_eye():
    t = Transform.look_at([5, -5, 2], [0, 0, 0], [0, 0, 1])
    np.testing.assert_allclose(t.apply_point([[0, 0, 0]])[0], [5, -5, 2], atol=1e-12)
    # +z in camera space points toward the look-at target
    d = t.apply_vector([[0, 0, 1]])[0]
    want = np.array([-5.0, 5.0, -2.0])
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(d, want, atol=1e-12)


def test_animated_transform_interpolation():
    t0 = Transform.translate([0, 0, 0])
    t1 = Transform.translate([2, 0, 0]) * Transform.rotate(90, [0, 0, 1])
    at = AnimatedTransform(t0, 0.0, t1, 1.0)
    mid = at.interpolate(0.5)
    p = mid.apply_point([[1, 0, 0]])[0]
    # Midway: translated by (1,0,0), rotated by 45 deg about z.
    want = np.array([1 + np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0])
    np.testing.assert_allclose(p, want, atol=1e-3)


def test_refract_total_internal_reflection():
    n = jnp.array([[0.0, 0.0, 1.0]])
    # grazing ray from dense medium: eta > 1 -> TIR
    wi = vm.normalize(jnp.array([[0.9, 0.0, 0.1]]))
    valid, _ = vm.refract(wi, n, jnp.array([1.6]))
    assert not bool(valid[0])
    # straight-on ray refracts
    wi2 = jnp.array([[0.0, 0.0, 1.0]])
    valid2, wt = vm.refract(wi2, n, jnp.array([1.6]))
    assert bool(valid2[0])
    np.testing.assert_allclose(np.array(wt[0]), [0, 0, -1], atol=1e-6)


def test_power_heuristic_ranges():
    f = sampling.power_heuristic(1.0, jnp.array([1.0]), 1.0, jnp.array([1.0]))
    assert np.isclose(float(f[0]), 0.5)
    f2 = sampling.power_heuristic(1.0, jnp.array([10.0]), 1.0, jnp.array([0.1]))
    assert float(f2[0]) > 0.99


def test_cosine_hemisphere_pdf_integrates_to_one():
    rng = np.random.default_rng(2)
    u = rng.random((4096, 2)).astype(np.float32)
    d = sampling.cosine_sample_hemisphere(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    d = np.array(d)
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # E[1/pdf] over hemisphere samples = hemisphere area measure consistency:
    # mean of (cos/pi)/pdf = 1 trivially; instead check cos-weighted moments
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.02


def test_concentric_disk_in_unit_disk():
    rng = np.random.default_rng(3)
    u = rng.random((4096, 2)).astype(np.float32)
    x, y = sampling.concentric_sample_disk(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    r2 = np.array(x) ** 2 + np.array(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    assert abs(r2.mean() - 0.5) < 0.02
