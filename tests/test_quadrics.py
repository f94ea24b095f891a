"""Analytic quadric intersection tests — closed-form hits per kind
(pattern: the per-shape Intersect unit checks the reference gets from its
scene suite; cites shapes/{cylinder,disk,cone,paraboloid,hyperboloid}.cpp)."""

import numpy as np
import jax.numpy as jnp

from tpupt.shapes import quadric as q


def _test_one(kind, r, zmin, zmax, phimax, q1, q2, o, d, expect_t,
              expect_hit=True, tol=1e-4):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    hit, t = q.quadric_test(
        jnp.asarray([kind]), jnp.asarray([r], jnp.float32),
        jnp.asarray([zmin], jnp.float32), jnp.asarray([zmax], jnp.float32),
        jnp.asarray([phimax], jnp.float32),
        jnp.asarray([q1], jnp.float32), jnp.asarray([q2], jnp.float32),
        o, d, jnp.asarray([1e30], jnp.float32))
    assert bool(hit[0]) == expect_hit, (kind, float(t[0]))
    if expect_hit:
        np.testing.assert_allclose(float(t[0]), expect_t, rtol=tol)


def test_sphere_axis_hit():
    _test_one(q.KIND_SPHERE, 1.0, -1.0, 1.0, q.TWO_PI, 0, 0,
              [0, 0, -3], [0, 0, 1], 2.0)


def test_cylinder_side_hit():
    # unit cylinder, ray along +x from (-3, 0, 0.5) -> hits at x = -1
    _test_one(q.KIND_CYLINDER, 1.0, 0.0, 1.0, q.TWO_PI, 0, 0,
              [-3, 0, 0.5], [1, 0, 0], 2.0)
    # z-clip: same ray at z = 2 misses
    _test_one(q.KIND_CYLINDER, 1.0, 0.0, 1.0, q.TWO_PI, 0, 0,
              [-3, 0, 2.0], [1, 0, 0], None, expect_hit=False)


def test_disk_hit_and_annulus():
    # disk at z = 1, outer 2, inner 0.5
    _test_one(q.KIND_DISK, 2.0, 1.0, 1.0, q.TWO_PI, 0.5, 0,
              [1.0, 0, 3], [0, 0, -1], 2.0)
    # inside the hole
    _test_one(q.KIND_DISK, 2.0, 1.0, 1.0, q.TWO_PI, 0.5, 0,
              [0.2, 0, 3], [0, 0, -1], None, expect_hit=False)


def test_cone_hit():
    # cone r=1 h=1 (apex at z=1): at z=0.5 the radius is 0.5; ray along +x
    # at z = 0.5 hits x = -0.5 from x = -3 -> t = 2.5
    _test_one(q.KIND_CONE, 1.0, 0.0, 1.0, q.TWO_PI, 0, 0,
              [-3, 0, 0.5], [1, 0, 0], 2.5)


def test_paraboloid_hit():
    # k = zmax/r^2 = 1: z = x^2+y^2. Ray down at x=0.5 -> z=0.25
    _test_one(q.KIND_PARABOLOID, 1.0, 0.0, 1.0, q.TWO_PI, 1.0, 0,
              [0.5, 0, 2], [0, 0, -1], 1.75)


def test_hyperboloid_hit():
    # a(x^2+y^2) - c z^2 = 1 with a=1, c=1: at z=0 radius 1
    _test_one(q.KIND_HYPERBOLOID, 2.0, -1.0, 1.0, q.TWO_PI, 1.0, 1.0,
              [-3, 0, 0], [1, 0, 0], 2.0)


def test_phimax_wedge():
    # half cylinder phimax=pi: hit from +y side ok (phi=pi/2), from -y missed
    _test_one(q.KIND_CYLINDER, 1.0, -1.0, 1.0, np.pi, 0, 0,
              [0, 3, 0], [0, -1, 0], 2.0)
    # from -y the near root (phi = 3pi/2) is clipped; the far root at the
    # inner wall (phi = pi/2, t = 4) survives, as the reference's
    # second-root retry does (cylinder.cpp:93)
    _test_one(q.KIND_CYLINDER, 1.0, -1.0, 1.0, np.pi, 0, 0,
              [0, -3, 0], [0, 1, 0], 4.0)
    # sphere with phimax = 3pi/2: entry point sits just below the +x axis
    # (phi ~ 2pi - eps > phimax, clipped); the exit at phi = pi survives
    _test_one(q.KIND_SPHERE, 1.0, -1.0, 1.0, 1.5 * np.pi, 0, 0,
              [3, -1e-3, 0], [-1, 0, 0], 4.0)
    # and a point inside the 3pi/2 wedge (phi = pi + eps) hits near
    _test_one(q.KIND_SPHERE, 1.0, -1.0, 1.0, 1.5 * np.pi, 0, 0,
              [-3, 1e-3, 0], [1, 0, 0], 2.0)


def test_normals_uv():
    p = jnp.asarray([[1.0, 0.0, 0.5]])
    n, u, v = q.quadric_normal_uv(
        p, jnp.asarray([q.KIND_CYLINDER]), jnp.asarray([1.0]),
        jnp.asarray([0.0]), jnp.asarray([1.0]),
        jnp.asarray([q.TWO_PI]), jnp.asarray([0.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.array(n[0]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(v[0]), 0.5, atol=1e-6)
    # disk normal is +z and v spans outer(0) -> inner(1)
    n, u, v = q.quadric_normal_uv(
        jnp.asarray([[1.5, 0.0, 1.0]]), jnp.asarray([q.KIND_DISK]),
        jnp.asarray([2.0]), jnp.asarray([1.0]), jnp.asarray([1.0]),
        jnp.asarray([q.TWO_PI]), jnp.asarray([0.5]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.array(n[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(float(v[0]), (2.0 - 1.5) / 1.5, atol=1e-5)
