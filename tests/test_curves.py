"""Curve + NURBS tessellation tests (shapes/curve.cpp, nurbs.cpp parity)."""

import numpy as np

from tpupt.scene.quadrics import (tessellate_curve, tessellate_nurbs,
                                  _bezier_eval)


def test_bezier_eval_endpoints():
    cp = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [2, 1, 0]], float)
    p, d = _bezier_eval(cp, np.array([0.0, 1.0]))
    np.testing.assert_allclose(p[0], cp[0])
    np.testing.assert_allclose(p[1], cp[3])
    np.testing.assert_allclose(d[0], 3 * (cp[1] - cp[0]))


def test_curve_ribbon_width_and_uv():
    P = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 3, 0]], float)
    out = tessellate_curve(P, 0.2, 0.4, basis="bezier")
    V, N, uv, F = out
    # v spans {0,1} across the ribbon (hair h coordinate)
    assert set(np.round(uv[:, 1]).astype(int)) == {0, 1}
    # width at the start ~0.2, at the end ~0.4
    k = len(V) // 2
    w_start = np.linalg.norm(V[k] - V[0])
    w_end = np.linalg.norm(V[2 * k - 1] - V[k - 1])
    np.testing.assert_allclose(w_start, 0.2, rtol=1e-5)
    np.testing.assert_allclose(w_end, 0.4, rtol=1e-5)
    # faces index valid vertices
    assert F.min() >= 0 and F.max() < len(V)
    # normals unit
    np.testing.assert_allclose(np.linalg.norm(N, axis=1), 1.0, atol=1e-6)


def test_curve_bspline_multiseg():
    P = np.random.default_rng(0).normal(size=(7, 3))
    out = tessellate_curve(P, 0.1, 0.1, basis="bspline")
    V, N, uv, F = out
    assert len(F) > 20  # 4 segments * samples * 2 tris
    assert np.isfinite(V).all()


def test_curve_ribbon_normals_follow_input():
    P = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], float)
    nrm = np.array([[0, 0, 1], [0, 0, 1]], float)
    V, N, uv, F = tessellate_curve(P, 0.1, 0.1, curve_type="ribbon",
                                   normals=nrm)
    np.testing.assert_allclose(N, np.broadcast_to([0, 0, 1], N.shape),
                               atol=1e-6)
    # ribbon lies in the z=0 plane, spanning y
    assert np.abs(V[:, 2]).max() < 1e-6
    assert np.abs(V[:, 1]).max() > 0.04


def test_nurbs_plane_exact():
    """A degree-2x2 NURBS with planar control net is the plane itself."""
    nu = nv = 3
    uk = vk = [0, 0, 0, 1, 1, 1]
    xs, ys = np.meshgrid(np.linspace(0, 1, nu), np.linspace(0, 1, nv))
    P = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    V, N, uv, F = tessellate_nurbs(nu, nv, 3, 3, uk, vk, 0, 1, 0, 1, P)
    assert np.abs(V[:, 2]).max() < 1e-9
    np.testing.assert_allclose(np.abs(N[:, 2]), 1.0, atol=1e-6)
    assert V[:, 0].min() >= -1e-9 and V[:, 0].max() <= 1 + 1e-9


def test_nurbs_renders_in_scene():
    from tpupt.scene.flatten import flatten
    from tpupt.scene.loader import parse_string

    sc = flatten(parse_string("""
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective"
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
Shape "nurbs" "integer nu" [3] "integer nv" [3]
  "integer uorder" [3] "integer vorder" [3]
  "float uknots" [0 0 0 1 1 1] "float vknots" [0 0 0 1 1 1]
  "point P" [-1 -1 0  0 -1 1  1 -1 0
             -1 0 1   0 0 2   1 0 1
             -1 1 0   0 1 1   1 1 0]
Shape "curve" "point P" [-1 0 0  -0.3 1 0  0.3 1 0  1 0 0]
  "float width" [0.1]
WorldEnd
"""))
    assert sc.triangles.count > 100
    assert np.isfinite(sc.triangles.p0).all()
