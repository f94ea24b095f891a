"""Direct-lighting / Whitted / AO integrator tests (reference parity:
directlighting.cpp, whitted.cpp, ao.cpp)."""

import numpy as np

from tpupt.scene.loader import parse_string
from tpupt.scene.flatten import flatten
from tpupt.integrators.path import Renderer

_BASE = """
LookAt 0 0 5   0 0 0   0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "random" "integer pixelsamples" [8]
Integrator "%s" %s
WorldBegin
LightSource "distant" "point from" [0 0 1] "point to" [0 0 0] "color L" [2 2 2]
Material "matte" "color Kd" [0.6 0.4 0.2]
Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
    "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _render(integ, params, spp=8):
    sc = flatten(parse_string(_BASE % (integ, params)))
    r = Renderer(sc)
    return r.image(r.render(spp=spp))


def test_direct_lighting_matches_analytic():
    kd = np.array([0.6, 0.4, 0.2])
    img = _render("directlighting", '"integer maxdepth" [2]')
    np.testing.assert_allclose(img.reshape(-1, 3).mean(0), kd / np.pi * 2,
                               rtol=0.02)


def test_whitted_matches_direct_on_diffuse():
    i1 = _render("whitted", '"integer maxdepth" [2]')
    i2 = _render("directlighting", '"integer maxdepth" [2]')
    np.testing.assert_allclose(i1, i2, atol=1e-5)


def test_ao_open_hemisphere_is_pi():
    # the reference's AO integrator returns the UNNORMALIZED visibility
    # integral: full visibility = integral of cos = pi (ao.cpp:99)
    img = _render("ambientocclusion", '"integer nsamples" [8]')
    np.testing.assert_allclose(img.reshape(-1, 3).mean(0), np.pi, rtol=0.02)


def test_direct_vs_path_single_bounce():
    # With maxdepth 1 for path (one NEE vertex) the estimates agree on a
    # purely diffuse, single-surface scene.
    i1 = _render("directlighting", '"integer maxdepth" [2]')
    i2 = _render("path", '"integer maxdepth" [1]')
    np.testing.assert_allclose(i1.mean((0, 1)), i2.mean((0, 1)), rtol=0.02)
