"""BDPT tests: strategy-sum agreement with the path tracer (pattern:
analytic_scenes.cpp crossing integrators over the same scene)."""

import numpy as np
import pytest

# slow tier: all-(s,t) BDPT strategy validations
pytestmark = pytest.mark.slow

from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string
from tpupt.integrators.path import Renderer


def _render(scene_txt, integrator, spp, seed=0):
    sc = flatten(parse_string(scene_txt.replace("$INT", integrator)))
    r = Renderer(sc)
    film = r.render(spp=spp)
    return np.array(r.image(film))


_BOX = """
LookAt 0 1 4.5  0 1 0  0 1 0
Camera "perspective" "float fov" [55]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "halton" "integer pixelsamples" [4]
Integrator "$INT" "integer maxdepth" [3]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [6 6 6] "bool twosided" "true"
  Translate 0 1.98 0
  Shape "trianglemesh" "point P" [-0.5 0 -0.5  0.5 0 -0.5  0.5 0 0.5  -0.5 0 0.5]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-2 0 -2  2 0 -2  2 0 2  -2 0 2] "integer indices" [0 1 2 2 3 0]
Shape "trianglemesh" "point P" [-2 0 -2  -2 2 -2  2 2 -2  2 0 -2] "integer indices" [0 1 2 2 3 0]
Material "matte" "rgb Kd" [0.7 0.2 0.2]
Shape "trianglemesh" "point P" [-2 0 -2  -2 0 2  -2 2 2  -2 2 -2] "integer indices" [0 1 2 2 3 0]
Material "matte" "rgb Kd" [0.2 0.7 0.2]
Shape "trianglemesh" "point P" [2 0 -2  2 2 -2  2 2 2  2 0 2] "integer indices" [0 1 2 2 3 0]
WorldEnd
"""

_POINT = """
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "halton" "integer pixelsamples" [4]
Integrator "$INT" "integer maxdepth" [3]
WorldBegin
LightSource "point" "rgb I" [8 8 8] "point from" [1 2 2]
Material "matte" "rgb Kd" [0.6 0.6 0.6]
Shape "sphere" "float radius" [0.8]
Shape "trianglemesh" "point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


@pytest.mark.parametrize("scene", [_BOX, _POINT], ids=["arealight", "point"])
def test_bdpt_matches_path(scene):
    img_p = _render(scene, "path", spp=48)
    img_b = _render(scene, "bdpt", spp=48)
    assert np.isfinite(img_b).all()
    assert img_b.min() >= 0
    # integrators estimate the same integral: means agree
    np.testing.assert_allclose(img_b.mean(), img_p.mean(), rtol=0.10)
    # and so do per-channel means (color fidelity of the strategies)
    np.testing.assert_allclose(img_b.mean((0, 1)), img_p.mean((0, 1)),
                               rtol=0.15)


def test_bdpt_splats_light_image():
    """t == 1 strategies land in the splat channel and are finite."""
    from tpupt.film import film as filmmod

    sc = flatten(parse_string(_BOX.replace("$INT", "bdpt")))
    r = Renderer(sc)
    film = r.render(spp=8)
    splat = np.array(film.splat)
    assert np.isfinite(splat).all()
    assert splat.sum() >= 0.0


_ENV = """
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "halton" "integer pixelsamples" [4]
Integrator "$INT" "integer maxdepth" [3]
WorldBegin
LightSource "infinite" "rgb L" [0.8 0.9 1.0]
Material "matte" "rgb Kd" [0.6 0.5 0.4]
Shape "sphere" "float radius" [0.8]
Shape "trianglemesh" "point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_bdpt_env_background_not_black():
    """Escaped camera rays must carry infinite-light radiance (s == 0 with
    an escaped endpoint vertex, bdpt.cpp:170-176) — round-1 rendered env
    backgrounds black under BDPT."""
    img_b = _render(_ENV, "bdpt", spp=16)
    # background corner pixel: direct env visibility
    assert img_b[0, 0].mean() > 0.3, "env background is black under BDPT"


def test_bdpt_env_matches_path():
    img_p = _render(_ENV, "path", spp=48)
    img_b = _render(_ENV, "bdpt", spp=48)
    assert np.isfinite(img_b).all()
    np.testing.assert_allclose(img_b.mean(), img_p.mean(), rtol=0.10)
    np.testing.assert_allclose(img_b.mean((0, 1)), img_p.mean((0, 1)),
                               rtol=0.15)
