"""Per-interface media (MediumInterface parity, medium.h / volpath.cpp /
Scene::IntersectTr): analytic fog-sphere transmittance through null
interfaces, medium transitions on camera paths, and shadow-ray Tr."""

import numpy as np

from tpupt.integrators.path import Renderer
from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string

_BASE = """
LookAt 0 0 5   0 0 0   0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "random" "integer pixelsamples" [%(spp)d]
Integrator "volpath" "integer maxdepth" [3]
WorldBegin
%(media)s
LightSource "point" "point from" [12 0 1] "color I" [400 400 400]
Material "matte" "color Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
    "integer indices" [0 1 2 2 3 0]
%(fog_ball)s
WorldEnd
"""

_FOG = ('MakeNamedMedium "fog" "string type" "homogeneous" '
        '"color sigma_a" [%(sa)s %(sa)s %(sa)s] '
        '"color sigma_s" [0 0 0]')

_BALL = """
AttributeBegin
Material "none"
MediumInterface "fog" ""
Translate 0 0 2.5
Shape "sphere" "float radius" [1]
AttributeEnd
"""


def _render(txt, spp):
    scene = flatten(parse_string(txt))
    r = Renderer(scene)
    film = r.render(spp=spp, verbose=False)
    return np.asarray(r.image(film))


def test_fog_sphere_attenuates_view_rays():
    """Camera looks straight down through an absorbing fog ball onto a lit
    plane: the center pixel crosses a 2R=2 chord of fog (attenuation
    exp(-sigma_a*2)); corner pixels miss the ball entirely. Exercises null
    pass-through, medium transitions, and in-medium distance sampling."""
    sa = 0.8
    spp = 48
    clear = _render(_BASE % dict(spp=spp, media="", fog_ball=""), spp)
    foggy = _render(_BASE % dict(
        spp=spp, media=_FOG % dict(sa=sa), fog_ball=_BALL), spp)
    h, w = clear.shape[:2]
    c_clear = clear[h // 2 - 1: h // 2 + 1, w // 2 - 1: w // 2 + 1].mean()
    c_fog = foggy[h // 2 - 1: h // 2 + 1, w // 2 - 1: w // 2 + 1].mean()
    # corners see the same plane with no fog in the way
    corner_ratio = foggy[0, 0].mean() / max(clear[0, 0].mean(), 1e-9)
    assert abs(corner_ratio - 1.0) < 0.15, corner_ratio
    want = np.exp(-sa * 2.0)
    got = c_fog / max(c_clear, 1e-9)
    assert abs(got - want) < 0.15 * want + 0.05, (got, want)


def test_shadow_rays_attenuate_through_interface():
    """Light inside the fog ball: plane points directly below are lit
    through ~R of fog (IntersectTr crossing one null interface)."""
    sa = 1.0
    spp = 32
    txt = """
    LookAt 0 -6 3   0 0 0   0 0 1
    Camera "perspective" "float fov" [45]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [%d]
    Integrator "volpath" "integer maxdepth" [2]
    WorldBegin
    %s
    LightSource "point" "point from" [0 0 1.5] "color I" [40 40 40]
    Material "matte" "color Kd" [0.7 0.7 0.7]
    Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
        "integer indices" [0 1 2 2 3 0]
    %s
    WorldEnd
    """
    ball = _BALL.replace("Translate 0 0 2.5", "Translate 0 0 1.5")
    clear = _render(txt % (spp, "", ""), spp)
    foggy = _render(txt % (spp, _FOG % dict(sa=sa), ball), spp)
    # the plane point under the light: shadow ray crosses one fog radius
    m_clear = float(clear.max())
    m_fog = float(foggy.max())
    assert m_clear > 0
    got = m_fog / m_clear
    want = np.exp(-sa * 1.0)
    assert abs(got - want) < 0.2 * want + 0.06, (got, want)


def test_medium_ids_flattened():
    scene = flatten(parse_string(_BASE % dict(
        spp=4, media=_FOG % dict(sa=0.5), fog_ball=_BALL)))
    assert scene.media_order == ["fog"]
    assert scene.camera_medium == -1
    s = scene.spheres
    assert s.count == 1 and s.med_in[0] == 0 and s.med_out[0] == -1
    t = scene.triangles
    assert (t.med_in == -1).all() and (t.med_out == -1).all()
