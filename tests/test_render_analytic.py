"""End-to-end analytic render tests (pattern: src/tests/analytic_scenes.cpp —
build scenes programmatically, render through the real pipeline, assert
closed-form radiance)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupt.scene.loader import parse_string
from tpupt.scene.flatten import flatten
from tpupt.integrators.path import Renderer


def _render(txt, spp=8):
    scene = flatten(parse_string(txt))
    r = Renderer(scene)
    film = r.render(spp=spp)
    return r.image(film)


def test_infinite_light_only():
    # No geometry: every pixel sees the constant environment radiance.
    img = _render("""
    Camera "perspective" "float fov" [60]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [4]
    Integrator "path" "integer maxdepth" [3]
    WorldBegin
    LightSource "infinite" "color L" [0.7 0.2 0.4]
    WorldEnd
    """)
    np.testing.assert_allclose(img.mean((0, 1)), [0.7, 0.2, 0.4], rtol=1e-4)


def test_distant_light_on_plane():
    # Lambertian plane, distant light straight down, camera above looking
    # straight down: every pixel = Kd/pi * L (cos = 1). maxdepth 2 => one
    # scattering vertex, no interreflection to worry about (single convex
    # plane anyway).
    kd = np.array([0.6, 0.4, 0.2])
    img = _render("""
    LookAt 0 0 5   0 0 0   0 1 0
    Camera "perspective" "float fov" [30]
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    LightSource "distant" "point from" [0 0 1] "point to" [0 0 0]
        "color L" [2 2 2]
    Material "matte" "color Kd" [0.6 0.4 0.2]
    Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """)
    want = kd / np.pi * 2.0
    got = img.reshape(-1, 3).mean(0)
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_point_light_inverse_square():
    # Point light I at height h over a plane; directly below the light the
    # radiance is Kd/pi * I * cos/r^2 with cos=1, r=h.
    img = _render("""
    LookAt 0 0 3   0 0 0   0 1 0
    Camera "perspective" "float fov" [10]
    Film "image" "integer xresolution" [9] "integer yresolution" [9]
    Sampler "random" "integer pixelsamples" [32]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    AttributeBegin
      LightSource "point" "point from" [0 0 2] "color I" [8 8 8]
    AttributeEnd
    Material "matte" "color Kd" [0.5 0.5 0.5]
    Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """)
    # center pixel looks at the point right under the light: r = 2
    want = 0.5 / np.pi * 8.0 / 4.0
    got = img[4, 4]
    np.testing.assert_allclose(got, want, rtol=0.05)


def test_area_light_solid_angle():
    # Large emissive quad at height h over a tiny camera footprint on a dark
    # plane is a half-space emitter in the limit -> reflected radiance
    # approaches Kd * L (integral of L cos/pi over hemisphere).
    img = _render("""
    LookAt 0 0 1   0 0 0   0 1 0
    Camera "perspective" "float fov" [10]
    Film "image" "integer xresolution" [9] "integer yresolution" [9]
    Sampler "random" "integer pixelsamples" [64]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [3 3 3]
      Translate 0 0 4
      ReverseOrientation
      Shape "trianglemesh" "point P" [ -400 -400 0  400 -400 0  400 400 0  -400 400 0 ]
          "integer indices" [0 1 2 2 3 0]
    AttributeEnd
    Material "matte" "color Kd" [0.5 0.5 0.5]
    Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """, spp=8)
    want = 0.5 * 3.0
    got = img[4, 4]
    np.testing.assert_allclose(got, want, rtol=0.1)


def test_mis_consistency_glossy_floor():
    # A glossy (plastic) floor under an area light: NEE+MIS must converge to
    # the same mean whether roughness is high or low — here we just require
    # the estimate to be finite, positive, and stable across two seeds.
    txt = """
    LookAt 0 3 3   0 0 0   0 1 0
    Camera "perspective" "float fov" [40]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [32]
    Integrator "path" "integer maxdepth" [3]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [5 5 5]
      Translate 0 0 4
      ReverseOrientation
      Shape "trianglemesh" "point P" [ -1 -1 0  1 -1 0  1 1 0  -1 1 0 ]
          "integer indices" [0 1 2 2 3 0]
    AttributeEnd
    Material "plastic" "color Kd" [.3 .3 .3] "color Ks" [.4 .4 .4]
        "float roughness" [.1]
    Shape "trianglemesh" "point P" [ -10 -10 0  10 -10 0  10 10 0  -10 10 0 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    scene = flatten(parse_string(txt))
    r = Renderer(scene)
    img1 = r.image(r.render(spp=16))
    assert np.isfinite(img1).all()
    assert img1.mean() > 0.01
    scene.sampler.seed = 1
    r2 = Renderer(scene)
    img2 = r2.image(r2.render(spp=16))
    # two independent estimates agree within MC noise
    m1, m2 = img1.mean(), img2.mean()
    assert abs(m1 - m2) / max(m1, m2) < 0.2


def test_sphere_area_light_illumination():
    # Sphere light of radius r at distance d above a matte plane:
    # E = L * pi * r^2 / d^2 for small r/d; pixel = Kd/pi * E.
    img = _render("""
    LookAt 0 0 2   0 0 0   0 1 0
    Camera "perspective" "float fov" [10]
    Film "image" "integer xresolution" [9] "integer yresolution" [9]
    Sampler "random" "integer pixelsamples" [64]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [40 40 40]
      Translate 0 0 5
      Shape "sphere" "float radius" [0.25]
    AttributeEnd
    Material "matte" "color Kd" [0.5 0.5 0.5]
    Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """)
    want = 0.5 / np.pi * 40.0 * np.pi * 0.25**2 / 25.0
    got = img[4, 4]
    np.testing.assert_allclose(got, want, rtol=0.08)


def test_nan_free_specular_chain():
    # Mirror + glass chain must stay finite.
    img = _render("""
    LookAt 0 0 4   0 0 0   0 1 0
    Camera "perspective" "float fov" [45]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [5]
    WorldBegin
    LightSource "infinite" "color L" [1 1 1]
    Material "glass"
    Shape "sphere" "float radius" [0.8]
    AttributeBegin
      Material "mirror"
      Translate 2 0 0
      Shape "sphere" "float radius" [0.5]
    AttributeEnd
    WorldEnd
    """)
    assert np.isfinite(img).all()
    assert img.mean() > 0.3  # mostly environment visible
