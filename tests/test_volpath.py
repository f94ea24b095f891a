"""Volumetric path tracing tests (volpath.cpp / media parity)."""

import numpy as np
import jax.numpy as jnp

from tpupt.media.media import (MediumParams, MEDIUM_HOMOGENEOUS, hg_phase,
                               hg_sample, transmittance)
from tpupt.scene.loader import parse_string
from tpupt.scene.flatten import flatten
from tpupt.integrators.path import Renderer


def test_hg_phase_normalizes():
    # integral of phase over the sphere = 1 (reference tests/hg.cpp)
    rng = np.random.default_rng(0)
    n = 8192
    z = 1 - 2 * rng.random(n)
    for g in (0.0, 0.4, -0.6):
        vals = np.array(hg_phase(jnp.asarray(z, jnp.float32), g))
        integral = vals.mean() * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.05, (g, integral)


def test_hg_sample_matches_pdf_mean():
    rng = np.random.default_rng(1)
    n = 4096
    wo = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random(n), jnp.float32)
    for g in (0.0, 0.5):
        wi, pdf = hg_sample(wo, u1, u2, g)
        wi = np.array(wi)
        np.testing.assert_allclose(np.linalg.norm(wi, axis=-1), 1.0, atol=1e-4)
        # mean cosine of HG = g
        cos = (wi * np.array([[0, 0, 1.0]])).sum(-1)
        assert abs(cos.mean() - g) < 0.05


def test_homogeneous_transmittance_beer_lambert():
    mp = MediumParams(kind=MEDIUM_HOMOGENEOUS,
                      sigma_a=jnp.asarray([0.1, 0.2, 0.3]),
                      sigma_s=jnp.asarray([0.4, 0.3, 0.2]),
                      g=0.0, density=jnp.ones((1, 1, 1)), w2m=jnp.eye(4),
                      sigma_t_max=0.5)
    o = jnp.zeros((4, 3))
    d = jnp.asarray(np.tile([[0, 0, 1.0]], (4, 1)), jnp.float32)
    t = jnp.asarray([0.0, 1.0, 2.0, 10.0])
    tr = np.array(transmittance(mp, o, d, t, jnp.uint32(0)))
    want = np.exp(-np.array([0.5, 0.5, 0.5]) * np.array(t)[:, None])
    np.testing.assert_allclose(tr, want, rtol=1e-4)


def test_volpath_fog_attenuates_light():
    # NOTE: the light must sit INSIDE the fog near the surface — a global
    # unbounded medium extinguishes distant/infinite lights entirely (the
    # same behavior as the reference's camera-medium configuration).
    base = """
    LookAt 0 0 5   0 0 0   0 1 0
    Camera "perspective" "float fov" [30]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [8]
    Integrator "volpath" "integer maxdepth" [3]
    %s
    WorldBegin
    LightSource "point" "point from" [0 0 2] "color I" [8 8 8]
    Material "matte" "color Kd" [0.6 0.6 0.6]
    Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    clear = flatten(parse_string(base % ""))
    foggy = flatten(parse_string(base % (
        'MakeNamedMedium "fog" "string type" "homogeneous" '
        '"color sigma_a" [0.05 0.05 0.05] "color sigma_s" [0.02 0.02 0.02]')))
    assert foggy.media
    img_clear = Renderer(clear).image(Renderer(clear).render(spp=8))
    rf = Renderer(foggy)
    assert rf._medium is not None
    img_fog = rf.image(rf.render(spp=16))
    # fog attenuates the direct component but in-scatters some light:
    # the image must be dimmer than clear but non-zero
    assert img_fog.mean() < img_clear.mean() * 0.95
    assert img_fog.mean() > img_clear.mean() * 0.2
    assert np.isfinite(img_fog).all()
