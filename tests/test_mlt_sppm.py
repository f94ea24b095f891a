"""MLT + SPPM convergence tests (pattern: analytic_scenes.cpp crossing
integrators over scenes with known path-traced references)."""

import numpy as np
import pytest

# slow tier: full MLT/SPPM convergence renders
pytestmark = pytest.mark.slow

from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string
from tpupt.integrators.path import Renderer

_SCENE = """
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "halton" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "point" "rgb I" [8 8 8] "point from" [1 2 2]
Material "matte" "rgb Kd" [0.6 0.6 0.6]
Shape "sphere" "float radius" [0.8]
Shape "trianglemesh" "point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _path_image(spp=32):
    sc = flatten(parse_string(_SCENE))
    r = Renderer(sc)
    return np.array(r.image(r.render(spp=spp))), r


def test_mlt_converges_to_path():
    from tpupt.integrators.mlt import MLTRenderer

    ip, r = _path_image()
    m = MLTRenderer(r, n_bootstrap=8192)
    im = m.render(mutations_per_pixel=64)
    assert np.isfinite(im).all()
    np.testing.assert_allclose(im.mean(), ip.mean(), rtol=0.10)
    # bootstrap normalization b equals the mean image luminance
    lum = 0.2126 * ip[..., 0] + 0.7152 * ip[..., 1] + 0.0722 * ip[..., 2]
    np.testing.assert_allclose(m.b, lum.mean(), rtol=0.15)


_CAUSTIC = """
LookAt 0 1.1 3.2  0 -0.6 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "halton" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [4]
WorldBegin
LightSource "point" "rgb I" [30 30 30] "point from" [0 3 0]
Material "glass"
Shape "sphere" "float radius" [0.55]
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_mlt_finds_caustics_where_path_stalls():
    """The MLT-is-over-BDPT-strategies criterion (mlt.cpp:165 -> bdpt.cpp):
    a point light focused through a glass sphere onto a diffuse floor is
    unreachable for the unidirectional path kernel (NEE is blocked by the
    sphere, BSDF sampling can never hit a point light), but BDPT's s >= 2
    light-subpath strategies find it — so MLT must light the caustic."""
    sc = flatten(parse_string(_CAUSTIC))
    r = Renderer(sc)
    ip = np.array(r.image(r.render(spp=16)))

    # BDPT locates the caustic (its s >= 2 strategies find it)
    scb = flatten(parse_string(_CAUSTIC.replace('"path"', '"bdpt"')))
    rb = Renderer(scb)
    ib = np.array(rb.image(rb.render(spp=16)))
    lum_b = ib.mean(-1)
    lower = lum_b[10:, :]
    patch = lower >= np.quantile(lower, 0.95)  # brightest 5% = the caustic
    assert lower[patch].mean() > 3.0 * ip[10:, :].mean(-1)[patch].mean() + 1e-4, \
        "BDPT itself must see the caustic the path kernel misses"

    from tpupt.integrators.mlt import MLTRenderer

    m = MLTRenderer(r, n_bootstrap=4096, sigma=0.02)
    im = m.render(mutations_per_pixel=24)
    assert np.isfinite(im).all()
    assert m.b > 0
    # MLT must light the same caustic region the path kernel misses
    lum_m = im.mean(-1)[10:, :]
    assert lum_m[patch].mean() > 3.0 * ip[10:, :].mean(-1)[patch].mean() + 1e-4


def test_sppm_converges_to_path():
    from tpupt.integrators.sppm import SPPMRenderer

    ip, r = _path_image()
    s = SPPMRenderer(r, photons_per_iter=8192)
    im = s.render(n_iterations=8)
    assert np.isfinite(im).all()
    np.testing.assert_allclose(im.mean(), ip.mean(), rtol=0.12)


def test_sppm_glossy_gather_converges():
    """Full-BSDF photon gathering (sppm.cpp:262): a GLOSSY floor's visible
    points must gather through their microfacet lobe, not a diffuse
    approximation — the sppm image still matches the path tracer."""
    from tpupt.integrators.sppm import SPPMRenderer

    txt = _SCENE.replace('Material "matte" "rgb Kd" [0.6 0.6 0.6]',
                         'Material "plastic" "rgb Kd" [0.4 0.4 0.4] '
                         '"rgb Ks" [0.4 0.4 0.4] "float roughness" [0.2]')
    sc = flatten(parse_string(txt))
    r = Renderer(sc)
    ip = np.array(r.image(r.render(spp=32)))
    s = SPPMRenderer(r, photons_per_iter=8192)
    im = s.render(n_iterations=8)
    assert np.isfinite(im).all()
    np.testing.assert_allclose(im.mean(), ip.mean(), rtol=0.15)


def test_sppm_radius_shrinks():
    from tpupt.integrators.sppm import SPPMRenderer
    import jax.numpy as jnp

    _, r = _path_image(spp=1)
    s = SPPMRenderer(r, photons_per_iter=4096)
    # run two iterations manually and watch max radius fall
    import tpupt.integrators.sppm as S

    ds, st = r.ds, r.st
    n = r.px.shape[0]
    s.npix_pad = n
    radius = jnp.full(n, s.r0)
    vp = s._camera_pass(ds, st, jnp.uint32(0))
    cell = jnp.max(radius) * 1.0001
    phi, m_cnt, ovf = s._photon_pass(ds, st, jnp.uint32(0), vp, radius,
                                     ds.world_lo - 2 * cell, cell)
    has = np.array(m_cnt) > 0
    assert has.any()  # photons actually land on visible points
    N = S.GAMMA * np.array(m_cnt)
    r_new = np.where(has, np.array(radius) * np.sqrt(
        np.maximum(N, 0) / np.maximum(np.array(m_cnt), 1e-9)), radius)
    assert (r_new[has] < np.array(radius)[has] + 1e-9).all()
