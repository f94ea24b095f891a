"""MLT + SPPM convergence tests (pattern: analytic_scenes.cpp crossing
integrators over scenes with known path-traced references)."""

import numpy as np

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


def test_sppm_converges_to_path():
    from tpupt.integrators.sppm import SPPMRenderer

    ip, r = _path_image()
    s = SPPMRenderer(r, photons_per_iter=8192)
    im = s.render(n_iterations=8)
    assert np.isfinite(im).all()
    np.testing.assert_allclose(im.mean(), ip.mean(), rtol=0.12)


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
