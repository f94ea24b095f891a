"""BSSRDF tests: Burley profile math + subsurface scene renders
(core/bssrdf.cpp parity)."""

import numpy as np
import jax.numpy as jnp

from tpupt.materials.bssrdf import (burley_cdf, burley_profile,
                                    burley_sample_r, fresnel_moment1)


def test_burley_profile_normalized():
    """integral of profile * 2 pi r dr == 1 for any d."""
    for d in (0.1, 1.0, 5.0):
        r = np.linspace(1e-4, 60 * d, 200_000)
        p = np.array(burley_profile(jnp.asarray(r), d))
        integral = np.trapezoid(p * 2 * np.pi * r, r)
        assert abs(integral - 1.0) < 1e-3, (d, integral)


def test_burley_cdf_inversion():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0.001, 0.999, 10_000).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.05, 3.0, 10_000).astype(np.float32))
    r = burley_sample_r(u, d)
    np.testing.assert_allclose(np.array(burley_cdf(r, d)), np.array(u),
                               atol=2e-4)


def test_fresnel_moment_reference_values():
    # c = 1 - 2*FresnelMoment1(1/eta) must be in (0,1) for glass-like eta
    for eta in (1.3, 1.33, 1.5):
        c = 1.0 - 2.0 * float(fresnel_moment1(jnp.asarray(1.0 / eta)))
        assert 0.0 < c < 1.0, (eta, c)


def test_kdsubsurface_scene_renders():
    """kdsubsurface sphere lights up, stays finite, and scales with Kd."""
    from tpupt.scene.flatten import flatten
    from tpupt.scene.loader import parse_string
    from tpupt.integrators.path import Renderer

    def render(kd):
        sc = flatten(parse_string(f"""
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "halton" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [6]
WorldBegin
LightSource "distant" "point from" [2 3 4] "point to" [0 0 0] "rgb L" [2 2 2]
Material "kdsubsurface" "rgb Kd" [{kd} {kd} {kd}] "float mfp" [0.05]
Shape "sphere" "float radius" [1]
WorldEnd
"""))
        r = Renderer(sc)
        return np.array(r.image(r.render(spp=8)))

    bright = render(0.9)
    dark = render(0.2)
    assert np.isfinite(bright).all() and np.isfinite(dark).all()
    assert bright.max() > 0.02          # light exits the medium
    assert bright.mean() > dark.mean() * 1.5  # albedo drives exitance


def test_subsurface_sigma_parameterization():
    """'subsurface' (sigma_a / sigma_prime_s) parses and renders."""
    from tpupt.scene.flatten import flatten
    from tpupt.scene.loader import parse_string
    from tpupt.integrators.path import Renderer

    sc = flatten(parse_string("""
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective"
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "halton" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [5]
WorldBegin
LightSource "distant" "point from" [2 3 4] "point to" [0 0 0] "rgb L" [3 3 3]
Material "subsurface" "float scale" [1]
Shape "sphere" "float radius" [1]
WorldEnd
"""))
    r = Renderer(sc)
    img = np.array(r.image(r.render(spp=4)))
    assert np.isfinite(img).all()
    assert img.max() > 0.0
