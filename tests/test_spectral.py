"""Full sampled-spectrum (60-bin) transport tests — the SampledSpectrum
compile mode of the reference (spectrum.h:50,289 PBRT_SAMPLED_SPECTRUM).

The uplift basis promotes RGB scene colors to smooth SPDs with an exact
sampled_to_rgb round trip, so single-interaction renders must match the RGB
transport exactly, while MULTIPLIED spectra (light SPD x reflectance SPD,
multi-bounce throughput chains) exhibit true metamer products that RGB
componentwise products can only approximate.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tpupt.core import spectrum as sp
from tpupt.scene.loader import parse_string
from tpupt.scene.flatten import flatten
from tpupt.integrators.path import Renderer


def _render(txt, spp=8, spectral=False):
    scene = flatten(parse_string(txt))
    r = Renderer(scene, spectral=spectral)
    film = r.render(spp=spp)
    return r.image(film)


def test_uplift_round_trip():
    rng = np.random.default_rng(7)
    c = rng.random((256, 3)).astype(np.float32)
    s = sp.rgb_to_spectrum(jnp.asarray(c))
    back = np.asarray(sp.sampled_to_rgb(s))
    assert np.abs(back - c).max() < 2e-3


def test_uplift_nonnegative_and_white_flat():
    b = sp.rgb_uplift_basis()
    assert b.min() > -1e-2  # smooth basis, at most epsilon negative lobes
    white = np.asarray(sp.rgb_to_spectrum(jnp.ones(3)))
    # white promotes to a near-flat unit spectrum (equal-energy metamer)
    assert np.abs(white.mean() - 1.0) < 0.1
    assert white.std() < 0.35


def test_spectral_luminance_matches_rgb():
    rng = np.random.default_rng(3)
    c = rng.random((64, 3)).astype(np.float32)
    s = sp.rgb_to_spectrum(jnp.asarray(c))
    ly = np.asarray(sp.spectral_luminance(s))
    lr = np.asarray(sp.luminance(jnp.asarray(c)))
    np.testing.assert_allclose(ly, lr, atol=5e-3)


_ENV_ONLY = """
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "random" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "infinite" "color L" [0.7 0.2 0.4]
WorldEnd
"""


def test_spectral_env_only_matches_rgb():
    # one emission, no products: round-trip-exact uplift => identical image
    img_s = _render(_ENV_ONLY, spectral=True)
    np.testing.assert_allclose(
        img_s.mean((0, 1)), [0.7, 0.2, 0.4], rtol=5e-3, atol=2e-3)


_PLANE = """
LookAt 0 0 5   0 0 0   0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "random" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "distant" "point from" [0 0 1] "point to" [0 0 0]
    "color L" [%s]
Material "matte" "color Kd" [%s]
Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
    "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_spectral_gray_scene_matches_rgb():
    # flat spectra (gray surface, gray light): spectral == RGB transport
    txt = _PLANE % ("2 2 2", "0.5 0.5 0.5")
    img_r = _render(txt)
    img_s = _render(txt, spectral=True)
    np.testing.assert_allclose(img_s.reshape(-1, 3).mean(0),
                               img_r.reshape(-1, 3).mean(0),
                               rtol=0.01, atol=2e-3)


def test_spectral_metamer_product_differs_and_is_physical():
    # saturated light x saturated surface: the SPD product is the point of
    # spectral transport. The result must stay nonnegative-luminance and
    # must NOT exceed the RGB componentwise product's luminance by much
    # (smooth basis overlap can only lose energy vs the componentwise
    # product for disjoint-ish primaries).
    txt = _PLANE % ("2 0 0", "0 0.8 0.1")  # red light, green surface
    img_r = _render(txt, spp=16)
    img_s = _render(txt, spp=16, spectral=True)
    lum_r = float(np.asarray(
        sp.luminance(jnp.asarray(img_r.reshape(-1, 3)))).mean())
    lum_s = float(np.asarray(
        sp.luminance(jnp.asarray(img_s.reshape(-1, 3)))).mean())
    # RGB says a pure-red light on a pure-green surface reflects ~nothing;
    # smooth SPDs overlap, so spectral transport reflects MORE — this is
    # the metamer-product signature (and matches the reference's sampled-
    # spectrum mode, whose Smits-style SPDs overlap the same way)
    assert lum_s > lum_r
    assert lum_s < 0.25 * 2.0 / np.pi  # still far below a white pairing


def test_spectral_multibounce_energy_sane():
    # closed-ish scene with interreflection: spectral beta chains stay
    # bounded and produce finite, nonnegative images
    txt = """
    LookAt 0 3 6   0 0 0   0 1 0
    Camera "perspective" "float fov" [45]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "halton" "integer pixelsamples" [4]
    Integrator "path" "integer maxdepth" [5]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [6 5 4]
      Translate 0 4 0
      Shape "trianglemesh" "point P" [ -1 -1 4  1 -1 4  1 1 4  -1 1 4 ]
          "integer indices" [0 1 2 2 3 0]
    AttributeEnd
    Material "plastic" "color Kd" [.4 .2 .2] "color Ks" [.4 .4 .4]
        "float roughness" [.05]
    Shape "sphere" "float radius" [1]
    Material "matte" "color Kd" [.6 .6 .4]
    Shape "trianglemesh" "point P" [ -20 -20 -1.5  20 -20 -1.5  20 20 -1.5  -20 20 -1.5 ]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    img_s = _render(txt, spp=4, spectral=True)
    img_r = _render(txt, spp=4)
    assert np.isfinite(img_s).all() and (img_s >= 0).all()
    # same scene, same sampler: images agree closely (colors here are
    # broad, so metamer products deviate only slightly)
    assert np.abs(img_s - img_r).mean() < 0.05 * max(img_r.mean(), 0.01)


def test_cie_tables_match_reference_bin_averages():
    """The transport bins use the tabulated CIE 1931 data (cie_data.npz ==
    spectrum.cpp:190-906), bin-averaged per AverageSpectrumSamples — check
    against an independent dense-resampling integral to 1e-3, and that the
    tabulated curves are actually in use (peak Y bin near 555 nm ~ 1.0)."""
    import os
    import numpy as np
    from tpupt.core import spectrum as S

    path = os.path.join(os.path.dirname(S.__file__), "cie_data.npz")
    assert os.path.exists(path), "tabulated CIE data must ship with tpupt"
    z = np.load(path)
    lam, ciey = z["CIE_lambda"], z["CIE_Y"]
    for i in (0, 15, 30, 31, 45, 59):
        lo, hi = S._BIN_LAMBDA[i], S._BIN_LAMBDA[i + 1]
        dense = np.linspace(lo, hi, 2001)
        ref = np.trapezoid(np.interp(dense, lam, ciey), dense) / (hi - lo)
        assert abs(float(S._CIE_Y[i]) - ref) < 1e-3, (i, S._CIE_Y[i], ref)
    peak_bin = int(np.argmax(S._CIE_Y))
    assert abs(S._BIN_CENTER[peak_bin] - 555.0) < 10.0
    assert S._CIE_Y.max() > 0.98


def test_smits_promotion_parity():
    """rgb_refl_to_spectrum follows RGBSpectrum::ToSpectrum: white maps to
    the White table, primaries combine white+secondary+primary rows, and
    the promoted spectrum's RGB projection stays close to the input."""
    import numpy as np
    import jax.numpy as jnp
    from tpupt.core import spectrum as S

    tabs = S.smits_tables()
    assert tabs is not None and tabs["refl"].shape == (7, 60)
    w = np.asarray(S.rgb_refl_to_spectrum(jnp.asarray([[1.0, 1.0, 1.0]])))[0]
    # RGBSpectrum::ToSpectrum applies a final 0.94 reflectance scale
    np.testing.assert_allclose(w, 0.94 * tabs["refl"][0], atol=1e-6)
    # round-trip fidelity of the Smits tables themselves (approximate by
    # design — the reference's tables reproduce RGB to within a few %)
    for rgb in ([0.7, 0.2, 0.1], [0.1, 0.8, 0.3], [0.25, 0.25, 0.9]):
        s = S.rgb_refl_to_spectrum(jnp.asarray([rgb]))
        back = np.asarray(S.sampled_to_rgb(s))[0]
        np.testing.assert_allclose(back, rgb, atol=0.12)


@pytest.mark.slow
def test_spectral_bdpt_matches_rgb_on_gray_scene():
    """Spectral transport for bdpt (spectrum.h:50 applies to EVERY
    integrator): on a gray scene the exact-round-trip uplift makes the
    spectral bdpt image match RGB bdpt closely."""
    txt = """
LookAt 0 0 4   0 0 0   0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [10] "integer yresolution" [10]
Sampler "random" "integer pixelsamples" [4]
Integrator "bdpt" "integer maxdepth" [2]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "color L" [3 3 3]
  Translate 0 1.8 0
  Shape "trianglemesh" "point P" [-0.5 0 -0.5  0.5 0 -0.5  0.5 0 0.5  -0.5 0 0.5]
      "integer indices" [0 1 2 2 3 0]
AttributeEnd
Material "matte" "color Kd" [0.6 0.6 0.6]
Shape "trianglemesh" "point P" [ -3 -1 -3  3 -1 -3  3 -1 3  -3 -1 3 ]
    "integer indices" [0 1 2 2 3 0]
WorldEnd
"""
    rgb = _render(txt, spp=4, spectral=False)
    spec = _render(txt, spp=4, spectral=True)
    assert np.isfinite(spec).all()
    m = rgb.mean()
    assert m > 1e-4
    assert abs(spec.mean() - m) / m < 0.05


def test_spectral_volpath_matches_rgb_on_gray_medium():
    """Spectral volpath: the sigma tables uplift ONCE so Beer-Lambert runs
    per spectral bin; a gray homogeneous medium must match RGB closely."""
    txt = """
LookAt 0 0 4   0 0 0   0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Sampler "random" "integer pixelsamples" [4]
Integrator "volpath" "integer maxdepth" [3]
WorldBegin
MakeNamedMedium "fog" "string type" "homogeneous"
    "color sigma_a" [0.1 0.1 0.1] "color sigma_s" [0.4 0.4 0.4]
LightSource "point" "point from" [0 1.5 0] "color I" [8 8 8]
Material "matte" "color Kd" [0.5 0.5 0.5]
MediumInterface "fog" ""
Shape "sphere" "float radius" [0.7]
WorldEnd
"""
    rgb = _render(txt, spp=4, spectral=False)
    spec = _render(txt, spp=4, spectral=True)
    assert np.isfinite(spec).all()
    m = rgb.mean()
    assert m > 1e-4
    assert abs(spec.mean() - m) / m < 0.08
