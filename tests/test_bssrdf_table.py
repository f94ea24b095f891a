"""Beam-diffusion BSSRDF table (bssrdf.cpp:145 parity; VERDICT r4 #9).

Property + parity tests for the tabulated profile that replaces the
Burley stand-in: normalization (the sampled-weight estimator must
integrate to the table's effective albedo), the SubsurfaceFromDiffuse
inversion round-trip, and quantitative agreement of the Burley
approximation with the beam-diffusion ground truth it approximates.
"""

import numpy as np
import pytest

from tpupt.materials.bssrdf_table import (compute_beam_diffusion_table,
                                          subsurface_from_diffuse)


def test_rho_eff_properties():
    """rhoEff is 0 at rho=0, strictly increasing, < 1, and approaches 1
    for near-unit single-scatter albedo (bssrdf.cpp:691)."""
    t = compute_beam_diffusion_table(1.33)
    assert t.rho[0] == 0.0 and abs(t.rho_eff[0]) < 1e-9
    assert (np.diff(t.rho_eff) > -1e-9).all()
    assert t.rho_eff[-1] <= 1.0  # conservative limit: rho = 1 -> 1.0
    assert t.rho_eff[-1] > 0.85  # near-white albedo reflects most light
    # effective albedo is below single-scatter albedo (absorption between
    # scattering events)
    assert (t.rho_eff[1:] < t.rho[1:] + 1e-6).all()


def test_profile_normalization_against_cdf():
    t = compute_beam_diffusion_table(1.33)
    assert np.allclose(t.cdf[:, -1][t.rho_eff > 1e-9], 1.0, atol=1e-6)
    assert (t.profile >= 0.0).all()


def test_subsurface_from_diffuse_roundtrip():
    """Invert rho_eff -> (sigma_a, sigma_s), rebuild alpha, re-evaluate
    rho_eff: must land on the target (bssrdf.cpp:700)."""
    t = compute_beam_diffusion_table(1.33)
    for target in (0.1, 0.35, 0.62, 0.9):
        sig_a, sig_s = subsurface_from_diffuse(t, [target] * 3, [1.0] * 3)
        alpha = sig_s / (sig_a + sig_s)
        back = np.interp(alpha[0], t.rho, t.rho_eff)
        assert abs(back - target) < 5e-3, (target, back)


def test_sampled_weight_integrates_to_rho_eff():
    """The device sampling scheme's channel-MIS weight must be an
    unbiased estimator of the diffuse albedo: E[w_profile] = rho_eff
    (the Sp integral; TabulatedBSSRDF::Sample_Sr + Pdf_Sr consistency)."""
    import jax.numpy as jnp

    from tpupt.materials.bssrdf import tabulated_sample_weight
    from tpupt.scene.device import upload
    from tpupt.scene.flatten import flatten
    from tpupt.scene.loader import parse_string

    txt = """
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [4] "integer yresolution" [4]
Integrator "path"
WorldBegin
Material "subsurface" "color sigma_a" [0.02 0.04 0.08]
    "color sigma_prime_s" [1.5 1.2 1.0]
Shape "sphere" "float radius" [1]
WorldEnd
"""
    ds, st = upload(flatten(parse_string(txt)))
    assert st.has_bssrdf_table and ds.sss_pack is not None
    rho_eff = np.asarray(ds.sss_pack[0, 3:6])

    n = 1 << 14
    rng = np.random.default_rng(0)
    ch = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    u_r = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    mat_id = jnp.zeros(n, jnp.int32)
    r, w = tabulated_sample_weight(ds, mat_id, ch, u_r, None)
    w = np.asarray(w)
    assert np.isfinite(w).all() and (np.asarray(r) > 0).all()
    est = w.mean(axis=0)
    np.testing.assert_allclose(est, rho_eff, rtol=0.05)


def test_burley_approximates_beam_diffusion():
    """The Burley profile this table replaces is a published fit to beam
    diffusion: at matched (rho_eff, mfp) their mean exit radii must agree
    within the fit's error envelope (sanity that both models describe the
    same physics; quantifies the r1-r4 stand-in's accuracy)."""
    from tpupt.scene.flatten import _burley_d

    t = compute_beam_diffusion_table(1.33)
    for target in (0.3, 0.6, 0.85):
        sig_a, sig_s = subsurface_from_diffuse(t, [target], [1.0])
        alpha = float(sig_s[0] / (sig_a[0] + sig_s[0]))
        k = np.searchsorted(t.rho, alpha).clip(1, len(t.rho) - 1)
        w = (alpha - t.rho[k - 1]) / max(t.rho[k] - t.rho[k - 1], 1e-12)
        prof = (1 - w) * t.profile[k - 1] + w * t.profile[k]
        # mean radius of the beam-diffusion profile (optical units = mfp)
        norm = np.trapezoid(prof, t.radius)
        mean_bd = np.trapezoid(prof * t.radius, t.radius) / max(norm, 1e-12)
        # Burley: E[r] = integral r * Sp 2 pi r dr = (1*1 + 3*3)/4 * d... =
        # d * (1*0.25*1 + 0.75*3) -> per-exponential means d and 3d
        d = float(_burley_d(np.asarray([target]), np.asarray([1.0]))[0])
        mean_burley = d * (0.25 * 1.0 + 0.75 * 3.0)
        ratio = mean_bd / mean_burley
        assert 0.4 < ratio < 2.5, (target, mean_bd, mean_burley)
