"""FourierBSDF tests (materials/fourier.cpp + reflection.cpp:307 parity)."""

import struct

import numpy as np
import jax.numpy as jnp

from tpupt.materials.fourier import (catmullrom_weights, fourier_f,
                                     make_lambertian_table, read_bsdf_file)


def _write_bsdf(path, tbl):
    """Inverse of read_bsdf_file for test fixtures."""
    n_mu = tbl["n_mu"]
    with open(path, "wb") as f:
        f.write(b"SCATFUN\x01")
        f.write(struct.pack("<9i", 1, n_mu, len(tbl["a"]), tbl["m_max"],
                            tbl["n_channels"], 1, 0, 0, 0))
        f.write(struct.pack("<f", tbl["eta"]))
        f.write(struct.pack("<4i", 0, 0, 0, 0))
        f.write(np.asarray(tbl["mu"], np.float32).tobytes())
        f.write(np.zeros(n_mu * n_mu, np.float32).tobytes())  # cdf
        oal = np.stack([tbl["aoffset"], tbl["m"]], -1).astype(np.int32)
        f.write(oal.tobytes())
        f.write(np.asarray(tbl["a"], np.float32).tobytes())


def _as_jnp(tbl):
    out = dict(tbl)
    for k in ("mu", "a", "aoffset", "m"):
        out[k] = jnp.asarray(tbl[k])
    return out


def test_catmullrom_weights_partition_of_unity():
    knots = jnp.asarray(np.linspace(-1, 1, 10, dtype=np.float32))
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, 500)
                    .astype(np.float32))
    off, w, ok = catmullrom_weights(knots, x)
    assert np.array(ok).all()
    np.testing.assert_allclose(np.array(w).sum(-1), 1.0, atol=1e-5)
    # interpolating a linear function reproduces it exactly
    vals = 2.0 * knots + 0.3
    idx = np.clip(np.array(off)[:, None] + np.arange(4), 0, 9)
    got = (np.array(w) * np.array(vals)[idx]).sum(-1)
    np.testing.assert_allclose(got, 2.0 * np.array(x) + 0.3, atol=1e-4)


def test_fourier_lambertian_roundtrip(tmp_path):
    """A synthesized Lambertian table evaluates to kd/pi, through the binary
    file format."""
    kd = 0.6
    tbl = make_lambertian_table(kd, n_mu=32)
    p = tmp_path / "lambert.bsdf"
    _write_bsdf(str(p), tbl)
    tbl2 = read_bsdf_file(str(p))
    assert tbl2 is not None
    np.testing.assert_allclose(tbl2["mu"], tbl["mu"])
    np.testing.assert_allclose(tbl2["a"], tbl["a"])

    rng = np.random.default_rng(1)
    n = 2000
    # reflection geometry: wo.z > 0, wi.z > 0 (muI = -wi.z < 0 -> opposite
    # sign convention pairs transmission cells; Lambertian table filled for
    # opposite-sign (muI, muO))
    z = rng.uniform(0.2, 0.95, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    s = np.sqrt(1 - z * z)
    wi = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z], -1),
                     jnp.float32)
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.0, 0.954]), (n, 3))
    f = np.array(fourier_f(_as_jnp(tbl2), wo, wi))
    np.testing.assert_allclose(f[:, 0], kd / np.pi, rtol=0.02)


def test_fourier_material_renders(tmp_path):
    """fourier material in a scene matches matte with the same albedo."""
    from tpupt.scene.flatten import flatten
    from tpupt.scene.loader import parse_string
    from tpupt.integrators.path import Renderer

    kd = 0.6
    p = tmp_path / "lambert.bsdf"
    _write_bsdf(str(p), make_lambertian_table(kd, n_mu=32))

    def render(mat_stmt):
        sc = flatten(parse_string(f"""
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "halton" "integer pixelsamples" [16]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "rgb I" [8 8 8] "point from" [1 2 2]
{mat_stmt}
Shape "sphere" "float radius" [0.8]
WorldEnd
"""), str(tmp_path))
        r = Renderer(sc)
        return np.array(r.image(r.render(spp=16)))

    img_f = render(f'Material "fourier" "string bsdffile" ["{p}"]')
    img_m = render(f'Material "matte" "rgb Kd" [{kd} {kd} {kd}]')
    assert np.isfinite(img_f).all()
    np.testing.assert_allclose(img_f.mean(), img_m.mean(), rtol=0.06)


def test_fourier_sampling_matches_pdf_chi2():
    """fourier_sample's directions are distributed per fourier_pdf (the
    Sample_f/Pdf consistency the reference's BSDF chi-square test checks,
    bsdftest.cpp): bin sampled mu_i and compare counts against the pdf
    integral per bin. For the Lambertian table the marginal over mu is the
    cosine density, doubling as an analytic cross-check."""
    import numpy as np
    import jax.numpy as jnp
    from tpupt.materials.fourier import (make_lambertian_table,
                                         fourier_sample, fourier_pdf)

    tbl_np = make_lambertian_table(kd=0.6, n_mu=24)
    tbl = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in tbl_np.items()}
    n = 1 << 15
    rng = np.random.default_rng(5)
    u1 = jnp.asarray(rng.random(n, np.float32))
    u2 = jnp.asarray(rng.random(n, np.float32))
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.2, 0.933]), (n, 3))
    wi = fourier_sample(tbl, wo, u1, u2)
    mu_i = np.asarray(-wi[:, 2])
    # the Lambertian table stores coefficients where muI and muO have
    # OPPOSITE signs (muI = -wi.z, so physically the SAME hemisphere —
    # reflection); with muO > 0 every sample must land at muI < 0
    # piecewise-linear cdf inversion can park ~0.2% of samples exactly on
    # the zero-mass boundary knot (mu == 0), where f == 0 — harmless
    assert (mu_i < 0).mean() > 0.99

    # bins aligned to the mu knots: the sampling density is piecewise
    # CONSTANT per knot segment, so center-evaluated pdf x width is the
    # exact bin mass
    edges = np.asarray(tbl_np["mu"])
    nb = len(edges) - 1
    counts, _ = np.histogram(mu_i, bins=edges)
    centers = 0.5 * (edges[:-1] + edges[1:])
    wi_c = -np.stack([np.sqrt(np.maximum(1 - centers**2, 0.0)),
                      np.zeros(nb), centers], -1)
    pdf_c = np.asarray(fourier_pdf(
        tbl, jnp.broadcast_to(jnp.asarray([0.3, 0.2, 0.933]), (nb, 3)),
        jnp.asarray(wi_c, jnp.float32)))
    expect = 2 * np.pi * pdf_c * np.diff(edges) * n
    mask = expect > 20
    chi2 = np.sum((counts[mask] - expect[mask]) ** 2 / expect[mask])
    dof = int(mask.sum()) - 1
    # generous 99.9% cut (chi2_0.999 at ~10 dof ~ 29.6)
    assert chi2 < 40.0, (chi2, dof, counts[mask], expect[mask])
    # analytic: Lambertian marginal over |mu| is the cosine density 2|mu|
    # (trapezoid staircase agrees to the segment width)
    # exclude the zero-straddling segment whose center sits at mu ~ 0
    sel = (pdf_c > 1e-4) & (np.abs(centers) > np.diff(edges))
    np.testing.assert_allclose(2 * np.pi * pdf_c[sel],
                               2 * np.abs(centers)[sel], rtol=0.2)
