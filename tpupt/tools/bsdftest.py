"""bsdftest — BSDF sampling validator (counterpart of src/tools/bsdftest.cpp).

    python -m tpupt.tools.bsdftest [--material matte|plastic|metal|disney|...]
        [--samples N] [--theta DEG]

For the chosen material it estimates hemispherical-directional reflectance
two ways — by BSDF importance sampling and by uniform-sphere sampling — and
prints both plus a χ² statistic comparing the sampled-direction histogram
against the analytic pdf (the reference binary's estimate_reflectance /
chi-square loop)."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def run(material: str, n: int, theta_deg: float, rough: float) -> dict:
    import jax.numpy as jnp

    from tpupt.materials import bsdf as bx

    type_id = {
        "matte": bx.MAT_MATTE, "plastic": bx.MAT_PLASTIC,
        "metal": bx.MAT_METAL, "uber": bx.MAT_UBER,
        "substrate": bx.MAT_SUBSTRATE, "translucent": bx.MAT_TRANSLUCENT,
        "disney": bx.MAT_DISNEY, "hair": bx.MAT_HAIR,
    }[material]
    feats = frozenset({"disney", "hair"} & {material})
    extra = np.zeros((n, 12), np.float32)
    if material == "disney":
        extra[:, 0] = 0.3  # metallic
        extra[:, 4] = 0.5  # clearcoat
        extra[:, 5] = 1.0
    if material == "hair":
        extra[:, 0] = extra[:, 1] = 0.3
    if material == "uber":
        extra[:, 7] = 1.0  # fully opaque (uber.cpp opacity default)
    mp = bx.MatParams(
        type=jnp.full(n, type_id, jnp.int32),
        kd=jnp.full((n, 3), 0.5), ks=jnp.full((n, 3), 0.5),
        kr=jnp.full((n, 3), 0.5), kt=jnp.full((n, 3), 0.5),
        alpha_x=jnp.full(n, rough), alpha_y=jnp.full(n, rough),
        eta=jnp.full((n, 3), 1.5), k=jnp.full((n, 3), 2.0),
        sigma_a=jnp.ones(n), sigma_b=jnp.zeros(n),
        extra=jnp.asarray(extra), rough=jnp.full(n, rough),
        h=jnp.zeros(n))
    th = np.deg2rad(theta_deg)
    wo = jnp.broadcast_to(
        jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32), (n, 3))

    rng = np.random.default_rng(0)
    u = rng.uniform(size=(3, n)).astype(np.float32)
    bs = bx.sample(mp, wo, jnp.asarray(u[0]), jnp.asarray(u[1]),
                   jnp.asarray(u[2]), feats)
    pdf = np.array(bs.pdf)
    wi = np.array(bs.wi)
    f = np.array(bs.f)
    ok = pdf > 1e-6
    rho_is = (f[ok] * np.abs(wi[ok, 2:3]) / pdf[ok, None]).mean(0)

    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    s = np.sqrt(np.maximum(0, 1 - z * z))
    wi_u = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z], -1),
                       jnp.float32)
    f_u, pdf_u = bx.eval_pdf(mp, wo, wi_u, feats)
    rho_us = (np.array(f_u) * np.abs(np.array(wi_u)[:, 2:3])).mean(0) * 4 * np.pi

    # χ²: histogram of sampled directions vs expected counts from the pdf
    # (cosTheta x phi grid, as in the reference's chi-square test)
    nb_th, nb_ph = 10, 10
    cos_bins = np.clip(((wi[ok, 2] + 1) / 2 * nb_th).astype(int), 0, nb_th - 1)
    phi_s = np.arctan2(wi[ok, 1], wi[ok, 0]) + np.pi
    phi_bins = np.clip((phi_s / (2 * np.pi) * nb_ph).astype(int), 0, nb_ph - 1)
    observed = np.bincount(cos_bins * nb_ph + phi_bins,
                           minlength=nb_th * nb_ph).astype(np.float64)
    # expected from evaluating the pdf at uniform points in each bin
    pdf_eval = np.array(pdf_u)
    cos_u = np.clip(((np.array(wi_u)[:, 2] + 1) / 2 * nb_th).astype(int),
                    0, nb_th - 1)
    phi_u = np.arctan2(np.array(wi_u)[:, 1], np.array(wi_u)[:, 0]) + np.pi
    phb_u = np.clip((phi_u / (2 * np.pi) * nb_ph).astype(int), 0, nb_ph - 1)
    expected = np.zeros(nb_th * nb_ph)
    np.add.at(expected, cos_u * nb_ph + phb_u, pdf_eval)
    expected *= 4 * np.pi / n * ok.sum()
    mask = expected > 5
    chi2 = float((((observed - expected) ** 2
                   / np.maximum(expected, 1e-9))[mask]).sum())
    dof = int(mask.sum()) - 1
    return dict(material=material, rho_sampled=rho_is.tolist(),
                rho_uniform=rho_us.tolist(), chi2=chi2, dof=dof,
                valid_fraction=float(ok.mean()))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--material", default="matte")
    ap.add_argument("--samples", type=int, default=100_000)
    ap.add_argument("--theta", type=float, default=30.0)
    ap.add_argument("--roughness", type=float, default=0.2)
    args = ap.parse_args(argv)
    r = run(args.material, args.samples, args.theta, args.roughness)
    print(f"material {r['material']}: valid {r['valid_fraction']:.3f}")
    print(f"  rho (importance sampled) = {r['rho_sampled']}")
    print(f"  rho (uniform reference)  = {r['rho_uniform']}")
    print(f"  chi2 = {r['chi2']:.1f}  dof = {r['dof']}")
    err = max(abs(a - b) for a, b in zip(r["rho_sampled"], r["rho_uniform"]))
    ok = err < 0.05 or err < 0.1 * max(max(r["rho_uniform"]), 1e-3)
    print("  CONSISTENT" if ok else "  MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
