"""Tabulated Fourier BSDF — counterpart of materials/fourier.cpp +
FourierBSDF (core/reflection.cpp:307-362).

Reads the binary `.bsdf` format ("SCATFUN" v1: mu knots, per-(muI,muO)
Fourier coefficient runs) and evaluates the azimuthal cosine series with
Catmull-Rom interpolation over the 4x4 neighboring knot pairs. The k-sum
runs as a `lax.fori_loop` with per-pair length masks instead of the
reference's pointer-walked variable-length runs."""

from __future__ import annotations

import struct
import warnings

import numpy as np
import jax
import jax.numpy as jnp


def read_bsdf_file(path: str):
    """FourierBSDFTable::Read parity (fourier.cpp:106-200)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"SCATFUN\x01":
        warnings.warn(f"{path}: not a SCATFUN v1 .bsdf file")
        return None
    (flags, n_mu, n_coeffs, m_max, n_channels, n_bases, _, _, _
     ) = struct.unpack_from("<9i", data, 8)
    (eta,) = struct.unpack_from("<f", data, 8 + 36)
    off = 8 + 36 + 4 + 16  # header + ints + eta + 4 unused ints
    if flags != 1 or n_channels not in (1, 3) or n_bases != 1:
        warnings.warn(f"{path}: unsupported .bsdf variant")
        return None
    mu = np.frombuffer(data, "<f4", n_mu, off)
    off += 4 * n_mu
    # marginal cdf over muI per muO row (cdf[o*n_mu+i] = integral of the
    # azimuth-integrated 0th Fourier coefficient up to mu[i]) — the
    # importance sampler inverts it (FourierBSDF::Sample_f,
    # reflection.cpp:523 via SampleCatmullRom2D)
    cdf = np.frombuffer(data, "<f4", n_mu * n_mu, off)
    off += 4 * n_mu * n_mu
    oal = np.frombuffer(data, "<i4", 2 * n_mu * n_mu, off).reshape(-1, 2)
    off += 8 * n_mu * n_mu
    a = np.frombuffer(data, "<f4", n_coeffs, off)
    return dict(mu=mu.astype(np.float32), a=a.astype(np.float32),
                cdf=cdf.astype(np.float32),
                aoffset=oal[:, 0].astype(np.int32),
                m=oal[:, 1].astype(np.int32), m_max=int(m_max),
                n_mu=int(n_mu), n_channels=int(n_channels), eta=float(eta))


def make_lambertian_table(kd=0.5, n_mu=16):
    """Synthesize a table for a Lambertian BRDF (used by the tests: the
    series is a single constant term a0 = kd/pi * |muI|)."""
    mu = np.linspace(-1.0, 1.0, n_mu).astype(np.float32)
    m = np.zeros(n_mu * n_mu, np.int32)
    aoffset = np.zeros(n_mu * n_mu, np.int32)
    coeffs = []
    for oi in range(n_mu):
        for oj in range(n_mu):
            idx = oj * n_mu + oi  # (muI index oi, muO index oj)
            if mu[oi] < 0 and mu[oj] > 0 or (mu[oi] > 0 and mu[oj] < 0):
                # f includes the 1/|muI| scale; table stores f*|muI|
                aoffset[idx] = len(coeffs)
                coeffs.append(np.float32(kd / np.pi * abs(mu[oi])))
                m[idx] = 1
    # cdf rows matching the file format: trapezoid integral of 2*pi*a0
    # over muI per muO row (fourier.cpp:188)
    cdf = np.zeros((n_mu, n_mu), np.float32)
    a_arr = np.asarray(coeffs, np.float32)
    for oj in range(n_mu):
        for oi in range(1, n_mu):
            def a0(ii):
                idx = oj * n_mu + ii
                return a_arr[aoffset[idx]] if m[idx] > 0 else 0.0
            cdf[oj, oi] = cdf[oj, oi - 1] + 2.0 * np.pi * 0.5 * (
                a0(oi) + a0(oi - 1)) * (mu[oi] - mu[oi - 1])
    return dict(mu=mu, a=a_arr, cdf=cdf.reshape(-1), aoffset=aoffset,
                m=m, m_max=1, n_mu=n_mu, n_channels=1, eta=1.0)


def catmullrom_weights(knots, x):
    """Batched CatmullRomWeights (core/interpolation.cpp:180-230):
    returns (offset, w) with w (N,4) spline weights over knots[offset..+3]."""
    n = knots.shape[0]
    i = jnp.clip(jnp.searchsorted(knots, x, side="right") - 1, 0, n - 2)
    x0 = knots[i]
    x1 = knots[i + 1]
    t = jnp.clip((x - x0) / jnp.maximum(x1 - x0, 1e-12), 0.0, 1.0)
    t2 = t * t
    t3 = t2 * t
    w1 = 2 * t3 - 3 * t2 + 1
    w2 = -2 * t3 + 3 * t2
    have_prev = i > 0
    w0p = (t3 - 2 * t2 + t) * (x1 - x0) / jnp.maximum(
        x1 - knots[jnp.maximum(i - 1, 0)], 1e-12)
    w0f = t3 - 2 * t2 + t
    w0_ = jnp.where(have_prev, -w0p, 0.0)
    w1 = w1 - jnp.where(have_prev, 0.0, w0f)
    w2 = w2 + jnp.where(have_prev, w0p, w0f)
    have_next = i + 2 < n
    w3n = (t3 - t2) * (x1 - x0) / jnp.maximum(
        knots[jnp.minimum(i + 2, n - 1)] - x0, 1e-12)
    w3f = t3 - t2
    w1 = w1 - jnp.where(have_next, w3n, w3f)
    w2 = w2 + jnp.where(have_next, 0.0, w3f)
    w3_ = jnp.where(have_next, w3n, 0.0)
    w = jnp.stack([w0_, w1, w2, w3_], -1)
    offset = i - 1  # weights apply to knots[offset .. offset+3]
    ok = (x >= knots[0]) & (x <= knots[-1])
    return offset, w, ok


def fourier_f(tbl, wo, wi):
    """FourierBSDF::f batched. tbl: dict of jnp arrays + static ints.
    Convention matches the reference: muI = cos(-wi), muO = cos(wo)."""
    mu = tbl["mu"]
    n_mu = tbl["n_mu"]
    m_max = tbl["m_max"]
    n_ch = tbl["n_channels"]
    a = tbl["a"]
    m_arr = tbl["m"]
    aoff = tbl["aoffset"]

    mu_i = -wi[..., 2]
    mu_o = wo[..., 2]
    # cos of azimuth difference between -wi and wo (CosDPhi)
    ax = -wi[..., 0]
    ay = -wi[..., 1]
    bx_ = wo[..., 0]
    by = wo[..., 1]
    den = jnp.sqrt(jnp.maximum((ax * ax + ay * ay) * (bx_ * bx_ + by * by),
                               1e-20))
    cos_phi = jnp.clip((ax * bx_ + ay * by) / den, -1.0, 1.0)

    oi, wi4, ok_i = catmullrom_weights(mu, mu_i)
    oo, wo4, ok_o = catmullrom_weights(mu, mu_o)
    valid = ok_i & ok_o

    # accumulate the Fourier sum directly: for each of the 16 knot pairs,
    # sum_k w * a[off+c*m+k] * cos(k*phi) via the Chebyshev recurrence
    n = wo.shape[0]
    out = [jnp.zeros(n) for _ in range(n_ch)]
    cos1 = cos_phi
    for b in range(4):
        for a4 in range(4):
            ii = jnp.clip(oi + a4, 0, n_mu - 1)
            jj = jnp.clip(oo + b, 0, n_mu - 1)
            pair = jj * n_mu + ii  # (muO major, fourier.cpp GetAk order)
            w = wi4[..., a4] * wo4[..., b]
            off = aoff[pair]
            m = m_arr[pair]

            def k_body(k, carry):
                sums, ck, ck_1 = carry  # cos(k phi), cos((k-1) phi)
                msk = k < m
                new = []
                for c in range(n_ch):
                    coef = a[jnp.clip(off + c * m + k, 0,
                                      a.shape[0] - 1)]
                    new.append(sums[c] + jnp.where(msk, w * coef * ck, 0.0))
                ck_next = 2.0 * cos1 * ck - ck_1
                return (new, ck_next, ck)

            sums = [jnp.zeros(n) for _ in range(n_ch)]
            (sums, _, _) = jax.lax.fori_loop(
                0, m_max, k_body, (sums, jnp.ones(n), cos1))
            out = [o_ + s_ for o_, s_ in zip(out, sums)]

    scale = jnp.where(jnp.abs(mu_i) > 1e-6, 1.0 / jnp.abs(mu_i), 0.0)
    y = jnp.maximum(out[0], 0.0)
    if n_ch == 1:
        rgb = jnp.stack([y, y, y], -1)
    else:
        r = out[1]
        b_ = out[2]
        g = 1.39829 * y - 0.100913 * b_ - 0.297375 * r
        rgb = jnp.clip(jnp.stack([r, g, b_], -1), 0.0, None)
    return jnp.where(valid[..., None], rgb * scale[..., None], 0.0)


def _cdf_row(tbl, mu_o):
    """Catmull-Rom-weighted combination of the 4 cdf rows around mu_o:
    R (N, n_mu) is the conditional (unnormalized) cdf over muI given muO
    (the linear-inversion analog of SampleCatmullRom2D's row blend,
    interpolation.cpp:290)."""
    mu = tbl["mu"]
    n_mu = tbl["n_mu"]
    cdf = tbl["cdf"]
    oo, wo4, ok_o = catmullrom_weights(mu, mu_o)
    cols = jnp.arange(n_mu)
    R = 0.0
    for b in range(4):
        jj = jnp.clip(oo + b, 0, n_mu - 1)
        R = R + wo4[..., b:b + 1] * cdf[jj[..., None] * n_mu + cols[None, :]]
    # weighted rows can dip epsilon-negative at the spline edges; a running
    # max keeps R monotone for the inversion
    R = jax.lax.cummax(jnp.maximum(R, 0.0), axis=R.ndim - 1)
    return R, ok_o


def fourier_pdf(tbl, wo, wi):
    """Solid-angle pdf of fourier_sample: piecewise-constant-in-mu
    conditional density from the tabulated cdf, uniform in azimuth
    (FourierBSDF::Pdf parity up to the linear-vs-spline inversion,
    reflection.cpp:573)."""
    mu = tbl["mu"]
    n_mu = tbl["n_mu"]
    mu_i = -wi[..., 2]
    mu_o = wo[..., 2]
    R, ok_o = _cdf_row(tbl, mu_o)
    i = jnp.clip(jnp.searchsorted(mu, mu_i, side="right") - 1, 0, n_mu - 2)
    c_lo = jnp.take_along_axis(R, i[..., None], -1)[..., 0]
    c_hi = jnp.take_along_axis(R, (i + 1)[..., None], -1)[..., 0]
    norm = R[..., n_mu - 1]
    seg = jnp.maximum(mu[i + 1] - mu[i], 1e-12)
    pdf_mu = jnp.where(norm > 1e-12, (c_hi - c_lo) / (seg * norm), 0.0)
    ok = ok_o & (mu_i >= mu[0]) & (mu_i <= mu[-1])
    return jnp.where(ok, jnp.maximum(pdf_mu, 0.0) / (2.0 * np.pi), 0.0)


def fourier_sample(tbl, wo, u1, u2):
    """Sample wi from the tabulated distribution: invert the conditional
    muI cdf (piecewise linear), pick the azimuth offset uniformly.
    Returns wi (N,3); its pdf is exactly fourier_pdf(tbl, wo, wi)."""
    mu = tbl["mu"]
    n_mu = tbl["n_mu"]
    mu_o = wo[..., 2]
    R, _ = _cdf_row(tbl, mu_o)
    norm = R[..., n_mu - 1]
    target = u1 * norm
    i = jnp.clip(jnp.sum((R <= target[..., None]).astype(jnp.int32), -1) - 1,
                 0, n_mu - 2)
    c_lo = jnp.take_along_axis(R, i[..., None], -1)[..., 0]
    c_hi = jnp.take_along_axis(R, (i + 1)[..., None], -1)[..., 0]
    t = jnp.clip((target - c_lo) / jnp.maximum(c_hi - c_lo, 1e-12), 0.0, 1.0)
    mu_i = mu[i] + t * (mu[i + 1] - mu[i])
    mu_i = jnp.clip(mu_i, -1.0, 1.0)
    # azimuth: -wi gets wo's azimuth plus a uniform offset
    phi_o = jnp.arctan2(wo[..., 1], wo[..., 0])
    phi = phi_o + 2.0 * np.pi * u2
    sin_i = jnp.sqrt(jnp.maximum(1e-20, 1.0 - mu_i * mu_i))
    # -wi = (sin_i cos(phi), sin_i sin(phi), mu_i)
    return -jnp.stack([sin_i * jnp.cos(phi), sin_i * jnp.sin(phi), mu_i], -1)
