"""L2 spectral substrate (counterpart of src/core/spectrum.{h,cpp}).

The working representation is RGB triples on the trailing axis (the reference's
default `Spectrum = RGBSpectrum`, spectrum.h:50). A 60-bin sampled-spectrum
path (`SampledSpectrum`, spectrum.h:289) is provided for spectral rendering.
Its CIE matching curves are the tabulated 471-sample CIE 1931 standard data
(core/cie_data.npz, the table the reference embeds at spectrum.cpp:190-906)
bin-averaged per AverageSpectrumSamples; the Smits RGB->spectrum tables ship
in the same file for reference-parity promotion (rgb_refl_to_spectrum /
rgb_illum_to_spectrum). The Wyman/Sloan/Shirley 2013 analytic fit remains as
a fallback when the data file is absent.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

N_SPECTRAL_SAMPLES = 60
LAMBDA_START = 400.0
LAMBDA_END = 700.0


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """y() of RGBSpectrum (spectrum.h YWeight)."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def rgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        dtype=rgb.dtype,
    )
    return rgb @ m.T


def xyz_to_rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875991, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ],
        dtype=xyz.dtype,
    )
    return xyz @ m.T


# --- analytic CIE 1931 matching-function fit (Wyman/Sloan/Shirley 2013) ---


def _gauss(x, alpha, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return alpha * np.exp(-0.5 * ((x - mu) / s) ** 2)


def cie_xyz_fit(lam: np.ndarray):
    """Approximate CIE x̄/ȳ/z̄ at wavelengths lam (nm)."""
    lam = np.asarray(lam, np.float64)
    x = (
        _gauss(lam, 1.056, 599.8, 37.9, 31.0)
        + _gauss(lam, 0.362, 442.0, 16.0, 26.7)
        + _gauss(lam, -0.065, 501.1, 20.4, 26.2)
    )
    y = _gauss(lam, 0.821, 568.8, 46.9, 40.5) + _gauss(lam, 0.286, 530.9, 16.3, 31.1)
    z = _gauss(lam, 1.217, 437.0, 11.8, 36.0) + _gauss(lam, 0.681, 459.0, 26.0, 13.8)
    return x, y, z


_BIN_LAMBDA = np.linspace(LAMBDA_START, LAMBDA_END, N_SPECTRAL_SAMPLES + 1)
_BIN_CENTER = 0.5 * (_BIN_LAMBDA[:-1] + _BIN_LAMBDA[1:])


def average_spectrum_samples(lam: np.ndarray, val: np.ndarray,
                             lo: float, hi: float) -> float:
    """Mean of the piecewise-linear spectrum (lam, val) over [lo, hi] with
    constant extension outside the sample range (core/spectrum.cpp:129
    AverageSpectrumSamples)."""
    if hi <= lam[0]:
        return float(val[0])
    if lo >= lam[-1]:
        return float(val[-1])
    if len(lam) == 1:
        return float(val[0])
    s = 0.0
    if lo < lam[0]:
        s += val[0] * (lam[0] - lo)
    if hi > lam[-1]:
        s += val[-1] * (hi - lam[-1])
    i = int(np.searchsorted(lam, lo, side="right") - 1)
    i = max(i, 0)

    def interp(w, j):
        t = (w - lam[j]) / (lam[j + 1] - lam[j])
        return (1 - t) * val[j] + t * val[j + 1]

    while i + 1 < len(lam) and hi >= lam[i]:
        sl = max(lo, lam[i])
        sh = min(hi, lam[i + 1])
        if sh > sl:
            s += 0.5 * (interp(sl, i) + interp(sh, i)) * (sh - sl)
        i += 1
    return float(s / (hi - lo))


def _resample_to_bins(lam: np.ndarray, val: np.ndarray) -> np.ndarray:
    return np.asarray([
        average_spectrum_samples(lam, val, _BIN_LAMBDA[i], _BIN_LAMBDA[i + 1])
        for i in range(N_SPECTRAL_SAMPLES)])


def _cie_tables():
    """Bin-averaged CIE 1931 matching functions: the tabulated 471-sample
    standard data (shipped as core/cie_data.npz; same values the reference
    embeds at spectrum.cpp:190-906) resampled to the 60 transport bins via
    AverageSpectrumSamples; the Wyman/Sloan/Shirley analytic fit is the
    fallback when the data file is absent."""
    import os

    path = os.path.join(os.path.dirname(__file__), "cie_data.npz")
    if os.path.exists(path):
        z = np.load(path)
        lam = z["CIE_lambda"]
        return (_resample_to_bins(lam, z["CIE_X"]),
                _resample_to_bins(lam, z["CIE_Y"]),
                _resample_to_bins(lam, z["CIE_Z"]))
    return cie_xyz_fit(_BIN_CENTER)


_CIE_X, _CIE_Y, _CIE_Z = _cie_tables()
_CIE_Y_INT = float(np.sum(_CIE_Y))


def sampled_to_xyz(s: jnp.ndarray) -> jnp.ndarray:
    """(..., 60) sampled spectrum -> XYZ (spectrum.h SampledSpectrum::ToXYZ)."""
    cx = jnp.asarray(_CIE_X, s.dtype)
    cy = jnp.asarray(_CIE_Y, s.dtype)
    cz = jnp.asarray(_CIE_Z, s.dtype)
    return jnp.stack(
        [jnp.sum(s * cx, -1), jnp.sum(s * cy, -1), jnp.sum(s * cz, -1)], axis=-1
    ) / _CIE_Y_INT


def _spec_rgb_m() -> np.ndarray:
    """(3, N) linear map spectrum -> RGB consistent with sampled_to_xyz."""
    m_xyz = np.stack([_CIE_X, _CIE_Y, _CIE_Z]) / _CIE_Y_INT
    rgb_m = np.array([
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ])
    return rgb_m @ m_xyz


# White balance: scale the spectrum->RGB map per channel so the FLAT
# (equal-energy) spectrum maps to exactly RGB (1,1,1). Gray then uplifts to
# a flat SPD, and products of grays stay gray — matching the reference's
# behavior where the Smits white basis is ~flat (spectrum.cpp RGBRefl2Spect
# tables). Without this, squared gray throughput picks up a color cast.
_WHITE_BAL = (1.0 / (_spec_rgb_m() @ np.ones(N_SPECTRAL_SAMPLES))).astype(
    np.float32)


def sampled_to_rgb(s: jnp.ndarray) -> jnp.ndarray:
    return xyz_to_rgb(sampled_to_xyz(s)) * jnp.asarray(_WHITE_BAL, s.dtype)


# --- RGB -> sampled-spectrum uplift (spectrum.cpp RGBSpectrum::
# FromRGB / the Smits-style reflectance promotion). Rather than carrying
# the reference's tabulated basis spectra, the three primary SPDs are
# solved at first use: smoothest spectra (second-difference energy) whose
# sampled_to_rgb round-trip reproduces exactly (1,0,0)/(0,1,0)/(0,0,1).
# Linearity then gives an exact round trip for every RGB triple, so a
# flat-white scene renders identically in RGB and spectral mode while
# products of SATURATED spectra exhibit true metamer behavior. ---

_UPLIFT = None


def _solve_uplift() -> np.ndarray:
    """(7, N) basis SPDs: white, cyan, magenta, yellow, red, green, blue —
    each the smoothest (second-difference energy) nonnegative spectrum whose
    white-balanced sampled_to_rgb equals its target RGB. White solves to the
    flat spectrum, so the Smits decomposition keeps grays flat."""
    n = N_SPECTRAL_SAMPLES
    # white-balanced spectrum -> rgb map (matches sampled_to_rgb): the flat
    # spectrum maps to exactly (1,1,1), so gray uplifts to flat
    M = _WHITE_BAL.astype(np.float64)[:, None] * _spec_rgb_m()
    targets = np.array([
        [1.0, 1.0, 1.0],   # white
        [0.0, 1.0, 1.0],   # cyan
        [1.0, 0.0, 1.0],   # magenta
        [1.0, 1.0, 0.0],   # yellow
        [1.0, 0.0, 0.0],   # red
        [0.0, 1.0, 0.0],   # green
        [0.0, 0.0, 1.0],   # blue
    ])
    d2 = (np.diag(np.full(n, -2.0)) + np.diag(np.ones(n - 1), 1)
          + np.diag(np.ones(n - 1), -1))[1:-1]  # (N-2, N)
    # min ||d2 s||^2 + eps||s||^2  s.t.  M s = target  (KKT closed form),
    # then nonneg-projection + re-constrain sweeps
    Q = d2.T @ d2 + 1e-7 * np.eye(n)
    Qi = np.linalg.inv(Q)
    lam = np.linalg.solve(M @ Qi @ M.T, targets.T)  # (3, 7)
    B = (Qi @ M.T @ lam).T  # (7, N)
    corr = M.T @ np.linalg.solve(M @ M.T, np.eye(3))  # min-norm re-constrain
    for _ in range(200):
        B = np.clip(B, 0.0, None)
        B = B + (targets.T - M @ B.T).T @ corr.T
    return B.astype(np.float32)


def rgb_uplift_basis() -> np.ndarray:
    global _UPLIFT
    if _UPLIFT is None:
        _UPLIFT = _solve_uplift()
    return _UPLIFT


def rgb_to_spectrum(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 60) Smits-style promotion (spectrum.h FromRGB):
    s = min*white + (mid-min)*secondary(argmin) + (max-mid)*primary(argmax).
    Exact sampled_to_rgb round trip by construction; gray -> flat spectrum.
    precision=highest on the one-hot matmuls: the TPU default bf16 passes
    cost ~1% roundtrip error, visible as a cast on every throughput factor."""
    import jax

    t = jnp.asarray(rgb_uplift_basis(), rgb.dtype)  # (7, N)
    mn = jnp.min(rgb, -1)
    mx = jnp.max(rgb, -1)
    md = jnp.sum(rgb, -1) - mn - mx
    hi = jax.lax.Precision.HIGHEST
    sec = jnp.matmul(jax.nn.one_hot(jnp.argmin(rgb, -1), 3, dtype=rgb.dtype),
                     t[1:4], precision=hi)
    prm = jnp.matmul(jax.nn.one_hot(jnp.argmax(rgb, -1), 3, dtype=rgb.dtype),
                     t[4:7], precision=hi)
    return (mn[..., None] * t[0] + (md - mn)[..., None] * sec
            + (mx - md)[..., None] * prm)


_Y_SPEC = (np.array([0.212671, 0.715160, 0.072169])
           @ (_WHITE_BAL.astype(np.float64)[:, None] * _spec_rgb_m())
           ).astype(np.float32)


def spectral_luminance(s: jnp.ndarray) -> jnp.ndarray:
    """y() of SampledSpectrum — equals luminance(sampled_to_rgb(s)) by
    construction (same white-balanced map), so RR decisions agree between
    RGB and spectral transport."""
    return jnp.sum(s * jnp.asarray(_Y_SPEC, s.dtype), axis=-1)


def blackbody(lam_nm: np.ndarray, temp_k: float) -> np.ndarray:
    """Planck's law, W/(m^2 sr m) (spectrum.cpp Blackbody)."""
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    lam = np.asarray(lam_nm, np.float64) * 1e-9
    return (2.0 * h * c * c) / (lam**5 * (np.expm1(h * c / (lam * kb * temp_k))))


def blackbody_normalized(lam_nm: np.ndarray, temp_k: float) -> np.ndarray:
    """Blackbody scaled so peak = 1 (spectrum.cpp BlackbodyNormalized)."""
    lam_max = 2.8977721e-3 / temp_k * 1e9
    return blackbody(lam_nm, temp_k) / blackbody(np.array([lam_max]), temp_k)[0]


# --- reference-parity Smits tables (spectrum.cpp:984-1172 RGBRefl2Spect*/
# RGBIllum2Spect*, shipped as standard data in cie_data.npz) resampled to
# the 60 transport bins. rgb_refl_to_spectrum/rgb_illum_to_spectrum follow
# RGBSpectrum::ToSpectrum's min/mid/max decomposition (spectrum.cpp:289)
# exactly; the solved-basis rgb_to_spectrum above stays the transport
# default because its round trip is exact by construction. ---

_SMITS = None


def smits_tables():
    """{'refl': (7, 60), 'illum': (7, 60)} in white, cyan, magenta,
    yellow, red, green, blue order; None if cie_data.npz is absent."""
    global _SMITS
    if _SMITS is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "cie_data.npz")
        if not os.path.exists(path):
            return None
        z = np.load(path)
        lam = z["RGB2SpectLambda"]
        names = ["White", "Cyan", "Magenta", "Yellow", "Red", "Green",
                 "Blue"]
        _SMITS = {
            kind: np.stack([
                _resample_to_bins(lam, z[f"RGB{tab}2Spect{n}"])
                for n in names]).astype(np.float32)
            for kind, tab in (("refl", "Refl"), ("illum", "Illum"))}
    return _SMITS


def _smits_uplift(rgb: jnp.ndarray, basis: np.ndarray) -> jnp.ndarray:
    """RGBSpectrum::ToSpectrum decomposition (spectrum.cpp:289): the
    smallest channel scales white, the middle adds the secondary of the
    smallest channel, the largest adds the primary of the largest."""
    import jax

    t = jnp.asarray(basis, rgb.dtype)
    mn = jnp.min(rgb, -1)
    mx = jnp.max(rgb, -1)
    md = jnp.sum(rgb, -1) - mn - mx
    hi = jax.lax.Precision.HIGHEST
    sec = jnp.matmul(jax.nn.one_hot(jnp.argmin(rgb, -1), 3, dtype=rgb.dtype),
                     t[1:4], precision=hi)
    prm = jnp.matmul(jax.nn.one_hot(jnp.argmax(rgb, -1), 3, dtype=rgb.dtype),
                     t[4:7], precision=hi)
    s = (mn[..., None] * t[0] + (md - mn)[..., None] * sec
         + (mx - md)[..., None] * prm)
    return jnp.clip(s, 0.0, None)


def rgb_refl_to_spectrum(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reference-parity reflectance promotion (spectrum.cpp:289 with the
    RGBRefl2Spect tables; final scale 0.94 per RGBSpectrum::ToSpectrum)."""
    tabs = smits_tables()
    if tabs is None:
        return rgb_to_spectrum(rgb)
    return 0.94 * _smits_uplift(rgb, tabs["refl"])


def rgb_illum_to_spectrum(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reference-parity illuminant promotion (RGBIllum2Spect tables;
    final scale 0.86445 per RGBSpectrum::ToSpectrum)."""
    tabs = smits_tables()
    if tabs is None:
        return rgb_to_spectrum(rgb)
    return 0.86445 * _smits_uplift(rgb, tabs["illum"])
