"""L2 spectral substrate (counterpart of src/core/spectrum.{h,cpp}).

The working representation is RGB triples on the trailing axis (the reference's
default `Spectrum = RGBSpectrum`, spectrum.h:50). A 60-bin sampled-spectrum
path (`SampledSpectrum`, spectrum.h:289) is provided for spectral rendering;
its CIE matching curves use the public multi-Gaussian analytic fit (Wyman,
Sloan & Shirley 2013) rather than tabulated data.
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
_CIE_X, _CIE_Y, _CIE_Z = cie_xyz_fit(_BIN_CENTER)
_CIE_Y_INT = float(np.sum(_CIE_Y))


def sampled_to_xyz(s: jnp.ndarray) -> jnp.ndarray:
    """(..., 60) sampled spectrum -> XYZ (spectrum.h SampledSpectrum::ToXYZ)."""
    cx = jnp.asarray(_CIE_X, s.dtype)
    cy = jnp.asarray(_CIE_Y, s.dtype)
    cz = jnp.asarray(_CIE_Z, s.dtype)
    scale = (LAMBDA_END - LAMBDA_START) / (_CIE_Y_INT * N_SPECTRAL_SAMPLES) * (
        N_SPECTRAL_SAMPLES / (LAMBDA_END - LAMBDA_START)
    )
    return jnp.stack(
        [jnp.sum(s * cx, -1), jnp.sum(s * cy, -1), jnp.sum(s * cz, -1)], axis=-1
    ) / _CIE_Y_INT


def sampled_to_rgb(s: jnp.ndarray) -> jnp.ndarray:
    return xyz_to_rgb(sampled_to_xyz(s))


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
