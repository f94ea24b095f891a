"""Monte-Carlo sampling utilities (counterpart of src/core/sampling.{h,cpp}).

Warps map uniform [0,1)^2 samples to directions/areas; Distribution1D/2D are
flat-tensor CDF tables sampled with vectorized searchsorted (the reference's
std::upper_bound walk, sampling.h:70).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

INV_PI = 1.0 / np.pi
INV_2PI = 1.0 / (2.0 * np.pi)
INV_4PI = 1.0 / (4.0 * np.pi)
PI_OVER_2 = np.pi / 2.0
PI_OVER_4 = np.pi / 4.0


def uniform_sample_hemisphere(u1, u2):
    z = u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def concentric_sample_disk(u1, u2):
    """Shirley-Chiu concentric disk warp (sampling.cpp ConcentricSampleDisk),
    branch-free for the VPU."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        PI_OVER_4 * (oy / jnp.where(ox == 0.0, 1.0, ox)),
        PI_OVER_2 - PI_OVER_4 * (ox / jnp.where(oy == 0.0, 1.0, oy)),
    )
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return x, y


def cosine_sample_hemisphere(u1, u2):
    dx, dy = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    return jnp.stack([dx, dy, z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_triangle(u1, u2):
    su0 = jnp.sqrt(u1)
    return 1.0 - su0, u2 * su0


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * jnp.pi * (1.0 - cos_theta_max))


def uniform_sample_cone(u1, u2, cos_theta_max):
    cos_t = (1.0 - u1) + u1 * cos_theta_max
    # floor the sqrt arg: d/dx sqrt(x) at exactly 0 is inf, which poisons
    # reverse-mode through where-masked branches (0 * inf = NaN)
    sin_t = jnp.sqrt(jnp.maximum(1e-20, 1.0 - cos_t * cos_t))
    phi = u2 * 2.0 * jnp.pi
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / (nf * f_pdf + ng * g_pdf)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic beta=2 (sampling.h PowerHeuristic)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.where(denom > 0.0, denom, 1.0), 0.0)


# --------------------------- distributions ---------------------------------


class Distribution1D(NamedTuple):
    """Piecewise-constant 1D distribution (sampling.h:58 Distribution1D):
    func (N,), cdf (N+1,), integral ()."""

    func: jnp.ndarray
    cdf: jnp.ndarray
    integral: jnp.ndarray

    @staticmethod
    def build(func: jnp.ndarray) -> "Distribution1D":
        func = jnp.asarray(func, jnp.float32)
        n = func.shape[-1]
        cdf = jnp.concatenate(
            [jnp.zeros(func.shape[:-1] + (1,), func.dtype), jnp.cumsum(func, -1) / n],
            axis=-1,
        )
        integral = cdf[..., -1]
        # Degenerate (all-zero) distribution -> uniform (sampling.cpp:72).
        uniform = (jnp.arange(n + 1, dtype=func.dtype)) / n
        safe = integral[..., None] > 0.0
        cdf = jnp.where(safe, cdf / jnp.where(safe, integral[..., None], 1.0), uniform)
        return Distribution1D(func, cdf, integral)

    @property
    def count(self) -> int:
        return self.func.shape[-1]

    def sample_continuous(self, u: jnp.ndarray):
        """Returns (x in [0,1), pdf, offset)."""
        n = self.count
        off = jnp.clip(
            jnp.searchsorted(self.cdf, u, side="right") - 1, 0, n - 1
        )
        c0 = self.cdf[off]
        c1 = self.cdf[off + 1]
        du = jnp.where(c1 > c0, (u - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), 0.0)
        pdf = jnp.where(self.integral > 0.0, self.func[off] / jnp.maximum(self.integral, 1e-30), 0.0)
        return (off.astype(jnp.float32) + du) / n, pdf, off

    def sample_discrete(self, u: jnp.ndarray):
        """Returns (offset, pmf)."""
        n = self.count
        off = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1, 0, n - 1)
        pmf = jnp.where(
            self.integral > 0.0,
            self.func[off] / jnp.maximum(self.integral * n, 1e-30),
            1.0 / n,
        )
        return off, pmf

    def discrete_pdf(self, index: jnp.ndarray):
        return jnp.where(
            self.integral > 0.0,
            self.func[index] / jnp.maximum(self.integral * self.count, 1e-30),
            1.0 / self.count,
        )


class Distribution2D(NamedTuple):
    """2D distribution via conditional rows + marginal (sampling.h:190);
    all tables flat tensors: cond_func (H, W), cond_cdf (H, W+1),
    cond_integral (H,), marg_* for the row marginal."""

    cond_func: jnp.ndarray
    cond_cdf: jnp.ndarray
    cond_integral: jnp.ndarray
    marg_func: jnp.ndarray
    marg_cdf: jnp.ndarray
    marg_integral: jnp.ndarray

    @staticmethod
    def build(func: jnp.ndarray) -> "Distribution2D":
        func = jnp.asarray(func, jnp.float32)
        h, w = func.shape
        cond = Distribution1D.build(func)  # batched over rows
        marg = Distribution1D.build(cond.integral)
        return Distribution2D(cond.func, cond.cdf, cond.integral,
                              marg.func, marg.cdf, marg.integral)

    def sample_continuous(self, u1: jnp.ndarray, u2: jnp.ndarray):
        """Returns ((u, v), pdf)."""
        marg = Distribution1D(self.marg_func, self.marg_cdf, self.marg_integral)
        v, pdf_v, row = marg.sample_continuous(u2)
        w = self.cond_func.shape[1]
        cdf_row = self.cond_cdf[row]
        off = jnp.clip(
            jnp.searchsorted(cdf_row, u1, side="right") - 1, 0, w - 1
        ) if cdf_row.ndim == 1 else _batched_searchsorted(cdf_row, u1, w)
        c0 = jnp.take_along_axis(cdf_row, off[..., None], -1)[..., 0] if cdf_row.ndim > 1 else cdf_row[off]
        c1 = jnp.take_along_axis(cdf_row, off[..., None] + 1, -1)[..., 0] if cdf_row.ndim > 1 else cdf_row[off + 1]
        du = jnp.where(c1 > c0, (u1 - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), 0.0)
        f = self.cond_func[row, off]
        integ = self.cond_integral[row]
        pdf_u = jnp.where(integ > 0.0, f / jnp.maximum(integ, 1e-30), 0.0)
        uu = (off.astype(jnp.float32) + du) / w
        return (uu, v), pdf_u * pdf_v

    def pdf(self, u: jnp.ndarray, v: jnp.ndarray):
        h, w = self.cond_func.shape
        iu = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        iv = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        return self.cond_func[iv, iu] / jnp.maximum(self.marg_integral, 1e-30)


def _batched_searchsorted(cdf_rows: jnp.ndarray, u: jnp.ndarray, w: int):
    """Per-row searchsorted: cdf_rows (..., W+1), u (...,)."""
    ge = cdf_rows <= u[..., None]
    return jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=-1) - 1, 0, w - 1)
