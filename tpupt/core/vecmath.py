"""L0 vector/geometry math over SoA arrays.

TPU-native counterpart of the reference's `src/core/geometry.h` (Vector3f /
Point3f / Normal3f / Bounds3f / Ray, geometry.h:1-1950): instead of scalar
structs we operate on arrays whose trailing axis is xyz, so every op below is
batched and fuses on the VPU. Rays are pytrees of such arrays (wavefront SoA).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-7
INF = jnp.inf
# Conservative ray-offset epsilon used when spawning secondary rays. The
# reference derives per-hit error bounds with EFloat (core/efloat.h:48) and
# offsets along the normal (interaction.h SpawnRay); under f32-on-TPU we use a
# scale-relative epsilon tuned against the golden scenes instead.
SHADOW_EPS = 1e-3


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def absdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(dot(a, b))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_sq(v: jnp.ndarray) -> jnp.ndarray:
    return dot(v, v)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_sq(v))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v * jax.lax.rsqrt(jnp.maximum(length_sq(v), 1e-30))[..., None]


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(x, 0)) that stays finite in REVERSE mode at x <= 0.

    `sqrt(maximum(x, 0.0))` has derivative 0.5/sqrt(0) = inf on clamped
    lanes, and a masked-out lane's zero cotangent times inf is NaN — the
    classic single-`where` leak. Double-`where` keeps the sqrt input
    strictly positive so its partial is finite (then multiplied by the
    correct zero cotangent). Primal value identical."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_div(a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.0):
    """a/b with the divide masked where |b| <= eps (0 there). Both the
    primal AND the reverse-mode partials are finite on masked lanes
    (double-`where`, see safe_sqrt)."""
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length(a - b)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def face_forward(n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Flip n so that it lies in the same hemisphere as v (geometry.h Faceforward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v1: jnp.ndarray):
    """Build an orthonormal basis around unit v1 (geometry.h CoordinateSystem).

    Branch-free (Duff et al. style) so it vectorizes on the VPU.
    """
    sign = jnp.where(v1[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v1[..., 2])
    b = v1[..., 0] * v1[..., 1] * a
    v2 = jnp.stack(
        [1.0 + sign * v1[..., 0] * v1[..., 0] * a, sign * b, -sign * v1[..., 0]],
        axis=-1,
    )
    v3 = jnp.stack([b, sign + v1[..., 1] * v1[..., 1] * a, -v1[..., 1]], axis=-1)
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


def reflect(wo: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi: jnp.ndarray, n: jnp.ndarray, eta):
    """Snell refraction (reflection.h Refract). Returns (valid, wt)."""
    cos_i = dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    valid = sin2_t < 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    wt = eta[..., None] * (-wi) + (eta * cos_i - cos_t)[..., None] * n
    return valid, wt


def offset_ray_origin(p: jnp.ndarray, n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Offset p along n to avoid self-intersection of spawned rays.

    Scale-relative stand-in for the reference's error-bound offsets
    (core/interaction.h OffsetRayOrigin / efloat.h).
    """
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(p), axis=-1))
    off = (SHADOW_EPS * scale)[..., None] * face_forward(n, d)
    return p + off


class Ray(NamedTuple):
    """Wavefront ray batch: o/d are (..., 3); tmax is (...,)."""

    o: jnp.ndarray
    d: jnp.ndarray
    tmax: jnp.ndarray

    def at(self, t):
        return self.o + t[..., None] * self.d


class Bounds3(NamedTuple):
    """Axis-aligned box batch (geometry.h Bounds3f); lo/hi are (..., 3)."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @staticmethod
    def empty(shape=()):
        return Bounds3(
            jnp.full(shape + (3,), jnp.inf), jnp.full(shape + (3,), -jnp.inf)
        )

    def union(self, other: "Bounds3") -> "Bounds3":
        return Bounds3(jnp.minimum(self.lo, other.lo), jnp.maximum(self.hi, other.hi))

    def union_point(self, p) -> "Bounds3":
        return Bounds3(jnp.minimum(self.lo, p), jnp.maximum(self.hi, p))

    def diagonal(self):
        return self.hi - self.lo

    def surface_area(self):
        d = self.diagonal()
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2])

    def centroid(self):
        return 0.5 * (self.lo + self.hi)

    def offset(self, p):
        d = self.diagonal()
        return (p - self.lo) / jnp.where(d > 0, d, 1.0)

    def intersect_p(self, o, inv_d, tmax):
        """Slab test (geometry.h Bounds3::IntersectP). Returns (hit, t0, t1)."""
        t_lo = (self.lo - o) * inv_d
        t_hi = (self.hi - o) * inv_d
        t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
        t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
        # Robustness factor as in the reference's gamma(3) scaling (bvh.cpp:227).
        t_far = t_far * (1.0 + 6.0 * 5.960464477539063e-08)
        hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < tmax)
        return hit, t_near, t_far


def ray_inv_d(d: jnp.ndarray) -> jnp.ndarray:
    """1/d with IEEE inf semantics preserved for slab tests."""
    return jnp.where(jnp.abs(d) < 1e-30, jnp.sign(d) * 1e30 + 1e30, 1.0 / d)
