"""Low-discrepancy sequences as pure stateless index math (TPU-ideal).

Counterpart of src/core/lowdiscrepancy.{h,cpp} (+ sobolmatrices.cpp) and the
Halton sampler's pixel-to-index CRT math (samplers/halton.cpp:83-115). Every
function maps (sample index, dimension) -> [0,1) with no mutable state, so any
(pixel, sample) pair is reproducible on any shard — the property the reference
gets from per-tile sampler cloning (integrator.cpp:251) we get for free.

Sobol generator matrices are *generated* at import time from primitive
polynomials over GF(2) with deterministic pseudo-random direction numbers
(classic Sobol construction; cf. sobolmatrices.cpp's offline-generated tables).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# ------------------------------ primes ------------------------------------


def _first_primes(n: int):
    primes = []
    c = 2
    while len(primes) < n:
        if all(c % p for p in primes if p * p <= c):
            primes.append(c)
        c += 1
    return primes


MAX_DIMS = 256
PRIMES = _first_primes(MAX_DIMS)
_PRIME_ARR = np.asarray(PRIMES, np.int32)


# ------------------------- radical inverse --------------------------------


def _reverse_bits32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit reversal of uint32 (lowdiscrepancy.h ReverseBits32)."""
    x = x.astype(jnp.uint32)
    x = ((x << 16) | (x >> 16)) & jnp.uint32(0xFFFFFFFF)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x & jnp.uint32(0xFF00FF00)) >> 8)
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x & jnp.uint32(0xF0F0F0F0)) >> 4)
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x & jnp.uint32(0xCCCCCCCC)) >> 2)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x & jnp.uint32(0xAAAAAAAA)) >> 1)
    return x


def _digits_for_base(base: int) -> int:
    """Digits of a uint32 index in the given base (static per dim)."""
    n, d = 1, 0
    while n < 2**32:
        n *= base
        d += 1
    return d


def radical_inverse(dim: int, index: jnp.ndarray) -> jnp.ndarray:
    """Radical inverse of `index` in the dim-th prime base
    (lowdiscrepancy.h:50 RadicalInverse). `dim` is static; `index` is a
    uint32 array."""
    base = PRIMES[dim]
    index = index.astype(jnp.uint32)
    if base == 2:
        return _reverse_bits32(index).astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    inv_base = 1.0 / base
    rev = jnp.zeros_like(index)
    inv_base_n = jnp.ones(index.shape, jnp.float32)
    for _ in range(_digits_for_base(base)):
        active = index > 0
        nxt = index // base
        digit = index - nxt * base
        rev = jnp.where(active, rev * base + digit, rev)
        inv_base_n = jnp.where(active, inv_base_n * inv_base, inv_base_n)
        index = nxt
    return jnp.minimum(rev.astype(jnp.float32) * inv_base_n, 1.0 - 1e-7)


def scrambled_radical_inverse(dim: int, index: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Permutation-scrambled radical inverse (lowdiscrepancy.h:54); `perm` is
    an int32 array of length PRIMES[dim] including the trailing-zero digit
    contribution perm[0]/(b-1) * b^-D."""
    base = PRIMES[dim]
    index = index.astype(jnp.uint32)
    inv_base = 1.0 / base
    rev = jnp.zeros_like(index)
    inv_base_n = jnp.ones(index.shape, jnp.float32)
    for _ in range(_digits_for_base(base)):
        active = index > 0
        nxt = index // base
        digit = index - nxt * base
        rev = jnp.where(active, rev * base + perm[digit].astype(jnp.uint32), rev)
        inv_base_n = jnp.where(active, inv_base_n * inv_base, inv_base_n)
        index = nxt
    tail = inv_base_n * perm[0].astype(jnp.float32) / (base - 1.0)
    return jnp.minimum(rev.astype(jnp.float32) * inv_base_n + tail, 1.0 - 1e-7)


def scrambled_radical_inverse_affine(dim: int, index: jnp.ndarray,
                                     a: int, c: int) -> jnp.ndarray:
    """Scrambled radical inverse with an AFFINE digit permutation
    perm(d) = (a*d + c) mod b (valid for prime b with 1 <= a < b).
    Gather-free — the table-permutation variant costs one tiny-table gather
    per digit, which TPUs execute catastrophically slowly."""
    base = PRIMES[dim]
    a = int(a) % base or 1
    c = int(c) % base
    index = index.astype(jnp.uint32)
    inv_base = 1.0 / base
    rev = jnp.zeros_like(index)
    inv_base_n = jnp.ones(index.shape, jnp.float32)
    for _ in range(_digits_for_base(base)):
        active = index > 0
        nxt = index // base
        digit = index - nxt * base
        pdigit = (digit * a + c) % base
        rev = jnp.where(active, rev * base + pdigit, rev)
        inv_base_n = jnp.where(active, inv_base_n * inv_base, inv_base_n)
        index = nxt
    tail = inv_base_n * float(c) / (base - 1.0)
    return jnp.minimum(rev.astype(jnp.float32) * inv_base_n + tail, 1.0 - 1e-7)


def compute_radical_inverse_permutations(seed: int = 0) -> np.ndarray:
    """Per-dimension random digit permutations packed into one flat table
    (lowdiscrepancy.cpp ComputeRadicalInversePermutations). Returns
    (flat_perms[int32], offsets[int32])."""
    rng = np.random.default_rng(seed)
    total = sum(PRIMES)
    flat = np.empty(total, np.int32)
    offsets = np.empty(MAX_DIMS, np.int32)
    off = 0
    for i, p in enumerate(PRIMES):
        offsets[i] = off
        flat[off : off + p] = rng.permutation(p)
        off += p
    return flat, offsets


# ---------------------- inverse radical inverse / CRT ----------------------


def inverse_radical_inverse(base: int, n_digits: int, x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the base-b digits of x (lowdiscrepancy.h InverseRadicalInverse):
    maps a pixel coordinate to the index whose radical inverse lands on it."""
    x = x.astype(jnp.uint32)
    out = jnp.zeros_like(x)
    for _ in range(n_digits):
        nxt = x // base
        out = out * base + (x - nxt * base)
        x = nxt
    return out


def multiplicative_inverse(a: int, n: int) -> int:
    """a^-1 mod n via extended Euclid (halton.cpp:88 multiplicativeInverse)."""
    t, new_t, r, new_r = 0, 1, n, a % n
    while new_r != 0:
        q = r // new_r
        t, new_t = new_t, t - q * new_t
        r, new_r = new_r, r - q * new_r
    if r > 1:
        raise ValueError("not invertible")
    return t % n


# ------------------------------ Sobol -------------------------------------


def _find_primitive_polys(count: int):
    """Enumerate primitive polynomials over GF(2) in increasing degree.
    Returned as int bitmasks excluding the leading term (pbrt convention)."""

    def poly_mulmod(a: int, b: int, mod: int, deg: int) -> int:
        r = 0
        while b:
            if b & 1:
                r ^= a
            b >>= 1
            a <<= 1
            if a >> deg & 1:
                a ^= mod
        return r

    def is_primitive(poly_full: int, deg: int) -> bool:
        order = (1 << deg) - 1
        # irreducibility + primitivity: x^order == 1 and x^(order/p) != 1
        # for all prime factors p of order.
        def powmod(base: int, e: int) -> int:
            result, b = 1, base
            while e:
                if e & 1:
                    result = poly_mulmod(result, b, poly_full, deg)
                e >>= 1
                b = poly_mulmod(b, b, poly_full, deg)
            return result

        if powmod(2, order) != 1:  # 2 == polynomial 'x'
            return False
        n, fac = order, []
        d = 2
        while d * d <= n:
            if n % d == 0:
                fac.append(d)
                while n % d == 0:
                    n //= d
            d += 1
        if n > 1:
            fac.append(n)
        return all(powmod(2, order // p) != 1 for p in fac)

    polys = [(0, 0)]  # dim 0 handled specially (van der Corput)
    deg = 1
    while len(polys) < count:
        for low in range(1 << deg):
            full = (1 << deg) | low
            if not full & 1:  # constant term must be 1
                continue
            if deg >= 1 and is_primitive(full, deg):
                polys.append((deg, full))
                if len(polys) >= count:
                    break
        deg += 1
    return polys


@functools.lru_cache(maxsize=None)
def _joekuo_data():
    """Compact Joe & Kuo initialization dataset (new-joe-kuo-6, the public
    data sobolmatrices.cpp was generated from), checked in as
    core/sobol_joekuo.npz by tools/gen_sobol.py. None if absent."""
    import os

    path = os.path.join(os.path.dirname(__file__), "sobol_joekuo.npz")
    if not os.path.exists(path):
        return None
    return np.load(path)


@functools.lru_cache(maxsize=None)
def sobol_matrices(n_dims: int = 64, n_bits: int = 32) -> np.ndarray:
    """Sobol direction-number matrices, shape (n_dims, n_bits) uint32.
    Column j is v_j scaled so that bit 31 is the most significant output bit
    (matches sobolmatrices.cpp layout). Dim 0 = van der Corput.

    Generated from the published Joe-Kuo direction numbers (dimension-for-
    dimension identical to the reference's SobolMatrices32 for the first
    1024 dims — tools/gen_sobol.py verifies the round trip); dimensions
    beyond the dataset fall back to the self-generated construction."""
    jk = _joekuo_data()
    if jk is not None and n_bits == 32 and n_dims <= len(jk["s"]):
        from tpupt.tools.gen_sobol import _regen

        mats = np.zeros((n_dims, 32), np.uint32)
        mats[0] = np.uint32(1) << np.arange(31, -1, -1, dtype=np.uint32)
        s_arr, a_arr, m_off, m_flat = (jk["s"], jk["a"], jk["m_off"],
                                       jk["m"])
        for d in range(1, n_dims):
            s = int(s_arr[d])
            mats[d] = _regen(s, int(a_arr[d]),
                             m_flat[m_off[d]: m_off[d] + s])
        return mats
    rng = np.random.default_rng(1234)
    polys = _find_primitive_polys(n_dims)
    mats = np.zeros((n_dims, n_bits), np.uint64)
    for d in range(n_dims):
        deg, full = polys[d]
        if d == 0:
            for j in range(n_bits):
                mats[0, j] = np.uint64(1) << np.uint64(n_bits - 1 - j)
            continue
        # initial direction numbers m_j: odd, < 2^j (deterministic random —
        # same construction as Sobol'67; Joe-Kuo-optimized numbers can be
        # swapped in without changing this code).
        m = [1] + [int(rng.integers(0, 1 << j) * 2 + 1) % (1 << (j + 1)) for j in range(1, deg)]
        if deg == 0:
            m = [1]
        a = [(full >> (deg - 1 - k)) & 1 for k in range(deg)] if deg > 0 else []
        v = list(m)
        for j in range(deg, n_bits):
            new = v[j - deg] ^ (v[j - deg] << deg)
            for k in range(1, deg):
                if a[k]:
                    new ^= v[j - k] << k
            v.append(new)
        for j in range(n_bits):
            mats[d, j] = np.uint64(v[j]) << np.uint64(n_bits - 1 - j)
    return mats.astype(np.uint32)


def sobol_sample_bits(index: jnp.ndarray, dim: int, matrices: jnp.ndarray) -> jnp.ndarray:
    """XOR matrix columns selected by index bits (lowdiscrepancy.h:93
    MultiplyGenerator / SobolSampleFloat). Unrolled 32x — static per dim."""
    index = index.astype(jnp.uint32)
    v = jnp.zeros_like(index)
    for j in range(32):
        bit = (index >> jnp.uint32(j)) & jnp.uint32(1)
        v = v ^ (bit * matrices[dim, j])
    return v


def sobol_sample(index: jnp.ndarray, dim: int, matrices: jnp.ndarray) -> jnp.ndarray:
    return sobol_sample_bits(index, dim, matrices).astype(jnp.float32) * jnp.float32(
        2.3283064365386963e-10
    )


# -------------------- hash-based Owen scrambling ---------------------------


def laine_karras_permutation(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Hash-based Owen-style scramble of reversed bits (Laine-Karras 2011 /
    Burley 2020 construction — public constants)."""
    x = x.astype(jnp.uint32)
    seed = seed.astype(jnp.uint32)
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def owen_scramble_u32(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Owen-scramble a radical-inverse bit pattern (MSB-first uint32)."""
    x = _reverse_bits32(x)
    x = laine_karras_permutation(x, seed)
    return _reverse_bits32(x)


# --------------------------- Halton enumeration ----------------------------

K_MAX_RESOLUTION = 128


class HaltonPixelIndexer:
    """Pixel-to-global-sample-index CRT math of the reference Halton sampler
    (halton.cpp:83-115): the first two Halton dimensions enumerate pixels in
    a (2^j, 3^k) tile pattern; for a given pixel, samples are found at
    index = offset(pixel) + s * stride. All math is static or uint32."""

    def __init__(self, res_x: int, res_y: int):
        j, scale_x = 0, 1
        while scale_x < min(res_x, K_MAX_RESOLUTION):
            scale_x *= 2
            j += 1
        k, scale_y = 0, 1
        while scale_y < min(res_y, K_MAX_RESOLUTION):
            scale_y *= 3
            k += 1
        self.base_exp = (j, k)
        self.base_scale = (scale_x, scale_y)
        self.stride = scale_x * scale_y
        self.mult_inv = (
            multiplicative_inverse(scale_y, scale_x) if scale_x > 1 else 0,
            multiplicative_inverse(scale_x, scale_y) if scale_y > 1 else 0,
        )

    def offset_for_pixel(self, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
        """First global index whose first-two-dim radical inverses land in
        pixel (px, py) (halton.cpp GetIndexForSample)."""
        if self.stride == 1:
            return jnp.zeros_like(px).astype(jnp.uint32)
        pm_x = (px % K_MAX_RESOLUTION).astype(jnp.uint32)
        pm_y = (py % K_MAX_RESOLUTION).astype(jnp.uint32)
        d0 = inverse_radical_inverse(2, self.base_exp[0], pm_x)
        d1 = inverse_radical_inverse(3, self.base_exp[1], pm_y)
        off0 = d0 * jnp.uint32((self.stride // self.base_scale[0]) * self.mult_inv[0] % self.stride)
        off1 = d1 * jnp.uint32((self.stride // self.base_scale[1]) * self.mult_inv[1] % self.stride)
        return (off0 + off1) % jnp.uint32(self.stride)

    def sample_dim01(self, index: jnp.ndarray):
        """Dims 0/1 with the pixel-digit part removed (halton.cpp
        SampleDimension): returns offsets within the pixel in [0,1)."""
        x = radical_inverse(0, index >> jnp.uint32(self.base_exp[0]))
        x = x * self.base_scale[0]
        x = x - jnp.floor(x)
        y = radical_inverse(1, index // jnp.uint32(self.base_scale[1]))
        y = y * self.base_scale[1]
        y = y - jnp.floor(y)
        return x, y
