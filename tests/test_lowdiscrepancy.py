"""Sampler correctness tests (pattern: src/tests/sampling.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpupt.core import lowdiscrepancy as ld


def brute_radical_inverse(base, a):
    v, f = 0.0, 1.0 / base
    while a:
        v += (a % base) * f
        a //= base
        f /= base
    return v


@pytest.mark.parametrize("dim", [0, 1, 2, 3, 7, 15])
def test_radical_inverse_vs_brute_force(dim):
    idx = jnp.arange(256, dtype=jnp.uint32)
    got = np.array(ld.radical_inverse(dim, idx))
    want = np.array([brute_radical_inverse(ld.PRIMES[dim], i) for i in range(256)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_scrambled_radical_inverse_identity_perm():
    # Identity permutation must reproduce the plain radical inverse
    # (plus zero tail since perm[0] == 0).
    for dim in (1, 2, 4):
        base = ld.PRIMES[dim]
        perm = jnp.arange(base, dtype=jnp.int32)
        idx = jnp.arange(128, dtype=jnp.uint32)
        got = np.array(ld.scrambled_radical_inverse(dim, idx, perm))
        want = np.array(ld.radical_inverse(dim, idx))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_scrambled_radical_inverse_is_permutation_of_strata():
    # A digit scramble keeps first-digit strata sizes equal.
    dim = 1  # base 3
    flat, offs = ld.compute_radical_inverse_permutations(seed=7)
    perm = jnp.asarray(flat[offs[dim] : offs[dim] + 3])
    idx = jnp.arange(81, dtype=jnp.uint32)
    v = np.array(ld.scrambled_radical_inverse(dim, idx, perm))
    h, _ = np.histogram(v, bins=3, range=(0, 1))
    assert (h == 27).all()


def test_sobol_dim0_is_van_der_corput():
    m = jnp.asarray(ld.sobol_matrices(8))
    idx = jnp.arange(512, dtype=jnp.uint32)
    np.testing.assert_allclose(
        np.array(ld.sobol_sample(idx, 0, m)),
        np.array(ld.radical_inverse(0, idx)),
        atol=1e-6,
    )


@pytest.mark.parametrize("dim", [1, 2, 3, 5])
def test_sobol_stratification(dim):
    # Any valid Sobol dimension is a (0,1)-sequence in base 2: every
    # consecutive block of 2^k samples hits each of the 2^k strata once.
    m = jnp.asarray(ld.sobol_matrices(8))
    for k in (2, 4):
        n = 2**k
        idx = jnp.arange(n, dtype=jnp.uint32)
        v = np.array(ld.sobol_sample(idx, dim, m))
        h, _ = np.histogram(v, bins=n, range=(0, 1))
        assert (h == 1).all(), (dim, k, h)


def test_sobol_02_sequence_2d_elementary_intervals():
    # Dims (0,1) should form a (0,2)-sequence: the first 16 points
    # stratify over all elementary intervals of area 1/16.
    m = jnp.asarray(ld.sobol_matrices(8))
    idx = jnp.arange(16, dtype=jnp.uint32)
    x = np.array(ld.sobol_sample(idx, 0, m))
    y = np.array(ld.sobol_sample(idx, 1, m))
    for (bx, by) in [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]:
        cells = set()
        for xi, yi in zip(x, y):
            cells.add((int(xi * bx), int(yi * by)))
        assert len(cells) == 16, (bx, by, sorted(cells))


def test_halton_pixel_indexer_lands_in_pixel():
    h = ld.HaltonPixelIndexer(700, 700)
    px = jnp.array([0, 5, 13, 127, 350], dtype=jnp.uint32)
    py = jnp.array([0, 7, 21, 127, 699], dtype=jnp.uint32)
    off = h.offset_for_pixel(px, py)
    for s in range(4):
        index = off + jnp.uint32(s * h.stride)
        fx = np.array(ld.radical_inverse(0, index)) * h.base_scale[0]
        fy = np.array(ld.radical_inverse(1, index)) * h.base_scale[1]
        assert (np.floor(fx).astype(int) == np.array(px % 128)).all()
        assert (np.floor(fy).astype(int) == np.array(py % 128)).all()


def test_halton_sample_dim01_in_unit_interval():
    h = ld.HaltonPixelIndexer(256, 256)
    off = h.offset_for_pixel(
        jnp.arange(16, dtype=jnp.uint32), jnp.arange(16, dtype=jnp.uint32)
    )
    x, y = h.sample_dim01(off)
    assert ((np.array(x) >= 0) & (np.array(x) < 1)).all()
    assert ((np.array(y) >= 0) & (np.array(y) < 1)).all()


def test_owen_scramble_preserves_stratification():
    m = jnp.asarray(ld.sobol_matrices(4))
    idx = jnp.arange(64, dtype=jnp.uint32)
    bits = ld.sobol_sample_bits(idx, 1, m)
    seed = jnp.uint32(0xDEADBEEF)
    scrambled = np.array(ld.owen_scramble_u32(bits, seed)).astype(np.float64) * 2**-32
    h, _ = np.histogram(scrambled, bins=64, range=(0, 1))
    assert (h == 1).all()
