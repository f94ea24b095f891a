"""Sobol/maxmindist fidelity (lowdiscrepancy.cpp + sobolmatrices.cpp +
maxmin.h parity): dimension-for-dimension generator-matrix equality against
the reference tables, elementary-interval stratification property tests
(the sampling.cpp:139 check pattern), and max-min-distance quality."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpupt.core import lowdiscrepancy as ld

REF = "/root/reference/src/core"


@pytest.mark.skipif(not os.path.exists(f"{REF}/sobolmatrices.cpp"),
                    reason="reference snapshot unavailable")
def test_sobol_matrices_match_reference_dimension_for_dimension():
    from tpupt.tools.gen_sobol import _parse_array, MATRIX_SIZE

    text = open(f"{REF}/sobolmatrices.cpp").read()
    refm = _parse_array(text, "SobolMatrices32[").reshape(
        -1, MATRIX_SIZE)[:, :32].astype(np.uint32)
    ours = ld.sobol_matrices(64)
    np.testing.assert_array_equal(ours, refm[:64])
    # and the sampled VALUES match a direct reference-matrix multiply
    idx = jnp.asarray(np.arange(64, dtype=np.uint32) * 2654435761 % 4096)
    for d in (0, 1, 2, 5, 13, 63):
        got = np.asarray(ld.sobol_sample_bits(idx, d, jnp.asarray(ours)))
        want = np.zeros(len(idx), np.uint32)
        for j in range(32):
            bit = (np.asarray(idx) >> j) & 1
            want ^= (bit * refm[d, j]).astype(np.uint32)
        np.testing.assert_array_equal(got, want)


def _elementary_ok(pts, m):
    """Every elementary interval of area 2^-m holds exactly one of the
    2^m points — the (0,2)-sequence property (sampling.cpp:139 pattern)."""
    n = 1 << m
    assert len(pts) == n
    for k in range(m + 1):
        nx, ny = 1 << k, 1 << (m - k)
        ix = np.minimum((pts[:, 0] * nx).astype(int), nx - 1)
        iy = np.minimum((pts[:, 1] * ny).astype(int), ny - 1)
        cells = ix * ny + iy
        if len(np.unique(cells)) != n:
            return False
    return True


def test_sobol_first_two_dims_are_02_sequence():
    mats = jnp.asarray(ld.sobol_matrices(2))
    for m in (2, 4, 6):
        idx = jnp.arange(1 << m, dtype=jnp.uint32)
        x = np.asarray(ld.sobol_sample(idx, 0, mats))
        y = np.asarray(ld.sobol_sample(idx, 1, mats))
        assert _elementary_ok(np.stack([x, y], -1), m)


def test_maxmindist_pixel_samples():
    from tpupt.samplers.samplers import WavefrontSampler

    spp = 16
    s = WavefrontSampler("maxmindist", 8, 8, spp)
    if s.cpixel is None:
        pytest.skip("Joe-Kuo dataset not generated")
    px = jnp.zeros(1, jnp.int32)
    py = jnp.zeros(1, jnp.int32)
    pts = np.array([
        [float(v[0][0]), float(v[1][0])]
        for v in (s.camera_jitter(px, py, jnp.uint32(i)) for i in range(spp))
    ])
    # stratified in x: the i/spp comb
    assert len(np.unique(np.round(pts[:, 0] * spp))) == spp
    # (0,2)-sequence stratification in the pixel
    assert _elementary_ok(pts, 4)
    # max-min-distance quality: the published matrices beat plain Sobol
    def mmd(p):
        d = np.abs(p[:, None, :] - p[None, :, :])
        d = np.minimum(d, 1.0 - d)  # toroidal
        dist = np.sqrt((d ** 2).sum(-1))
        np.fill_diagonal(dist, np.inf)
        return dist.min()

    mats = jnp.asarray(ld.sobol_matrices(2))
    idx = jnp.arange(spp, dtype=jnp.uint32)
    sob = np.stack([np.asarray(ld.sobol_sample(idx, 0, mats)),
                    np.asarray(ld.sobol_sample(idx, 1, mats))], -1)
    assert mmd(pts) >= mmd(sob) - 1e-6
