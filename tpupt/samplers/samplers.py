"""Stateless wavefront samplers (counterpart of src/samplers/ + core/sampler.h).

The reference's samplers are stateful streams cloned per tile
(sampler.h:50-116); on TPU every sample dimension is a pure function
`(pixel_x, pixel_y, sample_index, dim) -> [0,1)` so any lane can evaluate any
dimension independently of batching/sharding:

  halton   — real pixel-to-index CRT enumeration + permutation-scrambled
             radical inverses per dim (samplers/halton.cpp)
  sobol    — generated generator matrices + per-pixel hash Owen scrambling
             (samplers/sobol.cpp analog; scrambling replaces the reference's
             pixel-digit index offsetting)
  02sequence / maxmindist — sobol dims (0,1) with per-pixel/dim scrambling
             (samplers/zerotwosequence.cpp, maxmin.cpp analog)
  stratified — jittered strata per (pixel, dim) (samplers/stratified.cpp)
  random   — pure hash (samplers/random.cpp)

`dim` must be a static Python int (it selects bases/matrices at trace time).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax.numpy as jnp
import numpy as np

from tpupt.core import lowdiscrepancy as ld
from tpupt.core import rng


class WavefrontSampler:
    """Factory: build once per render (host), then call inside jit."""

    def __init__(self, name: str, xres: int, yres: int, spp: int, seed: int = 0):
        self.name = name
        self.spp = spp
        self.seed = seed
        if name == "halton":
            self.indexer = ld.HaltonPixelIndexer(xres, yres)
            rng = np.random.default_rng(seed)
            # affine digit-permutation coefficients per dim (gather-free)
            self.perm_a = [int(rng.integers(1, p)) for p in ld.PRIMES]
            self.perm_c = [int(rng.integers(0, p)) for p in ld.PRIMES]
        elif name in ("sobol", "02sequence", "lowdiscrepancy", "maxmindist"):
            self.matrices = jnp.asarray(ld.sobol_matrices(64))
            self.cpixel = None
            if name == "maxmindist":
                # published max-min-distance (0,2)-sequence generator
                # matrices (CMaxMinDist, lowdiscrepancy.cpp:249; selected by
                # log2(spp), maxmin.h:54-77). Pixel dims (0,1) become
                # (i/spp, C x i); higher dims stay scrambled Sobol.
                jk = ld._joekuo_data()
                if jk is not None and "cmaxmindist" in jk:
                    spp2 = 1 << max(int(np.ceil(np.log2(max(spp, 1)))), 0)
                    cidx = min(int(np.log2(spp2)), jk["cmaxmindist"].shape[0] - 1)
                    self.spp_pow2 = 1 << cidx
                    self.cpixel = jnp.asarray(
                        jk["cmaxmindist"][cidx][None, :])
        elif name == "stratified":
            pass
        elif name == "random":
            pass
        else:
            raise ValueError(f"unknown sampler {name!r}")

    # All methods take px, py (N,) i32 arrays; s = sample index (N,) or scalar.

    def camera_jitter(self, px, py, s):
        """The first two dimensions: sub-pixel offsets in [0,1)^2."""
        if self.name == "halton":
            idx = self._halton_index(px, py, s)
            return self.indexer.sample_dim01(idx)
        if self.name == "maxmindist" and self.cpixel is not None:
            # (i/spp, CPixel x i) with a per-pixel XOR shuffle of the sample
            # order (maxmin.cpp:44-46's Shuffle, stateless analog: an XOR
            # mask permutes [0, 2^k) and keeps the point set intact)
            px_ = px.astype(jnp.uint32)
            py_ = py.astype(jnp.uint32)
            mask = rng.uniform_u32(px_, py_, jnp.uint32(self.seed),
                                   jnp.uint32(0x51ab)) \
                % jnp.uint32(self.spp_pow2)
            i = (jnp.asarray(s).astype(jnp.uint32)
                 % jnp.uint32(self.spp_pow2)) ^ mask
            u1 = i.astype(jnp.float32) / jnp.float32(self.spp_pow2)
            bits = ld.sobol_sample_bits(i, 0, self.cpixel)
            u2 = jnp.minimum(
                bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                jnp.float32(1.0 - 1e-7))
            u1 = jnp.broadcast_to(u1, px_.shape)
            u2 = jnp.broadcast_to(u2, px_.shape)
            return u1, u2
        u1 = self.dim(px, py, s, 0)
        u2 = self.dim(px, py, s, 1)
        return u1, u2

    def dim(self, px, py, s, d: int):
        """Sample dimension d (static int)."""
        px = px.astype(jnp.uint32)
        py = py.astype(jnp.uint32)
        s = jnp.asarray(s).astype(jnp.uint32)
        if self.name == "halton":
            d = min(d, ld.MAX_DIMS - 1)
            idx = self._halton_index(px, py, s)
            if d == 0 or d == 1:
                x, y = self.indexer.sample_dim01(idx)
                return x if d == 0 else y
            return ld.scrambled_radical_inverse_affine(
                d, idx, self.perm_a[d], self.perm_c[d])
        if self.name in ("sobol", "02sequence", "lowdiscrepancy", "maxmindist"):
            d = min(d, 63)
            pix_seed = rng.uniform_u32(px, py, jnp.uint32(self.seed), jnp.uint32(d))
            bits = ld.sobol_sample_bits(s, d, self.matrices)
            bits = ld.owen_scramble_u32(bits, pix_seed)
            return jnp.minimum(
                bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                jnp.float32(1.0 - 1e-7))
        if self.name == "stratified":
            # stratify each dim over spp strata with per-pixel shuffling
            perm_key = rng.uniform_u32(px, py, jnp.uint32(self.seed), jnp.uint32(d))
            stratum = (s + (perm_key % jnp.uint32(max(self.spp, 1)))) % jnp.uint32(max(self.spp, 1))
            jit = rng.uniform_float(px, py, s, jnp.uint32(d), jnp.uint32(self.seed))
            return (stratum.astype(jnp.float32) + jit) / max(self.spp, 1)
        # random
        return rng.uniform_float(px, py, s, jnp.uint32(d), jnp.uint32(self.seed))

    def _halton_index(self, px, py, s):
        off = self.indexer.offset_for_pixel(px, py)
        return off + s * jnp.uint32(self.indexer.stride)
