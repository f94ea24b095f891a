"""Counter-based stateless RNG (counterpart of src/core/rng.h PCG32).

The reference carries a mutable PCG32 per sampler clone; on TPU every random
decision is instead a pure hash of (pixel id, sample id, dimension, seed), so
results are bit-identical regardless of batch/shard decomposition — the same
guarantee the reference gets from deterministic tile seeds (integrator.cpp:251).
"""

from __future__ import annotations

import jax.numpy as jnp

_ONE_MINUS_EPS = jnp.float32(1.0 - 1e-7)


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG output permutation over an LCG step — a high-quality 32-bit hash."""
    x = x.astype(jnp.uint32)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def hash_combine(a: jnp.ndarray, b) -> jnp.ndarray:
    a = a.astype(jnp.uint32)
    b = jnp.asarray(b).astype(jnp.uint32)
    return pcg_hash(a ^ (b + jnp.uint32(0x9E3779B9) + (a << jnp.uint32(6)) + (a >> jnp.uint32(2))))


def uniform_u32(*keys) -> jnp.ndarray:
    """Hash an arbitrary tuple of uint32 arrays/ints into uniform bits."""
    h = jnp.asarray(keys[0]).astype(jnp.uint32)
    h = pcg_hash(h)
    for k in keys[1:]:
        h = hash_combine(h, k)
    return h


def uniform_float(*keys) -> jnp.ndarray:
    """Uniform [0,1) float from hashed keys (rng.h UniformFloat semantics)."""
    bits = uniform_u32(*keys)
    return jnp.minimum(bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                       _ONE_MINUS_EPS)
