"""Keyed randomness for keys, masks and noise (reference: src/utils.rs:36-109).

All sampling uses jax.random (threefry) under explicit PRNG keys — fully
deterministic and reproducible, unlike the reference's unseeded thread_rng.
Encrypt/keygen cores take randomness as explicit arrays, so golden tests can
inject identical mask+noise into the NumPy oracle and the JAX path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_u32(key, shape) -> jnp.ndarray:
    """Uniform torus elements (src/utils.rs:96-109)."""
    return jax.random.bits(key, shape, dtype=jnp.uint32)


def binary(key, shape) -> jnp.ndarray:
    """Uniform bits for binary secret keys (src/utils.rs:68-94)."""
    return (jax.random.bits(key, shape, dtype=jnp.uint32) & jnp.uint32(1)).astype(
        jnp.uint32
    )


def gaussian_torus(key, std_dev: float, shape) -> jnp.ndarray:
    """Centered gaussian noise mapped to the torus (src/utils.rs:36-54).

    round(z * sigma * 2^32) embedded two's-complement into u32.  (The reference
    additionally saturates negative samples to zero via Rust ``as u32`` — a
    quirk we do not reproduce; see golden model notes.)  sigma*2^32 is at most
    ~5.6e4 for the shipped parameter sets, so f32 rounding here is exact to
    <0.01 ulp of the integer scale.
    """
    z = jax.random.normal(key, shape, dtype=jnp.float32)
    e = jnp.round(z * jnp.float32(std_dev * (2.0**32)))
    return e.astype(jnp.int32).astype(jnp.uint32)
