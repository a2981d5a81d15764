"""PRNG-key plumbing.

One root key per experiment; folded deterministically into per-(sweep-point,
realization, role) streams so every Monte-Carlo realization is reproducible
and independent regardless of sharding layout (the reference relies on
MATLAB's global stream, which is neither).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Stable role tags for independent sub-streams inside one realization.
ROLE_CHANNEL = 0
ROLE_NOISE = 1
ROLE_TRAINING = 2
ROLE_MASK = 3
ROLE_BEAMFORMER = 4


def experiment_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def realization_keys(root: jax.Array, sweep_index: int, n_realizations: int):
    """A (n_realizations,)-vector of keys for one sweep point."""
    k = jax.random.fold_in(root, sweep_index)
    return jax.random.split(k, n_realizations)


def role_key(key: jax.Array, role: int) -> jax.Array:
    return jax.random.fold_in(key, role)


def complex_normal(key: jax.Array, shape, dtype=jnp.complex64, var=1.0):
    """Circularly-symmetric complex Gaussian CN(0, var).

    Matches the reference construction ``sqrt(v/2)*(randn + 1j*randn)``
    (e.g. ``plot_errorVSsnr.m:60``).
    """
    rk, ik = jax.random.split(key)
    rdt = jnp.finfo(dtype).dtype
    scale = jnp.sqrt(jnp.asarray(var, rdt) / 2)
    re = jax.random.normal(rk, shape, rdt)
    im = jax.random.normal(ik, shape, rdt)
    return (re + 1j * im).astype(dtype) * scale
