"""4-QAM (QPSK) modulation / demodulation (reference ``qam4mod.m``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from jstsp19_tpu.core.config import COMPLEX_DTYPE

_S = 1.0 / jnp.sqrt(2.0)
QAM4_ALPHABET = jnp.asarray(
    [_S + 1j * _S, -_S + 1j * _S, _S - 1j * _S, -_S - 1j * _S], COMPLEX_DTYPE
)


def qam4_mod(key: jax.Array, shape) -> jnp.ndarray:
    """Draw unit-energy 4-QAM symbols uniformly (``qam4mod.m:7-8``)."""
    idx = jax.random.randint(key, shape, 0, 4)
    return QAM4_ALPHABET[idx]


def qam4_demod(y: jnp.ndarray) -> jnp.ndarray:
    """Quadrant slicer to the nearest unit-energy 4-QAM symbol
    (``qam4mod.m:13-32``)."""
    re = jnp.where(jnp.real(y) >= 0, _S, -_S)
    im = jnp.where(jnp.imag(y) >= 0, _S, -_S)
    return (re + 1j * im).astype(COMPLEX_DTYPE)
