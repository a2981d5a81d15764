"""Optimum uniform scalar quantizer for complex samples.

Reference: ``basic_system_functions/optimum_uniform_quantizer.m`` — mid-rise
uniform quantization of I and Q independently, step size = RMS of the
component times the Max-optimal per-bit stepsize; returns the quantized
value and the upper/lower cell edges.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Max's optimal uniform quantizer step sizes for a unit-variance Gaussian,
# bits 1..8 (`optimum_uniform_quantizer.m:9-10`).  Kept numpy: import must
# not touch a device.
OPTIMUM_STEPSIZE = np.asarray(
    [1.5958, 0.9957, 0.586, 0.3352, 0.1881, 0.1041, 0.0569, 0.0308]
)
_FALLBACK_STEP = 0.01  # bits > 8 (`optimum_uniform_quantizer.m:4-5`)


def optimum_uniform_quantizer(
    x: jnp.ndarray, bits: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize complex samples; returns (quantized, upper_edge, lower_edge).

    Per component c ∈ {I, Q}: step D_c = rms(c)·Δ(bits); levels are the
    mid-rise cells ``sign(c)·(min(ceil(|c|/D), 2^{bits-1}) − 1/2)·D``
    (``optimum_uniform_quantizer.m:12-24``).
    """
    if not isinstance(bits, int) or bits < 1:
        raise ValueError("bits must be a positive integer")
    step = _FALLBACK_STEP if bits > 8 else float(OPTIMUM_STEPSIZE[bits - 1])
    half_levels = 2 ** (bits - 1)

    def _component(c):
        d = jnp.sqrt(jnp.mean(c**2)) * step
        mag = jnp.minimum(jnp.ceil(jnp.abs(c) / d), half_levels) - 0.5
        return jnp.sign(c) * mag * d, d

    qr, dr = _component(jnp.real(x))
    qi, di = _component(jnp.imag(x))
    q = qr + 1j * qi
    up = (qr + dr / 2) + 1j * (qi + di / 2)
    down = (qr - dr / 2) + 1j * (qi - di / 2)
    return q, up, down
