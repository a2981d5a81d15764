"""Discrete-distribution helpers (``main/DisDist.m``, ``main/Weibull.m``).

The reference's estimator test harness (``test/estimTest.m``) and the
neural-connectivity simulator (``neural/connectivity/neuralConnSim.m``)
build signals from a gridded discrete distribution; these are the
capability analogs (JAX-native sampling, no per-sample host loop).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DisDist:
    """Discrete distribution over support points ``x`` with probabilities
    ``px`` (normalized on construction) — ``main/DisDist.m``."""

    x: jnp.ndarray
    px: jnp.ndarray

    def __post_init__(self):
        px = jnp.asarray(self.px, jnp.float32)
        object.__setattr__(self, "px", px / jnp.sum(px))
        object.__setattr__(self, "x", jnp.asarray(self.x))

    def mean_var(self):
        """Distribution mean and variance (``DisDist.m:19-24``)."""
        m = jnp.sum(self.x * self.px)
        v = jnp.sum(jnp.abs(self.x - m) ** 2 * self.px)
        return m, v

    def sample(self, key, n: int) -> jnp.ndarray:
        """n iid draws by inverse-CDF (``DisDist.m:27-35`` — vectorized
        searchsorted instead of the reference's per-sample max loop)."""
        cdf = jnp.cumsum(self.px)
        u = jax.random.uniform(key, (n,))
        idx = jnp.searchsorted(cdf, u, side="right")
        return self.x[jnp.clip(idx, 0, self.x.shape[0] - 1)]


def weibull_grid(k: float, lam: float, xmax: float = 10.0, nx0: int = 1000):
    """Discretized Weibull(k, λ) pdf on a uniform grid — ``main/Weibull.m``
    (which evaluates ``wblpdf`` at the half-cell offsets and normalizes).
    Returns ``(x0, px0)`` ready for :class:`DisDist`."""
    x0 = np.linspace(0.0, xmax, nx0)
    xs = x0 + xmax / (2 * nx0)
    px0 = (k / lam) * (xs / lam) ** (k - 1) * np.exp(-((xs / lam) ** k))
    px0 = px0 / px0.sum()
    return jnp.asarray(x0, jnp.float32), jnp.asarray(px0, jnp.float32)
