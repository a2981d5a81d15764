"""Scalar prior / likelihood modules for message-passing solvers.

The TPU-native analog of the reference's EstimIn / EstimOut class trees
(``MPbased_solvers/main/EstimIn.m`` etc.): plain pytree dataclasses with an
``estim(rhat, rvar) -> (xhat, xvar)`` posterior-moment method, natively
complex (circular Gaussians) — no real 2×-embedding.

Implemented (★ = on the jstsp19 experiment path):
  ★ CAwgnPrior        — circular-Gaussian prior          (CAwgnEstimIn.m:93-101)
  ★ SparsePrior       — Bernoulli spike-slab wrapper     (SparseScaEstim.m:77-115)
  ★ CAwgnLikelihood   — AWGN output channel              (CAwgnEstimOut.m:100-112)
    AwgnPrior         — real Gaussian prior              (AwgnEstimIn.m)
    SoftThreshPrior   — Laplacian / soft-threshold MAP   (SoftThreshEstimIn.m)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_MAXARG = 500.0  # exparg clamp of SparseScaEstim.m:106-115


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class CAwgnPrior:
    """x ~ CN(mean0, var0).  Posterior from rhat = x + CN(0, rvar):
    ``gain = var0/(var0+rvar)`` (``CAwgnEstimIn.m:93-101``)."""

    mean0: jnp.ndarray = 0.0
    var0: jnp.ndarray = 1.0

    def estim(self, rhat, rvar):
        gain = self.var0 / (self.var0 + rvar)
        xhat = gain * (rhat - self.mean0) + self.mean0
        return xhat, gain * rvar

    def loglikey(self, rhat, rvar):
        """log p(rhat) with rhat = x + CN(0, rvar)
        (``CAwgnEstimIn.m:176-181``)."""
        v = self.var0 + rvar
        return -(jnp.log(jnp.pi) + jnp.log(v) + jnp.abs(rhat - self.mean0) ** 2 / v)

    def init_moments(self):
        return self.mean0, self.var0


_register(CAwgnPrior, ("mean0", "var0"))


@dataclasses.dataclass(frozen=True)
class AwgnPrior:
    """Real Gaussian prior x ~ N(mean0, var0)."""

    mean0: jnp.ndarray = 0.0
    var0: jnp.ndarray = 1.0

    def estim(self, rhat, rvar):
        gain = self.var0 / (self.var0 + rvar)
        return gain * (rhat - self.mean0) + self.mean0, gain * rvar

    def loglikey(self, rhat, rvar):
        v = self.var0 + rvar
        return -0.5 * (jnp.log(2 * jnp.pi) + jnp.log(v) + (rhat - self.mean0) ** 2 / v)

    def init_moments(self):
        return self.mean0, self.var0


_register(AwgnPrior, ("mean0", "var0"))


@dataclasses.dataclass(frozen=True)
class SparsePrior:
    """Bernoulli spike-slab: x = base w.p. p1, else 0.

    Posterior activity via log-domain likelihood ratio with ±500 clamp
    (``SparseScaEstim.m:77-115``); complex (circular) spike likelihood.
    """

    base: CAwgnPrior
    p1: jnp.ndarray = 0.5

    def estim(self, rhat, rvar):
        rvar = jnp.maximum(rvar, jnp.finfo(jnp.float32).eps)
        loglike1 = self.base.loglikey(rhat, rvar)
        if jnp.iscomplexobj(rhat):
            loglike0 = -(jnp.log(jnp.pi) + jnp.log(rvar) + jnp.abs(rhat) ** 2 / rvar)
        else:
            loglike0 = -0.5 * (
                jnp.log(2 * jnp.pi) + jnp.log(rvar) + rhat**2 / rvar
            )
        exparg = loglike0 - loglike1 + jnp.log1p(-self.p1) - jnp.log(self.p1)
        exparg = jnp.clip(exparg, -_MAXARG, _MAXARG)
        py1 = 1.0 / (1.0 + jnp.exp(exparg))
        xhat1, xvar1 = self.base.estim(rhat, rvar)
        xhat = py1 * xhat1
        xvar = py1 * (jnp.abs(xhat1) ** 2 + xvar1) - jnp.abs(xhat) ** 2
        return xhat, xvar

    def init_moments(self):
        m1, v1 = self.base.init_moments()
        xhat = self.p1 * m1
        xvar = self.p1 * (jnp.abs(m1) ** 2 + v1) - jnp.abs(xhat) ** 2
        return xhat, xvar


_register(SparsePrior, ("base", "p1"))


@dataclasses.dataclass(frozen=True)
class SoftThreshPrior:
    """Laplacian-MAP denoiser (soft threshold), the ``SoftThreshEstimIn``
    analog: ``xhat = sign(r)·max(|r|−λ·rvar, 0)`` with df-based variance."""

    lam: jnp.ndarray = 1.0

    def estim(self, rhat, rvar):
        thresh = self.lam * rvar
        mag = jnp.maximum(jnp.abs(rhat) - thresh, 0.0)
        xhat = jnp.where(
            jnp.abs(rhat) > 0, rhat / jnp.maximum(jnp.abs(rhat), 1e-30) * mag, 0.0
        )
        active = (mag > 0).astype(rvar.dtype if hasattr(rvar, "dtype") else jnp.float32)
        return xhat, rvar * active

    def init_moments(self):
        return jnp.zeros(()), 2.0 / self.lam**2


_register(SoftThreshPrior, ("lam",))


@dataclasses.dataclass(frozen=True)
class CAwgnLikelihood:
    """y = scale·z + CN(0, wvar).  Posterior of z from z ~ CN(phat, pvar):
    ``gain = pvar/(scale²·pvar + wvar)`` (``CAwgnEstimOut.m:100-112``)."""

    y: jnp.ndarray
    wvar: jnp.ndarray
    scale: jnp.ndarray = 1.0

    def estim(self, phat, pvar):
        gain = pvar / (self.scale**2 * pvar + self.wvar)
        zhat = (self.scale * gain) * (self.y - self.scale * phat) + phat
        return zhat, self.wvar * gain


_register(CAwgnLikelihood, ("y", "wvar", "scale"))
