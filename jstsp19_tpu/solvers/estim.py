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
class CGMPrior:
    """Circular Gaussian-mixture prior (the ``GMEstimIn``/EM-GM analog):
    x ~ Σ_k w_k · CN(mu_k, v_k).  Posterior moments from r = x + CN(0, rvar)
    via responsibility-weighted component posteriors."""

    weights: jnp.ndarray  # (K,)
    means: jnp.ndarray  # (K,) complex
    variances: jnp.ndarray  # (K,)

    def estim(self, rhat, rvar):
        r = rhat[..., None]
        v = self.variances + rvar[..., None]
        loglike = -(jnp.log(jnp.pi) + jnp.log(v) + jnp.abs(r - self.means) ** 2 / v)
        logw = jnp.log(self.weights) + loglike
        logw = logw - jax.scipy.special.logsumexp(logw, axis=-1, keepdims=True)
        resp = jnp.exp(logw)
        gain = self.variances / v
        post_mean = gain * (r - self.means) + self.means
        post_var = gain * rvar[..., None]
        xhat = jnp.sum(resp * post_mean, axis=-1)
        ex2 = jnp.sum(resp * (jnp.abs(post_mean) ** 2 + post_var), axis=-1)
        return xhat, jnp.maximum(ex2 - jnp.abs(xhat) ** 2, 0.0)

    def init_moments(self):
        m = jnp.sum(self.weights * self.means)
        v = jnp.sum(
            self.weights * (jnp.abs(self.means) ** 2 + self.variances)
        ) - jnp.abs(m) ** 2
        return m, v


_register(CGMPrior, ("weights", "means", "variances"))


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


@dataclasses.dataclass(frozen=True)
class ProbitLikelihood:
    """Binary observation y ∈ {0,1} of sign(z + noise) — the
    ``ProbitEstimOut`` analog for real z: posterior moments of
    z ~ N(phat, pvar) given y = 1{z + N(0, wvar) > 0}."""

    y: jnp.ndarray  # (…,) in {0, 1}
    wvar: jnp.ndarray = 1e-2

    def estim(self, phat, pvar):
        s = 2.0 * self.y - 1.0  # ±1
        denom = jnp.sqrt(pvar + self.wvar)
        alpha = s * phat / denom
        # N(alpha)/Phi(alpha) via the scaled complementary error function
        logpdf = -0.5 * alpha**2 - 0.5 * jnp.log(2 * jnp.pi)
        logcdf = jax.scipy.stats.norm.logcdf(alpha)
        ratio = jnp.exp(logpdf - logcdf)
        zhat = phat + s * pvar / denom * ratio
        zvar = pvar - pvar**2 / (pvar + self.wvar) * ratio * (alpha + ratio)
        return zhat, jnp.maximum(zvar, 1e-12)


_register(ProbitLikelihood, ("y", "wvar"))


@dataclasses.dataclass(frozen=True)
class PoissonLikelihood:
    """Count observation y ~ Poisson(scale·z), z ≥ 0 — the
    ``PoissonEstim`` analog, with a Gaussian-approximated posterior
    (quadratic expansion of the log-likelihood at the prior mean)."""

    y: jnp.ndarray
    scale: jnp.ndarray = 1.0

    def estim(self, phat, pvar):
        # Laplace approximation around a positive operating point.
        z0 = jnp.maximum(phat, 1e-6)
        # d/dz [y·log(sz) − s·z] = y/z − s ;  −d²/dz² = y/z²
        grad = self.y / z0 - self.scale
        curv = self.y / z0**2
        post_prec = 1.0 / pvar + curv
        zhat = z0 + (grad + (phat - z0) / pvar) / post_prec
        return jnp.maximum(zhat, 0.0), 1.0 / post_prec


_register(PoissonLikelihood, ("y", "scale"))


@dataclasses.dataclass(frozen=True)
class QuantizedLikelihood:
    """Interval observation from a uniform scalar quantizer: y known to lie
    in [lo, hi] per component (ties the ``optimum_uniform_quantizer``
    front end into estimation — the few-bit-ADC receiver model).  Real
    scalar moments of z ~ N(phat, pvar) truncated to [lo, hi]."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    def estim(self, phat, pvar):
        sig = jnp.sqrt(pvar)
        a = (self.lo - phat) / sig
        b = (self.hi - phat) / sig
        # moments of the truncated normal via stable log-cdf differences
        log_cdf_b = jax.scipy.stats.norm.logcdf(b)
        log_cdf_a = jax.scipy.stats.norm.logcdf(a)
        Z = jnp.maximum(jnp.exp(log_cdf_b) - jnp.exp(log_cdf_a), 1e-30)
        pdf_a = jax.scipy.stats.norm.pdf(a)
        pdf_b = jax.scipy.stats.norm.pdf(b)
        zhat = phat + sig * (pdf_a - pdf_b) / Z
        t = 1.0 + (a * pdf_a - b * pdf_b) / Z - ((pdf_a - pdf_b) / Z) ** 2
        return zhat, jnp.maximum(pvar * t, 1e-12)


_register(QuantizedLikelihood, ("lo", "hi"))


@dataclasses.dataclass(frozen=True)
class OutlierLikelihood:
    """Robust AWGN: y = z + noise where noise is a two-component mixture
    CN(0, wvar) w.p. (1−lam) and CN(0, wvar_out) w.p. lam — the
    sparse-outlier observation model behind robust PCA (the
    ``EMBiGAMP_RPCA`` capability).  Posterior moments of z ~ CN(phat, pvar)
    via responsibility-weighted component posteriors."""

    y: jnp.ndarray
    wvar: jnp.ndarray
    wvar_out: jnp.ndarray
    lam: jnp.ndarray = 0.05

    def estim(self, phat, pvar):
        def comp(wv):
            v = pvar + wv
            loglike = -(jnp.log(jnp.pi) + jnp.log(v) + jnp.abs(self.y - phat) ** 2 / v)
            gain = pvar / v
            zhat = phat + gain * (self.y - phat)
            zvar = wv * gain
            return loglike, zhat, zvar

        l0, z0, v0 = comp(self.wvar)
        l1, z1, v1 = comp(self.wvar_out)
        exparg = jnp.clip(
            l1 - l0 + jnp.log(self.lam) - jnp.log1p(-self.lam), -_MAXARG, _MAXARG
        )
        r1 = 1.0 / (1.0 + jnp.exp(-exparg))  # responsibility of the outlier comp
        zhat = (1 - r1) * z0 + r1 * z1
        ez2 = (1 - r1) * (jnp.abs(z0) ** 2 + v0) + r1 * (jnp.abs(z1) ** 2 + v1)
        return zhat, jnp.maximum(ez2 - jnp.abs(zhat) ** 2, 1e-12)


_register(OutlierLikelihood, ("y", "wvar", "wvar_out", "lam"))
