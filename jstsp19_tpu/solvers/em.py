"""EM hyperparameter learning around message-passing solvers.

Counterpart of the reference's ``EMGMAMP`` family
(``MPbased_solvers/EMGMAMP/EMGMAMP.m`` — AMP with an EM-learned
Gaussian-mixture prior and noise variance, Vila & Schniter): the inner
solver here is VAMP-SLM; each EM round re-fits

  - the Bernoulli–GM prior (activity, component weights/means/variances)
    from the component responsibilities at the final denoiser input, and
  - the noise variance from the residual energy,

then re-runs the solver.  All updates are closed-form moment matching.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jstsp19_tpu.solvers.estim import CAwgnPrior, CGMPrior, SparsePrior
from jstsp19_tpu.solvers.vamp_slm import vamp_slm


class EmGmResult(NamedTuple):
    x: jnp.ndarray
    prior: SparsePrior
    noise_var: jnp.ndarray


def _bernoulli_gauss_em_update(prior: SparsePrior, r1, rvar):
    """One EM round for the Bernoulli-Gaussian prior: refresh activity and
    slab variance from posterior activity probabilities (the
    ``SparseScaEstim`` autoTune rule, ``SparseScaEstim.m:120-139``)."""
    base = prior.base
    loglike1 = base.loglikey(r1, rvar)
    loglike0 = -(jnp.log(jnp.pi) + jnp.log(rvar) + jnp.abs(r1) ** 2 / rvar)
    exparg = jnp.clip(
        loglike0 - loglike1 + jnp.log1p(-prior.p1) - jnp.log(prior.p1), -500, 500
    )
    py1 = 1.0 / (1.0 + jnp.exp(exparg))
    p1_new = jnp.clip(jnp.mean(py1), 1e-4, 1.0 - 1e-4)
    xhat1, xvar1 = base.estim(r1, rvar)
    denom = jnp.maximum(jnp.sum(py1), 1e-12)
    var_new = jnp.maximum(
        jnp.sum(py1 * (jnp.abs(xhat1) ** 2 + xvar1)) / denom, 1e-8
    )
    return SparsePrior(CAwgnPrior(base.mean0, var_new), p1_new)


@functools.partial(jax.jit, static_argnames=("n_em", "nit"))
def em_bg_vamp(y, op, n_em: int = 8, nit: int = 30) -> EmGmResult:
    """EM-learned Bernoulli-Gaussian VAMP (the EM-BG-AMP capability).

    Initialization follows the EMGMAMP recipe: noise var from a 100:1
    input-SNR assumption, activity from the operator's sampling ratio.
    """
    M = 1
    for s in op.out_shape:
        M *= s
    N = 1
    for s in op.in_shape:
        N *= s
    y_energy = jnp.mean(jnp.abs(y) ** 2)
    noise_var = y_energy / 101.0
    rho0 = jnp.asarray(min(0.5, max(0.05, M / N / 2)), jnp.float32)
    prior = SparsePrior(
        CAwgnPrior(jnp.asarray(0.0 + 0j), y_energy * N / M / rho0), rho0
    )

    def em_round(carry, _):
        prior, noise_var = carry
        res = vamp_slm(prior, y, op, gamw=1.0 / noise_var, nit=nit)
        rvar = 1.0 / res.gam1
        prior_new = _bernoulli_gauss_em_update(prior, res.r1, rvar)
        xhat, xvar = prior_new.estim(res.r1, rvar)
        resid = y - op.mv(xhat)
        nv_new = jnp.maximum(jnp.mean(jnp.abs(resid) ** 2), 1e-10)
        return (prior_new, nv_new), None

    (prior, noise_var), _ = jax.lax.scan(
        em_round, (prior, noise_var), None, length=n_em
    )
    res = vamp_slm(prior, y, op, gamw=1.0 / noise_var, nit=nit)
    return EmGmResult(x=res.x, prior=prior, noise_var=noise_var)
