"""Turbo message passing with a Markov-chain support prior.

Counterpart of the reference's turboGAMP framework
(``MPbased_solvers/turboGAMP/EMturboGAMP.m`` with a ``SupportStruct``
Markov chain): the sparse solver (VAMP-SLM here) exchanges extrinsic
activity log-likelihood ratios with a binary Markov-chain smoother running
along one axis of the coefficient matrix (beamspace supports are correlated
along the angle axis), BCJR-style forward–backward in the log domain.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jstsp19_tpu.solvers.estim import CAwgnPrior, SparsePrior
from jstsp19_tpu.solvers.vamp_slm import vamp_slm

_LLR_CAP = 30.0


def _channel_llr(base: CAwgnPrior, r1, rvar):
    """Per-element activity evidence log p(r|on) − log p(r|off)."""
    loglike1 = base.loglikey(r1, rvar)
    loglike0 = -(jnp.log(jnp.pi) + jnp.log(rvar) + jnp.abs(r1) ** 2 / rvar)
    return jnp.clip(loglike1 - loglike0, -_LLR_CAP, _LLR_CAP)


def _markov_extrinsic(llr_in: jnp.ndarray, p01, p10) -> jnp.ndarray:
    """Forward–backward along axis 0 of a binary Markov chain.

    llr_in: (n, ...) channel LLRs per chain element.  Returns the extrinsic
    prior LLR for each element (excluding its own observation), log domain,
    jit-safe scans.  Transitions: p01 = P(off→on), p10 = P(on→off).
    """
    log_T = jnp.log(
        jnp.asarray([[1 - p01, p01], [p10, 1 - p10]], jnp.float32) + 1e-30
    )  # [from, to]
    pi_on = p01 / (p01 + p10)
    log_prior0 = jnp.log(jnp.asarray([1 - pi_on, pi_on]) + 1e-30)

    # per-element observation log-potentials (…, 2)
    obs = jnp.stack([jnp.zeros_like(llr_in), llr_in], axis=-1)

    def fwd(alpha, o):
        # alpha: (..., 2) log messages INTO current node (before its obs)
        a_ext = alpha  # extrinsic forward message
        a_full = alpha + o
        nxt = jax.scipy.special.logsumexp(
            a_full[..., :, None] + log_T, axis=-2
        )
        nxt = nxt - jax.scipy.special.logsumexp(nxt, axis=-1, keepdims=True)
        return nxt, a_ext

    init = jnp.broadcast_to(log_prior0, obs.shape[1:])
    _, alphas = jax.lax.scan(fwd, init, obs)

    def bwd(beta, o):
        b_ext = beta
        b_full = beta + o
        prv = jax.scipy.special.logsumexp(
            b_full[..., None, :] + log_T, axis=-1
        )
        prv = prv - jax.scipy.special.logsumexp(prv, axis=-1, keepdims=True)
        return prv, b_ext

    zero = jnp.zeros(obs.shape[1:])
    _, betas_rev = jax.lax.scan(bwd, zero, obs[::-1])
    betas = betas_rev[::-1]

    ext = alphas + betas  # extrinsic node marginals (no own obs)
    return jnp.clip(ext[..., 1] - ext[..., 0], -_LLR_CAP, _LLR_CAP)


class TurboResult(NamedTuple):
    x: jnp.ndarray
    p1: jnp.ndarray  # final per-element activity prior


@functools.partial(jax.jit, static_argnames=("n_turbo", "nit"))
def turbo_markov_vamp(
    y,
    op,
    slab_var,
    gamw,
    p01: float = 0.05,
    p10: float = 0.3,
    n_turbo: int = 5,
    nit: int = 30,
) -> TurboResult:
    """Structured-sparsity recovery: VAMP inner solver + Markov support
    smoother along axis 0 of the coefficient matrix."""
    pi_on = p01 / (p01 + p10)
    base = CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(slab_var, jnp.float32))
    p1 = jnp.full(op.in_shape, pi_on, jnp.float32)

    def turbo_round(carry, _):
        p1, best_x, best_p1, best_res = carry
        prior = SparsePrior(base, p1)
        res = vamp_slm(prior, y, op, gamw=gamw, nit=nit)
        rvar = 1.0 / res.gam1
        llr_obs = jnp.clip(
            _channel_llr(base, res.r1, jnp.broadcast_to(rvar, res.r1.shape)),
            -8.0, 8.0,
        )
        llr_ext = _markov_extrinsic(llr_obs, p01, p10)
        # damped, clamped prior refresh — per-element activity priors can
        # destabilize the scalar-variance VAMP, so updates stay conservative
        p1_new = 0.5 * jnp.clip(jax.nn.sigmoid(llr_ext), 5e-2, 1 - 5e-2) + 0.5 * p1
        # keep the best iterate by data residual (turbo rounds can degrade
        # on ill-posed instances; the residual is an observable criterion)
        resid = jnp.sum(jnp.abs(y - op.mv(res.x)) ** 2)
        better = resid < best_res
        best_x = jnp.where(better, res.x, best_x)
        best_p1 = jnp.where(better, p1, best_p1)
        best_res = jnp.where(better, resid, best_res)
        return (p1_new, best_x, best_p1, best_res), None

    init = (
        p1,
        jnp.zeros(op.in_shape, y.dtype),
        p1,
        jnp.asarray(jnp.inf, jnp.float32),
    )
    (p1, best_x, best_p1, _), _ = jax.lax.scan(
        turbo_round, init, None, length=n_turbo
    )
    return TurboResult(x=best_x, p1=best_p1)
