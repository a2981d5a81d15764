"""Generalized AMP and FISTA solvers.

TPU-native counterparts of the GAMPmatlab core loop
(``MPbased_solvers/main/gampEst.m`` — sum-product GAMP with Onsager
correction) and ``main/fistaEst.m`` (FISTA for l1).  The estimator modules
of :mod:`jstsp19_tpu.solvers.estim` play the EstimIn/EstimOut roles; any
:class:`jstsp19_tpu.ops.base.LinOp` (with its exact ``sq_mv``/``sq_rmv``
variance pair) plays the LinTrans role.  Scalar-variance mode (the
``GampOpt.uniformVariance`` analog) keeps the state one scalar per side —
the fully-batched TPU-friendly default.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jstsp19_tpu.solvers.sparse import soft_threshold


class GampResult(NamedTuple):
    x: jnp.ndarray
    xvar: jnp.ndarray
    rhat: jnp.ndarray
    rvar: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("nit",))
def gamp(
    prior,
    likelihood,
    op,
    nit: int = 50,
    step: float = 0.9,
    var_floor: float = 1e-12,
) -> GampResult:
    """Sum-product GAMP for ``y ~ p(y | op.mv(x))``.

    The core recursion of ``gampEst.m`` (forward variance → output posterior
    → Onsager-corrected residual → backward variance → input posterior) with
    constant step damping on (xhat, shat); adaptive-step Bethe acceptance is
    not replicated (fixed iterations compile better and the damped loop is
    stable on the workloads here).
    """
    x0, v0 = prior.init_moments()
    xhat = jnp.broadcast_to(jnp.asarray(x0, jnp.complex64), op.in_shape).astype(
        jnp.complex64
    )
    xvar = jnp.broadcast_to(jnp.asarray(v0, jnp.float32), op.in_shape).astype(
        jnp.float32
    )
    shat = jnp.zeros(op.out_shape, jnp.complex64)

    def body(carry, _):
        xhat, xvar, shat = carry
        # output linear stage
        zvar = jnp.maximum(op.sq_mv(xvar), var_floor)
        phat = op.mv(xhat) - zvar * shat
        # output nonlinear stage
        z0, zvar0 = likelihood.estim(phat, zvar)
        shat_new = (z0 - phat) / zvar
        svar = jnp.maximum((1.0 - zvar0 / zvar) / zvar, var_floor)
        shat_new = step * shat_new + (1 - step) * shat
        # input linear stage
        rvar = 1.0 / jnp.maximum(op.sq_rmv(svar), var_floor)
        rhat = xhat + rvar * op.rmv(shat_new)
        # input nonlinear stage
        xhat_new, xvar_new = prior.estim(rhat, rvar)
        xhat_new = step * xhat_new + (1 - step) * xhat
        xvar_new = jnp.maximum(xvar_new, var_floor)
        return (xhat_new, xvar_new, shat_new), None

    (xhat, xvar, shat), _ = jax.lax.scan(body, (xhat, xvar, shat), None, length=nit)
    zvar = jnp.maximum(op.sq_mv(xvar), var_floor)
    rvar = jnp.ones_like(xvar)
    return GampResult(x=xhat, xvar=xvar, rhat=xhat, rvar=rvar)


@functools.partial(jax.jit, static_argnames=("nit",))
def fista(y, op, lam, nit: int = 100, lipschitz=None):
    """FISTA for ``min ½‖y − op.mv(x)‖² + λ‖x‖₁`` (complex soft-threshold),
    the ``fistaEst.m`` capability.  ``lipschitz`` defaults to a power-iteration
    estimate of ‖AᴴA‖."""
    if lipschitz is None:
        v = jnp.ones(op.in_shape, jnp.complex64)

        def power(v, _):
            w = op.rmv(op.mv(v))
            return w / jnp.maximum(jnp.linalg.norm(w.reshape(-1)), 1e-20), None

        v, _ = jax.lax.scan(power, v, None, length=20)
        w = op.rmv(op.mv(v))
        lipschitz = jnp.real(jnp.vdot(v, w)) / jnp.maximum(
            jnp.real(jnp.vdot(v, v)), 1e-20
        )
    L = jnp.maximum(lipschitz, 1e-12)

    x = jnp.zeros(op.in_shape, jnp.complex64)
    z = x
    t = jnp.asarray(1.0, jnp.float32)

    def body(carry, _):
        x, z, t = carry
        grad = op.rmv(op.mv(z) - y)
        x_new = soft_threshold(z - grad / L, lam / L)
        t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t**2)) / 2.0
        z_new = x_new + (t - 1.0) / t_new * (x_new - x)
        return (x_new, z_new, t_new), None

    (x, z, t), _ = jax.lax.scan(body, (x, z, t), None, length=nit)
    return x


@functools.partial(jax.jit, static_argnames=("nit",))
def amp(y, op, prior, nit: int = 50):
    """Plain AMP with Onsager correction (the ``ampEst.m`` capability) for
    ``y = op.mv(x) + w`` with an i.i.d.-subgaussian operator of unit-norm
    columns; variance tracked by the scalar state of the standard AMP
    recursion."""
    M = 1
    for s in op.out_shape:
        M *= s
    N = 1
    for s in op.in_shape:
        N *= s
    delta = M / N
    x = jnp.zeros(op.in_shape, jnp.complex64)
    z = y

    def body(carry, _):
        x, z = carry
        tau2 = jnp.mean(jnp.abs(z) ** 2)
        r = x + op.rmv(z)
        x_new, xvar = prior.estim(r, tau2 / delta)
        onsager = jnp.mean(xvar) / (tau2 / delta) / delta
        z_new = y - op.mv(x_new) + z * onsager
        return (x_new, z_new), None

    (x, z), _ = jax.lax.scan(body, (x, z), None, length=nit)
    return x
