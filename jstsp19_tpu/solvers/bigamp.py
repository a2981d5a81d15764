"""Bilinear GAMP (BiG-AMP): joint estimation of both factors of Z = A·X.

TPU-native counterpart of the reference's BiGAMP family
(``MPbased_solvers/BiGAMP/BiGAMP.m`` and the EMBiGAMP_DL / _MC / _RPCA
drivers): dictionary learning, matrix completion and robust PCA all
instantiate the same bilinear message-passing core.  This implementation
follows the Parker–Schniter BiG-AMP recursion with uniform (scalar)
variances — the ``BiGAMP_Lite`` regime — which keeps every quantity a dense
matrix op under ``lax.scan``:

    Z (L×M) = A (L×R) · X (R×M),  observed through an elementwise
    likelihood (AWGN with optional mask → matrix completion).

Priors on A and X are estimator modules from
:mod:`jstsp19_tpu.solvers.estim`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BigAmpResult(NamedTuple):
    A: jnp.ndarray
    X: jnp.ndarray
    Z: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("nit", "rank"))
def bigamp(
    Y: jnp.ndarray,
    mask: jnp.ndarray,
    rank: int,
    prior_a,
    prior_x,
    noise_var,
    key,
    nit: int = 50,
    step: float = 0.7,
    var_floor: float = 1e-9,
    likelihood=None,
    init_A=None,
    init_X=None,
) -> BigAmpResult:
    """Run BiG-AMP on (masked) observations ``Y ≈ mask ∘ (A·X)``.

    Y: (L, M); mask: (L, M) in {0,1} (all-ones = full observation);
    ``key`` seeds the random factor initialization (the bilinear problem is
    invariant to A·X ↦ (A·G)(G⁻¹·X), so the output is the product Z plus
    one arbitrary factorization).  ``likelihood``: optional elementwise
    output estimator replacing the default AWGN (e.g.
    :class:`~jstsp19_tpu.solvers.estim.OutlierLikelihood` for robust PCA).
    """
    L, M = Y.shape
    R = rank
    cdt = Y.dtype
    rdt = jnp.float32

    kA, kX = jax.random.split(key)
    # random init scaled to the prior's second moment (or caller-provided
    # spectral init — e.g. a winsorized truncated SVD for RPCA); real
    # observations (e.g. hyperspectral unmixing) keep a real state
    ma, va = prior_a.init_moments()
    mx, vx = prior_x.init_moments()

    def _rand(k, shape, m0, v0):
        ex2 = jnp.abs(m0) ** 2 + v0
        if jnp.issubdtype(cdt, jnp.complexfloating):
            w = (
                jax.random.normal(k, shape)
                + 1j * jax.random.normal(jax.random.fold_in(k, 1), shape)
            ).astype(cdt) * jnp.sqrt(ex2 / 2)
        else:
            w = jax.random.normal(k, shape).astype(cdt) * jnp.sqrt(ex2)
        return jnp.asarray(m0, cdt) + w

    Ahat = init_A if init_A is not None else _rand(kA, (L, R), ma, va)
    Xhat = init_X if init_X is not None else _rand(kX, (R, M), mx, vx)
    Avar = jnp.asarray(va, rdt)
    Xvar = jnp.asarray(vx, rdt)
    Shat = jnp.zeros((L, M), cdt)

    nv = jnp.asarray(noise_var, rdt)
    m = mask.astype(rdt)

    def body(carry, _):
        Ahat, Avar, Xhat, Xvar, Shat = carry
        a2 = jnp.mean(jnp.abs(Ahat) ** 2)
        x2 = jnp.mean(jnp.abs(Xhat) ** 2)

        # --- output linear stage (scalar-variance BiG-AMP) --------------
        zvar_bar = R * (a2 * Xvar + Avar * x2)  # plug-in variance
        zvar = zvar_bar + R * Avar * Xvar
        Phat = Ahat @ Xhat - Shat * zvar_bar
        zvar = jnp.maximum(zvar, var_floor)

        # --- output nonlinear (masked; AWGN or custom likelihood) -------
        if likelihood is not None:
            Z0, zvar0 = likelihood.estim(Phat, zvar)
        else:
            gain = zvar / (zvar + nv)
            Z0 = Phat + gain * (Y - Phat)
            zvar0 = gain * nv
        # unobserved entries carry no information
        Z0 = m * Z0 + (1 - m) * Phat
        zvar0_eff = m * zvar0 + (1 - m) * zvar
        Shat_new = (Z0 - Phat) / zvar
        svar = jnp.maximum((1.0 - jnp.mean(zvar0_eff) / zvar) / zvar, var_floor)
        Shat_new = step * Shat_new + (1 - step) * Shat

        # --- input linear stages ----------------------------------------
        rvar_x = 1.0 / jnp.maximum(L * svar * a2, var_floor)
        Rx = Xhat * (1.0 - rvar_x * L * svar * Avar) + rvar_x * (
            Ahat.conj().T @ Shat_new
        )
        rvar_a = 1.0 / jnp.maximum(M * svar * x2, var_floor)
        Ra = Ahat * (1.0 - rvar_a * M * svar * Xvar) + rvar_a * (
            Shat_new @ Xhat.conj().T
        )

        # --- input nonlinear --------------------------------------------
        Xn, Xvar_n = prior_x.estim(Rx, rvar_x)
        An, Avar_n = prior_a.estim(Ra, rvar_a)
        Xn = step * Xn + (1 - step) * Xhat
        An = step * An + (1 - step) * Ahat
        return (
            An,
            jnp.maximum(jnp.mean(Avar_n), var_floor),
            Xn,
            jnp.maximum(jnp.mean(Xvar_n), var_floor),
            Shat_new,
        ), None

    (Ahat, Avar, Xhat, Xvar, Shat), _ = jax.lax.scan(
        body, (Ahat, Avar, Xhat, Xvar, Shat), None, length=nit
    )
    return BigAmpResult(A=Ahat, X=Xhat, Z=Ahat @ Xhat)


def bigamp_mc(Y, mask, rank, noise_var, key, nit=100, step=0.7):
    """Matrix completion via BiG-AMP (the ``EMBiGAMP_MC`` capability):
    Gaussian priors on both factors."""
    from jstsp19_tpu.solvers.estim import CAwgnPrior

    pa = CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(1.0))
    px = CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(1.0))
    return bigamp(Y, mask, rank, pa, px, noise_var, key, nit=nit, step=step)


def bigamp_rpca(Y, rank, noise_var, outlier_var, outlier_frac, key, nit=300, step=0.05):
    """Robust PCA via BiG-AMP (the ``EMBiGAMP_RPCA`` capability): low-rank
    plus sparse-outlier decomposition.  Returns the BigAmpResult; the
    outlier field is ``Y − Z`` thresholded by the caller."""
    from jstsp19_tpu.solvers.estim import CAwgnPrior, OutlierLikelihood

    pa = CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(1.0))
    px = CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(1.0))
    lik = OutlierLikelihood(
        Y,
        jnp.asarray(noise_var, jnp.float32),
        jnp.asarray(outlier_var, jnp.float32),
        jnp.asarray(outlier_frac, jnp.float32),
    )
    mask = jnp.ones(Y.shape, jnp.float32)
    # Spectral initialization robust to gross outliers: winsorize |Y| at
    # 3x its median, truncated SVD -> rank-R factors (random init lets the
    # bilinear recursion lock onto the outliers instead of the subspace).
    mag = jnp.abs(Y)
    med = jnp.median(mag)
    Yw = jnp.where(mag > 3 * med, Y / jnp.maximum(mag, 1e-30) * 3 * med, Y)
    U, sv, Vh = jnp.linalg.svd(Yw, full_matrices=False)
    init_A = (U[:, :rank] * jnp.sqrt(sv[:rank])).astype(Y.dtype)
    init_X = (jnp.sqrt(sv[:rank])[:, None] * Vh[:rank]).astype(Y.dtype)
    return bigamp(
        Y, mask, rank, pa, px, noise_var, key, nit=nit, step=step,
        likelihood=lik, init_A=init_A, init_X=init_X,
    )


class EmBigAmpResult(NamedTuple):
    A: jnp.ndarray
    X: jnp.ndarray
    Z: jnp.ndarray
    noise_var: jnp.ndarray
    rank: int  # selected rank
    bic: tuple  # per-candidate-rank BIC scores


def em_bigamp_mc(
    Y,
    mask,
    max_rank: int,
    key,
    nit: int = 100,
    n_em: int = 3,
    step: float = 0.7,
):
    """EM-wrapped BiG-AMP matrix completion with rank selection — the
    ``EMBiGAMP_MC`` capability (``BiGAMP/EMBiGAMP_MC.m``): for each
    candidate rank the noise variance is EM-refit from the masked
    residual, and the rank is selected by BIC (observed-data Gaussian
    log-likelihood + complex-parameter-count penalty), matching the
    reference's penalized-likelihood rank search.  The scalar-variance
    BiG-AMP core is only stable near the true rank, so the explicit rank
    sweep doubles as the stabilizer (running far over-parameterized
    diverges — the reference contracts rank for the same reason).

    Python-level loop over candidate ranks; each rank's solver is a
    cached jit executable (static shapes per rank).
    """
    from jstsp19_tpu.solvers.estim import CAwgnPrior

    m = np.asarray(mask, np.float32)
    n_obs = max(float(m.sum()), 1.0)
    y_energy = float(np.sum(np.abs(np.asarray(Y)) ** 2 * m)) / n_obs
    pa = CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(1.0))
    px = CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(1.0))
    L, M = Y.shape

    best = None
    bics = []
    for r in range(1, max_rank + 1):
        nv = y_energy / 101.0
        k = jax.random.fold_in(key, r)
        res = None
        for _ in range(n_em):
            res = bigamp(Y, mask, r, pa, px, nv, k, nit=nit, step=step)
            # float64 residual: diverged candidate ranks overflow float32
            resid = (
                np.asarray(Y, np.complex128) - np.asarray(res.Z, np.complex128)
            ) * m
            nv = max(float(np.sum(np.abs(resid) ** 2)) / n_obs, 1e-12)
            k = jax.random.fold_in(k, 1)
        # BIC: n·ln(σ̂²) + k_params·ln(n); complex factor entries = 2 reals
        k_params = 2 * r * (L + M)
        bic = n_obs * np.log(nv) + k_params * np.log(n_obs)
        bics.append(float(bic))
        if not np.isfinite(bic):
            continue
        if best is None or bic < best[0]:
            best = (bic, r, res, nv)
    if best is None:
        raise RuntimeError("all candidate ranks diverged")
    _, r, res, nv = best
    return EmBigAmpResult(
        A=res.A, X=res.X, Z=res.Z, noise_var=jnp.asarray(nv), rank=r,
        bic=tuple(bics),
    )
