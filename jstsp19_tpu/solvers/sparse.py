"""Sparse recovery: complex soft-thresholding and the l1-analysis ADMM.

Reference: ``benchmark_algorithms/sparse_admm.m`` (beamspace l1 ADMM with
fixed ρ=0.01, τ_s=1e-4).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def soft_threshold(v: jnp.ndarray, tau) -> jnp.ndarray:
    """Complex soft-threshold applied to real & imaginary parts separately:
    ``max(|Re|−τ,0)·sign(Re) + j·max(|Im|−τ,0)·sign(Im)``
    (``proposed_algorithm.m:56``, ``sparse_admm.m:22``)."""
    re = jnp.sign(v.real) * jnp.maximum(jnp.abs(v.real) - tau, 0.0)
    im = jnp.sign(v.imag) * jnp.maximum(jnp.abs(v.imag) - tau, 0.0)
    return re + 1j * im


def sparse_admm(
    Htrue: jnp.ndarray,
    OH: jnp.ndarray,
    Dr: jnp.ndarray,
    Dt: jnp.ndarray,
    Imax: int,
    rho: float = 0.01,
    tau_s: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beamspace-sparse ADMM recovery of S from a (masked) observation OH.

    The reference materializes ``A = kron(conj(Dt), Dr)`` and solves with a
    dense (Mr·Mt)² system per iteration (``sparse_admm.m:15-26``).  Here the
    kron stays implicit — ``A·vec(S) = vec(Dr·S·Dtᴴ)`` — and the linear
    solve ``(AᴴA − ρI)⁻¹`` is applied in the factorized eigenbasis of
    ``DrᴴDr`` ⊗ ``(DtᴴDt)*``:  eigenvalues ``outer(dr, dt) − ρ``.

    Returns (S, NMSE-per-iteration-vs-Htrue).
    """
    # A^H A acts as S ↦ (Dr^H Dr) S (Dt^H Dt)^T?  Derivation: with
    # A = kron(conj(Dt), Dr): A vec(S) = vec(Dr S Dt^H) (column-major vec).
    # A^H vec(Y) = vec(Dr^H Y Dt).  So A^H A vec(S) = vec(Dr^H Dr S Dt^H Dt).
    Gr_ = Dr.conj().T @ Dr
    Gt_ = Dt.conj().T @ Dt
    dr, Ur = jnp.linalg.eigh(Gr_)
    dt, Ut = jnp.linalg.eigh(Gt_)
    eig = dr[:, None] * dt[None, :] - rho  # eigenvalues of B = A^H A - rho I

    def solve_B(K):
        """B⁻¹K via the factorized eigenbasis."""
        Kt = Ur.conj().T @ K @ Ut
        return Ur @ (Kt / eig) @ Ut.conj().T

    AhOH = Dr.conj().T @ OH @ Dt  # A^H vec(OH), matrix form

    def body(carry, _):
        R, Z, _ = carry
        S = soft_threshold(R + Z / rho, tau_s / rho)
        Rnew = solve_B(Z - rho * S + AhOH)
        Znew = Z + rho * (Rnew - S)
        err = jnp.sum(jnp.abs(Dr @ S @ Dt.conj().T - Htrue) ** 2) / jnp.sum(
            jnp.abs(Htrue) ** 2
        )
        return (Rnew, Znew, S), err

    z = jnp.zeros((Dr.shape[1], Dt.shape[1]), OH.dtype)
    (_, _, S), errs = jax.lax.scan(body, (z, z, z), None, length=Imax)
    return S, errs
