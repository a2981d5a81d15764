"""Least-squares baseline estimator.

``S_ls = pinv(A)·Y·pinv(B)`` (``plot_errorVSsnr.m:83``) — the kron-pinv
factorization makes this the exact LS solution of ``Y ≈ A·S·B``.
"""
from __future__ import annotations

import jax.numpy as jnp


def ls_estimate(Y: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray, rcond=None):
    return jnp.linalg.pinv(A, rcond=rcond) @ Y @ jnp.linalg.pinv(B, rcond=rcond)
