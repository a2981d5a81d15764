"""Structured linear operators beyond the dense/Fourier families.

TPU-native analogs of the remaining ``LinTrans`` subclasses in the
reference toolbox (``MPbased_solvers/main/``):

  IdentityOp    — ``IdentityLinTrans.m``
  SubsetOp      — ``LinTransSubset.m`` (static row subsampling of a base op)
  CenterOp      — the mean-removal projector behind ``LinTransDemean.m`` /
                  ``LinTransDemeanRC.m`` (compose with any base op)
  TVOp          — ``LinTransTV.m`` (1-D first differences)
  HaarOp        — ``LinTransWavelet.m`` capability: orthonormal multi-level
                  Haar transform via lifting (no materialized matrix)
  random_unitary_op  — ``RandomUniTrans.m`` (Haar-random unitary)
  expander_graph_op  — ``ExpanderGraphLinTrans.m`` (sparse binary matrix)
  rbf_kernel_op      — ``KernelLinTrans.m`` (RBF Gram operator)

All follow the :class:`~jstsp19_tpu.ops.base.LinOp` adjoint-pair protocol
with exact ``sq_mv``/``sq_rmv`` variance maps (|A|² acting on nonnegative
inputs), so each drops into the GAMP/VAMP solvers directly.  Static
structure (sizes, index sets, level counts) lives in pytree meta fields so
every operator traces once under ``jit``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import LinOp, MatrixOp, _register


@dataclasses.dataclass(frozen=True)
class IdentityOp(LinOp):
    """Identity on length-``n`` vectors (``IdentityLinTrans.m``)."""

    n: int

    @property
    def in_shape(self):
        return (self.n,)

    @property
    def out_shape(self):
        return (self.n,)

    def mv(self, x):
        return x

    def rmv(self, y):
        return y

    def sq_mv(self, x):
        return x

    def sq_rmv(self, y):
        return y


_register(IdentityOp, (), ("n",))


@dataclasses.dataclass(frozen=True)
class SubsetOp(LinOp):
    """Keep a static subset of the base operator's output rows
    (``LinTransSubset.m``): ``mv = (base·x)[idx]``; the adjoint scatters
    back into the kept rows and zero elsewhere.

    ``idx`` is a host-side numpy index tuple (static under jit) — the
    subset is part of the operator's structure, not traced data.
    """

    base: LinOp
    idx: Tuple[int, ...]

    @property
    def in_shape(self):
        return self.base.in_shape

    @property
    def out_shape(self):
        return (len(self.idx),)

    def _gather(self, y):
        return y[..., np.asarray(self.idx)]

    def _scatter(self, y):
        full = jnp.zeros(
            y.shape[:-1] + tuple(self.base.out_shape), dtype=y.dtype
        )
        return full.at[..., np.asarray(self.idx)].set(y)

    def mv(self, x):
        return self._gather(self.base.mv(x))

    def rmv(self, y):
        return self.base.rmv(self._scatter(y))

    def sq_mv(self, x):
        return self._gather(self.base.sq_mv(x))

    def sq_rmv(self, y):
        return self.base.sq_rmv(self._scatter(y))


_register(SubsetOp, ("base",), ("idx",))


@dataclasses.dataclass(frozen=True)
class CenterOp(LinOp):
    """Mean-removal projector ``P = I − 1·1ᵀ/n`` on length-``n`` vectors —
    the primitive behind ``LinTransDemean.m`` (compose as
    ``ComposedOp(CenterOp(m), base)`` to demean a base operator's output).

    Self-adjoint.  The exact variance map uses
    ``|P|²_{ij} = δ_ij·(1 − 2/n) + 1/n²``:
    ``sq_mv(x) = (1 − 2/n)·x + sum(x)/n²``.
    """

    n: int

    @property
    def in_shape(self):
        return (self.n,)

    @property
    def out_shape(self):
        return (self.n,)

    def mv(self, x):
        return x - jnp.mean(x, axis=-1, keepdims=True)

    def rmv(self, y):
        return self.mv(y)

    def _sq(self, x):
        return (1.0 - 2.0 / self.n) * x + jnp.sum(
            x, axis=-1, keepdims=True
        ) / self.n**2

    def sq_mv(self, x):
        return self._sq(x)

    def sq_rmv(self, y):
        return self._sq(y)


_register(CenterOp, (), ("n",))


@dataclasses.dataclass(frozen=True)
class TVOp(LinOp):
    """1-D total-variation (first-difference) operator
    ``(Dx)_i = x_{i+1} − x_i`` ∈ R^{n−1} (``LinTransTV.m``)."""

    n: int

    @property
    def in_shape(self):
        return (self.n,)

    @property
    def out_shape(self):
        return (self.n - 1,)

    def mv(self, x):
        return x[..., 1:] - x[..., :-1]

    def rmv(self, y):
        # Dᵀy: (Dᵀy)_0 = −y_0, (Dᵀy)_i = y_{i−1} − y_i, (Dᵀy)_{n−1} = y_{n−2}
        zero = jnp.zeros_like(y[..., :1])
        pad_lo = jnp.concatenate([zero, y], axis=-1)
        pad_hi = jnp.concatenate([y, zero], axis=-1)
        return pad_lo - pad_hi

    def sq_mv(self, x):
        return x[..., 1:] + x[..., :-1]

    def sq_rmv(self, y):
        zero = jnp.zeros_like(y[..., :1])
        return jnp.concatenate([zero, y], axis=-1) + jnp.concatenate(
            [y, zero], axis=-1
        )


_register(TVOp, (), ("n",))


@dataclasses.dataclass(frozen=True)
class HaarOp(LinOp):
    """Orthonormal multi-level Haar wavelet transform on length-``n``
    vectors, n a power of two (the ``LinTransWavelet.m`` capability).

    Implemented by lifting — per level, approximation/detail pairs
    ``a = (e + o)/√2``, ``d = (e − o)/√2`` — so no n×n matrix is ever
    materialized and every step is a reshape + add (XLA-fusable).  The
    transform is orthonormal, so the adjoint is the inverse.  The exact
    variance maps run the same pyramid with the squared coefficients
    (each lifting butterfly becomes ``(e + o)/2`` for both outputs).

    Output layout: ``[approx(level L) | details(level L) | … | details(1)]``.
    """

    n: int
    levels: int

    def __post_init__(self):
        if self.n & (self.n - 1):
            raise ValueError("HaarOp requires power-of-two length")
        if not 1 <= self.levels <= int(np.log2(self.n)):
            raise ValueError("invalid level count")

    @property
    def in_shape(self):
        return (self.n,)

    @property
    def out_shape(self):
        return (self.n,)

    def mv(self, x):
        inv_sqrt2 = 1.0 / np.sqrt(2.0)
        details = []
        a = x
        for _ in range(self.levels):
            e, o = a[..., 0::2], a[..., 1::2]
            details.append((e - o) * inv_sqrt2)
            a = (e + o) * inv_sqrt2
        return jnp.concatenate([a] + details[::-1], axis=-1)

    def rmv(self, y):
        inv_sqrt2 = 1.0 / np.sqrt(2.0)
        size = self.n >> self.levels
        a = y[..., :size]
        off = size
        for _ in range(self.levels):
            d = y[..., off : off + size]
            off += size
            e = (a + d) * inv_sqrt2
            o = (a - d) * inv_sqrt2
            a = jnp.stack([e, o], axis=-1).reshape(e.shape[:-1] + (2 * size,))
            size *= 2
        return a

    def sq_mv(self, x):
        details = []
        a = x
        for _ in range(self.levels):
            e, o = a[..., 0::2], a[..., 1::2]
            avg = (e + o) * 0.5
            details.append(avg)
            a = avg
        return jnp.concatenate([a] + details[::-1], axis=-1)

    def sq_rmv(self, y):
        size = self.n >> self.levels
        a = y[..., :size]
        off = size
        for _ in range(self.levels):
            d = y[..., off : off + size]
            off += size
            half = (a + d) * 0.5
            a = jnp.stack([half, half], axis=-1).reshape(
                half.shape[:-1] + (2 * size,)
            )
            size *= 2
        return a


_register(HaarOp, (), ("n", "levels"))


def random_unitary_op(key, n: int) -> MatrixOp:
    """Haar-random unitary as a dense operator (``RandomUniTrans.m``):
    QR of a complex Gaussian with the standard phase fix."""
    kr, ki = jax.random.split(key)
    G = jax.random.normal(kr, (n, n)) + 1j * jax.random.normal(ki, (n, n))
    Q, R = jnp.linalg.qr(G / np.sqrt(2.0))
    d = jnp.diagonal(R)
    return MatrixOp(Q * (d / jnp.abs(d)).conj())


def expander_graph_op(key, m: int, n: int, d: int) -> MatrixOp:
    """Sparse binary measurement matrix with ``d`` ones per column placed
    uniformly at random (``ExpanderGraphLinTrans.m``), scaled by 1/√d so
    columns have unit norm.  Dense storage — on TPU a small 0/1 matrix
    matmul beats gather/scatter sparsity."""
    cols = jax.vmap(
        lambda k: jax.random.permutation(k, m)[:d]
    )(jax.random.split(key, n))
    A = jnp.zeros((m, n)).at[cols.T, jnp.arange(n)[None, :]].set(1.0)
    return MatrixOp(A / np.sqrt(d))


def rbf_kernel_op(X: jnp.ndarray, gamma: float = 1.0) -> MatrixOp:
    """RBF kernel Gram operator ``K_ij = exp(−gamma·‖x_i − x_j‖²)`` over the
    rows of X (``KernelLinTrans.m``)."""
    sq = jnp.sum(jnp.abs(X) ** 2, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.real(X @ X.conj().T)
    return MatrixOp(jnp.exp(-gamma * jnp.maximum(d2, 0.0)))
