"""Pallas kernel: fused dictionary correlation ``Aᴴ·K·Bᴴ``.

This is the hot "K2ᵀ matvec" of the proposed ADMM (SURVEY.md §3.2): the
reference materializes ``kron(B.', A)`` and does a 4480×512 dense matvec per
iteration (``proposed_algorithm.m:43-54``); the implicit form is two chained
small matmuls.  The Pallas kernel fuses both contractions over the
Monte-Carlo batch grid so the (Gr, M) intermediate never leaves VMEM, and
handles the complex arithmetic as explicit real/imag pairs (Pallas has no
complex dtype on TPU).

For the canonical shapes (32×140 × dictionaries ≤ 32²) a single batch
element underfills the MXU; throughput comes from the batch grid dimension
pipelining HBM↔VMEM copies against compute.  ``dict_correlation`` falls
back to the XLA einsum path on non-TPU backends (interpret mode is used in
tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on all platforms; kernels only run on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _kernel(ar_ref, ai_ref, kr_ref, ki_ref, br_ref, bi_ref, or_ref, oi_ref):
    ar, ai = ar_ref[:], ai_ref[:]
    kr, ki = kr_ref[0], ki_ref[0]
    br, bi = br_ref[:], bi_ref[:]

    # M1 = Aᴴ·K   (Gr, M):  (Arᵀ−i·Aiᵀ)(Kr+i·Ki)
    m1r = jnp.dot(ar.T, kr, preferred_element_type=jnp.float32) + jnp.dot(
        ai.T, ki, preferred_element_type=jnp.float32
    )
    m1i = jnp.dot(ar.T, ki, preferred_element_type=jnp.float32) - jnp.dot(
        ai.T, kr, preferred_element_type=jnp.float32
    )
    # out = M1·Bᴴ  (Gr, Kd): (m1r+i·m1i)(Brᵀ−i·Biᵀ)
    or_ref[0] = jnp.dot(m1r, br.T, preferred_element_type=jnp.float32) + jnp.dot(
        m1i, bi.T, preferred_element_type=jnp.float32
    )
    oi_ref[0] = jnp.dot(m1i, br.T, preferred_element_type=jnp.float32) - jnp.dot(
        m1r, bi.T, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def dict_correlation(
    A: jnp.ndarray, K: jnp.ndarray, B: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Batched fused ``Aᴴ·K_b·Bᴴ``.

    A: (N, Gr) complex, K: (batch, N, M) complex, B: (Kd, M) complex →
    (batch, Gr, Kd) complex.
    """
    batch, N, M = K.shape
    Gr = A.shape[1]
    Kd = B.shape[0]

    in_specs = [
        pl.BlockSpec((N, Gr), lambda b: (0, 0)),
        pl.BlockSpec((N, Gr), lambda b: (0, 0)),
        pl.BlockSpec((1, N, M), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, N, M), lambda b: (b, 0, 0)),
        pl.BlockSpec((Kd, M), lambda b: (0, 0)),
        pl.BlockSpec((Kd, M), lambda b: (0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, Gr, Kd), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Gr, Kd), lambda b: (b, 0, 0)),
    ]
    outr, outi = pl.pallas_call(
        _kernel,
        grid=(batch,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((batch, Gr, Kd), jnp.float32),
            jax.ShapeDtypeStruct((batch, Gr, Kd), jnp.float32),
        ],
        interpret=interpret,
    )(
        A.real.astype(jnp.float32),
        A.imag.astype(jnp.float32),
        K.real.astype(jnp.float32),
        K.imag.astype(jnp.float32),
        B.real.astype(jnp.float32),
        B.imag.astype(jnp.float32),
    )
    return (outr + 1j * outi).astype(jnp.complex64)


def dict_correlation_xla(A, K, B):
    """XLA reference path for the same contraction."""
    return jnp.einsum("ng,bnm,km->bgk", A.conj(), K, B.conj())
