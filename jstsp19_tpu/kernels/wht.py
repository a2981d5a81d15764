"""Pallas kernel: fast Walsh–Hadamard transform (natural order butterflies).

The TPU-kernel counterpart of the reference's ``fastWHtrans.cpp`` MEX
(sequency order handled by the same host-side permutation as
:mod:`jstsp19_tpu.ops.fourier`).  The butterfly network runs entirely in
VMEM: log2(n) stages of reshaped adds over the (rows, n) block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from jstsp19_tpu.ops.fourier import _sequency_perm


def _kernel(n: int, x_ref, o_ref):
    y = x_ref[:]
    rows = y.shape[0]
    h = 1
    while h < n:
        y = y.reshape(rows, n // (2 * h), 2, h)
        a = y[:, :, 0, :]
        b = y[:, :, 1, :]
        y = jnp.stack([a + b, a - b], axis=2).reshape(rows, n)
        h *= 2
    o_ref[:] = y * (1.0 / np.sqrt(n))


@functools.partial(jax.jit, static_argnames=("ordering", "interpret"))
def pallas_fwht(
    x: jnp.ndarray, ordering: str = "sequency", interpret: bool = False
) -> jnp.ndarray:
    """Orthonormal FWHT along the last axis via a Pallas butterfly kernel.

    x: (..., n) float32, n a power of two.
    """
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError("FWHT length must be a power of two")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, n),
        in_specs=[pl.BlockSpec(x2.shape, lambda: (0, 0))],
        out_specs=pl.BlockSpec(x2.shape, lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        interpret=interpret,
    )(x2)
    if ordering == "sequency":
        out = out[:, jnp.asarray(_sequency_perm(n))]
    elif ordering != "natural":
        raise ValueError(f"unknown ordering {ordering!r}")
    return out.reshape(*lead, n)
