"""Pallas kernel: fused complex soft-threshold.

The per-iteration shrinkage ``max(|Re|−τ,0)·sign(Re) + j·…``
(``proposed_algorithm.m:56``) fused into a single VPU pass over the
real/imag planes — one HBM read and write per plane instead of the
several intermediates of the naive elementwise chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(vr_ref, vi_ref, tau_ref, or_ref, oi_ref):
    tau = tau_ref[0, 0]
    vr, vi = vr_ref[:], vi_ref[:]
    or_ref[:] = jnp.sign(vr) * jnp.maximum(jnp.abs(vr) - tau, 0.0)
    oi_ref[:] = jnp.sign(vi) * jnp.maximum(jnp.abs(vi) - tau, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_soft_threshold(v: jnp.ndarray, tau, interpret: bool = False) -> jnp.ndarray:
    """Complex soft-threshold of a (..., n, m) array with scalar tau."""
    shape = v.shape
    v2 = v.reshape(-1, shape[-1])
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1, 1)
    outr, outi = pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(v2.shape, lambda: (0, 0)),
            pl.BlockSpec(v2.shape, lambda: (0, 0)),
            pl.BlockSpec((1, 1), lambda: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(v2.shape, lambda: (0, 0)),
            pl.BlockSpec(v2.shape, lambda: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(v2.shape, jnp.float32),
            jax.ShapeDtypeStruct(v2.shape, jnp.float32),
        ],
        interpret=interpret,
    )(v2.real.astype(jnp.float32), v2.imag.astype(jnp.float32), tau_arr)
    return (outr + 1j * outi).astype(jnp.complex64).reshape(shape)
