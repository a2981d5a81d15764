"""Pallas kernels: interpret-mode correctness vs the XLA reference paths."""
import jax
import jax.numpy as jnp
import numpy as np

from jstsp19_tpu.kernels import dict_correlation, fused_soft_threshold, pallas_fwht
from jstsp19_tpu.kernels.dictionary import dict_correlation_xla
from jstsp19_tpu.ops.fourier import fwht
from jstsp19_tpu.solvers.sparse import soft_threshold


def crandn(key, shape):
    k1, k2 = jax.random.split(key)
    return (
        (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape)) / np.sqrt(2)
    ).astype(jnp.complex64)


def test_dict_correlation_matches_xla(key):
    A = crandn(key, (32, 32))
    K = crandn(jax.random.fold_in(key, 1), (4, 32, 140))
    B = crandn(jax.random.fold_in(key, 2), (16, 140))
    out = dict_correlation(A, K, B, interpret=True)
    ref = dict_correlation_xla(A, K, B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_soft_threshold_matches(key):
    v = crandn(key, (8, 33)) * 3.0
    out = fused_soft_threshold(v, 0.7, interpret=True)
    ref = soft_threshold(v, 0.7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_fwht_matches(key):
    x = jax.random.normal(key, (5, 64))
    out = pallas_fwht(x, interpret=True)
    ref = fwht(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    out_n = pallas_fwht(x, ordering="natural", interpret=True)
    ref_n = fwht(x, ordering="natural")
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(ref_n), atol=1e-4)
