import jax
import jax.numpy as jnp
import numpy as np

from jstsp19_tpu.solvers import svt, mc_svt, mc_admm, soft_threshold, sparse_admm


def crandn(key, shape):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape)) / np.sqrt(2)


def svd_shrink_ref(Y, tau):
    U, s, Vh = np.linalg.svd(np.asarray(Y, dtype=np.complex128), full_matrices=False)
    return (U * np.maximum(s - tau, 0)) @ Vh


def test_svt_matches_svd_shrinkage_wide(key):
    Y = crandn(key, (6, 10))
    np.testing.assert_allclose(
        np.asarray(svt(Y, 0.5)), svd_shrink_ref(Y, 0.5), atol=1e-4
    )


def test_svt_matches_svd_shrinkage_tall(key):
    Y = crandn(key, (10, 6))
    np.testing.assert_allclose(
        np.asarray(svt(Y, 0.7)), svd_shrink_ref(Y, 0.7), atol=1e-4
    )


def test_svt_large_tau_gives_zero(key):
    Y = crandn(key, (5, 8))
    np.testing.assert_allclose(np.asarray(svt(Y, 100.0)), 0.0, atol=1e-5)


def test_svt_nan_guard():
    Y = jnp.full((4, 4), jnp.nan + 0j)
    out = np.asarray(svt(Y, 0.1))
    assert np.all(np.isfinite(out))


def test_svt_batched(key):
    Ys = crandn(key, (3, 6, 10))
    out = svt(Ys, 0.5)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out[i]), svd_shrink_ref(Ys[i], 0.5), atol=1e-4
        )


def _lowrank_completion_problem(key, n=16, m=24, rank=2, obs_frac=0.7):
    kL, kR, kM = jax.random.split(key, 3)
    Lf = crandn(kL, (n, rank))
    Rf = crandn(kR, (rank, m))
    X = Lf @ Rf
    Omega = (jax.random.uniform(kM, (n, m)) < obs_frac).astype(jnp.float32)
    return X, Omega


def test_mc_admm_recovers_lowrank(key):
    X, Omega = _lowrank_completion_problem(key)
    Xh, errs = mc_admm(X, Omega * X, Omega, Imax=200, tau=0.1, rho=1.0)
    nmse = np.sum(np.abs(np.asarray(Xh - X)) ** 2) / np.sum(np.abs(np.asarray(X)) ** 2)
    assert nmse < 0.05
    assert errs.shape == (200,)
    assert errs[-1] < errs[0]


def test_mc_svt_reduces_error(key):
    X, Omega = _lowrank_completion_problem(key, obs_frac=0.8)
    Xh = mc_svt(Omega * X, Omega, Imax=300, tau=2.0, rho=1.0)
    nmse = np.sum(np.abs(np.asarray(Xh - X)) ** 2) / np.sum(np.abs(np.asarray(X)) ** 2)
    assert nmse < 0.3


def test_soft_threshold():
    v = jnp.asarray([3.0 + 0.5j, -0.2 + 2.0j, 0.1 - 0.1j])
    out = np.asarray(soft_threshold(v, 0.5))
    np.testing.assert_allclose(out[0], 2.5 + 0.0j, atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0 + 1.5j, atol=1e-6)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-6)


def test_sparse_admm_recovers_sparse_beamspace(key):
    from jstsp19_tpu.channel import dft_dictionary

    Mr, Mt = 16, 8
    Dr = dft_dictionary(Mr, Mr) * np.sqrt(Mr)  # unitary scaling
    Dt = dft_dictionary(Mt, Mt) * np.sqrt(Mt)
    S_true = jnp.zeros((Mr, Mt), jnp.complex64).at[3, 2].set(2.0 + 1j).at[10, 5].set(-1.5 + 0.5j)
    H = Dr @ S_true @ Dt.conj().T
    S, errs = sparse_admm(H, H, Dr, Dt, Imax=100)
    nmse = np.sum(np.abs(np.asarray(S - S_true)) ** 2) / np.sum(
        np.abs(np.asarray(S_true)) ** 2
    )
    assert nmse < 0.05
    assert errs[-1] < 0.05
