import jax
import jax.numpy as jnp
import numpy as np

from jstsp19_tpu.core import prng
from jstsp19_tpu.ops import KronDictOp
from jstsp19_tpu.solvers.em import em_bg_vamp


def test_em_bg_vamp_learns_noise_and_sparsity():
    key = jax.random.key(0)
    N_, Gr, K, M_ = 24, 16, 8, 30
    A = prng.complex_normal(jax.random.fold_in(key, 0), (N_, Gr)) / np.sqrt(N_)
    B = prng.complex_normal(jax.random.fold_in(key, 1), (K, M_)) / np.sqrt(K)
    op = KronDictOp(A, B)
    beta = 0.1
    act = jax.random.uniform(jax.random.fold_in(key, 2), (Gr, K)) < beta
    X = jnp.where(
        act,
        prng.complex_normal(jax.random.fold_in(key, 3), (Gr, K), var=1 / beta),
        0.0,
    )
    nv_true = 0.005
    Y = op.mv(X) + prng.complex_normal(
        jax.random.fold_in(key, 4), (N_, M_), var=nv_true
    )
    res = em_bg_vamp(Y, op, n_em=10, nit=40)
    nmse = float(jnp.sum(jnp.abs(res.x - X) ** 2) / jnp.sum(jnp.abs(X) ** 2))
    assert nmse < 1e-2, nmse
    # hyperparameters learned within a factor ~2
    assert 0.3 * nv_true < float(res.noise_var) < 3 * nv_true
    assert 0.03 < float(res.prior.p1) < 0.3
