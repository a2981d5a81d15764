import jax
import jax.numpy as jnp
import numpy as np

from jstsp19_tpu.core import prng
from jstsp19_tpu.ops import KronDictOp
from jstsp19_tpu.solvers.estim import CAwgnPrior, SparsePrior
from jstsp19_tpu.solvers.turbo import turbo_markov_vamp, _markov_extrinsic
from jstsp19_tpu.solvers.vamp_slm import vamp_slm


def _block_sparse_problem(key, Gr=32, K=8, N=16, M=30, nv=5e-2):
    """Support forms contiguous runs along axis 0 (Markov-friendly)."""
    kA, kB, kx, kn = jax.random.split(key, 4)
    A = prng.complex_normal(kA, (N, Gr)) / np.sqrt(N)
    B = prng.complex_normal(kB, (K, M)) / np.sqrt(K)
    op = KronDictOp(A, B)
    # two active runs of length 5 per column
    sup = np.zeros((Gr, K), bool)
    rng = np.random.default_rng(0)
    for k in range(K):
        for _ in range(2):
            s = rng.integers(0, Gr - 5)
            sup[s : s + 5, k] = True
    beta_eff = sup.mean()
    X = jnp.where(
        jnp.asarray(sup), prng.complex_normal(kx, (Gr, K), var=1 / beta_eff), 0.0
    )
    Y = op.mv(X) + prng.complex_normal(kn, (N, M), var=nv)
    return op, X, Y, nv, beta_eff, sup


def test_markov_extrinsic_smooths_runs():
    # strong evidence in a run should raise extrinsic LLR of its neighbors
    llr = jnp.asarray([[-5.0], [8.0], [0.0], [8.0], [-5.0], [-5.0]])
    ext = _markov_extrinsic(llr, 0.05, 0.3)
    # middle element (no own evidence counted) gets positive support from
    # its strong neighbors
    assert float(ext[2, 0]) > 0.5
    # far-off element stays negative-ish
    assert float(ext[5, 0]) < float(ext[2, 0])


def test_turbo_beats_iid_prior_on_block_sparse(key):
    op, X, Y, nv, beta, sup = _block_sparse_problem(key)
    # iid spike-slab VAMP
    prior = SparsePrior(
        CAwgnPrior(jnp.asarray(0.0 + 0j), jnp.asarray(1 / beta, jnp.float32)),
        jnp.asarray(beta, jnp.float32),
    )
    res_iid = vamp_slm(prior, Y, op, gamw=1.0 / nv, nit=40)
    e_iid = float(jnp.sum(jnp.abs(res_iid.x - X) ** 2) / jnp.sum(jnp.abs(X) ** 2))
    # turbo with Markov support
    res_tb = turbo_markov_vamp(
        Y, op, slab_var=1 / beta, gamw=1.0 / nv, p01=0.09, p10=0.2,
        n_turbo=6, nit=40,
    )
    e_tb = float(jnp.sum(jnp.abs(res_tb.x - X) ** 2) / jnp.sum(jnp.abs(X) ** 2))
    assert np.isfinite(e_tb)
    # structured support should clearly beat the iid prior at this
    # measurement-starved operating point
    assert e_tb < e_iid, (e_iid, e_tb)
    # learned activity map correlates with the true support
    p1 = np.asarray(res_tb.p1)
    assert p1[np.asarray(sup)].mean() > p1[~np.asarray(sup)].mean()
