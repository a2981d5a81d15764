"""Round-4 long-tail utilities (VERDICT r3 Missing #3): TruthReporter,
DisDist/Weibull helpers, and the MedImageLinTrans analog."""
import io
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jstsp19_tpu.ops import MedImageOp
from jstsp19_tpu.utils import DisDist, weibull_grid


def test_disdist_moments_and_sampling():
    x, p = weibull_grid(2.0, 1.0)
    d = DisDist(x, p)
    m, v = d.mean_var()
    # Weibull(k=2, λ=1): mean Γ(1.5)=0.8862, var Γ(2)−Γ(1.5)² = 0.2146
    assert abs(float(m) - 0.8862) < 0.01
    assert abs(float(v) - 0.2146) < 0.01
    s = d.sample(jax.random.key(0), 20_000)
    assert abs(float(s.mean()) - float(m)) < 0.02
    assert abs(float(s.var()) - float(v)) < 0.02


def test_disdist_normalizes():
    d = DisDist(jnp.asarray([0.0, 1.0]), jnp.asarray([2.0, 2.0]))
    np.testing.assert_allclose(np.asarray(d.px), [0.5, 0.5])


def test_medimage_adjoint_and_unitary():
    rng = np.random.default_rng(0)
    ny = nx = 16
    idx = tuple(sorted(rng.choice(ny * nx, 100, False).tolist()))
    op = MedImageOp(ny, nx, 3, idx)
    x = jnp.asarray(
        rng.standard_normal(ny * nx) + 1j * rng.standard_normal(ny * nx),
        jnp.complex64,
    )
    y = jnp.asarray(
        rng.standard_normal(100) + 1j * rng.standard_normal(100),
        jnp.complex64,
    )
    assert abs(complex(jnp.vdot(y, op.mv(x)) - jnp.vdot(op.rmv(y), x))) < 1e-4
    # full-mask operator is unitary (Wᴴ unitary, F ortho)
    full = MedImageOp(ny, nx, 3, tuple(range(ny * nx)))
    assert abs(float(jnp.linalg.norm(full.mv(x)) / jnp.linalg.norm(x)) - 1) < 1e-5
    # analysis inverts synthesis
    c = x.reshape(ny, nx)
    np.testing.assert_allclose(
        np.asarray(op._analysis(op._synthesis(c))), np.asarray(c), atol=1e-5
    )


def test_medimage_cs_mri_recovery():
    """CS-MRI capability: recover a wavelet-sparse image from 40% k-space
    through GAMP with the MedImageOp — the ``MRI/`` application family's
    acquisition operator."""
    from jstsp19_tpu.solvers import CAwgnLikelihood, CAwgnPrior, SparsePrior
    from jstsp19_tpu.solvers.gamp_full import GampOptions, gamp_est
    from jstsp19_tpu.ops import MatrixOp  # noqa: F401  (import check)

    rng = np.random.default_rng(1)
    ny = nx = 32
    n = ny * nx
    k = 40
    c0 = np.zeros(n, complex)
    c0[rng.choice(n, k, False)] = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    c0 = jnp.asarray(c0, jnp.complex64)
    idx = tuple(sorted(rng.choice(n, int(0.4 * n), False).tolist()))
    op = MedImageOp(ny, nx, 3, idx)
    y = op.mv(c0) + 1e-3 * jnp.asarray(
        rng.standard_normal(len(idx)) + 1j * rng.standard_normal(len(idx)),
        jnp.complex64,
    )
    prior = SparsePrior(
        base=CAwgnPrior(mean0=jnp.asarray(0.0 + 0.0j), var0=jnp.asarray(1.0)),
        p1=k / n,
    )
    fin, _, _ = gamp_est(
        prior, CAwgnLikelihood(y=y, wvar=jnp.asarray(2e-6)), op,
        GampOptions(nit=60),
    )
    nmse = float(
        jnp.sum(jnp.abs(fin.xhat - c0) ** 2) / jnp.sum(jnp.abs(c0) ** 2)
    )
    assert nmse < 1e-2, nmse


def test_truth_reporter_passthrough():
    """The reporter must not alter the wrapped prior's messages."""
    from jstsp19_tpu.solvers import AwgnPrior, SparsePrior, TruthReporterPrior

    base = SparsePrior(base=AwgnPrior(mean0=0.0, var0=1.0), p1=0.1)
    truth = jnp.asarray(np.linspace(-1, 1, 32), jnp.float32)
    wrapped = TruthReporterPrior(base, truth)
    r = jnp.asarray(np.random.default_rng(0).standard_normal(32), jnp.float32)
    rv = jnp.full((32,), 0.3, jnp.float32)
    x0, v0 = base.estim(r, rv)
    x1, v1 = wrapped.estim(r, rv)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))
