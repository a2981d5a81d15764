"""Fused Pallas ADMM kernel (kernels/admm_fused.py) vs the XLA tracked
path — numerically the same algorithm, so agreement is to float tolerance
(interpret mode on the CPU test mesh)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jstsp19_tpu.core import prng
from jstsp19_tpu.harness.pipeline import (
    PointConfig,
    fused_point_errors,
    realization_errors,
)
from jstsp19_tpu.kernels.admm_fused import fused_tracked_admm
from jstsp19_tpu.solvers.admm import admm_hyperparams, proposed_admm

Bt, N, M, Gr, K = 2, 32, 140, 32, 16
IMAX = 25


def _problem(seed=0):
    rng = np.random.default_rng(seed)

    def c(*s):
        return (rng.standard_normal(s) + 1j * rng.standard_normal(s)).astype(
            np.complex64
        )

    Omega = jnp.asarray((rng.random((Bt, N, M)) < 0.5).astype(np.float32))
    subY = jnp.asarray(c(Bt, N, M)) * Omega
    A = jnp.asarray(c(Bt, N, Gr) / np.sqrt(N))
    B = jnp.asarray(c(Bt, K, M) / np.sqrt(K))
    hp = [admm_hyperparams(subY[b], c(Gr, K)) for b in range(Bt)]
    tau_Y, tau_S, rho = (jnp.stack([h[i] for h in hp]) for i in range(3))
    return subY, Omega, A, B, tau_Y, tau_S, rho


def test_fused_matches_tracked():
    subY, Omega, A, B, tau_Y, tau_S, rho = _problem()
    ref = jax.vmap(
        lambda sy, om, a, b, ty, ts, rh: proposed_admm(
            sy, om, a, b, IMAX, ty, ts, rh, svt_method="tracked"
        ).S
    )(subY, Omega, A, B, tau_Y, tau_S, rho)
    S, Y = fused_tracked_admm(
        subY, Omega, A, B, tau_Y, tau_S, rho, Imax=IMAX, interpret=True
    )
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(S - ref))) < 2e-4 * scale
    assert Y.shape == (Bt, N, M) and bool(jnp.all(jnp.isfinite(Y.real)))


def test_fused_matches_tracked_angles():
    subY, Omega, A, B, tau_Y, tau_S, rho = _problem(1)
    rng = np.random.default_rng(7)
    rank = jnp.asarray(
        np.stack(
            [rng.permutation(Gr * K).reshape(Gr, K) for _ in range(Bt)]
        ).astype(np.int32)
    )
    ref = jax.vmap(
        lambda sy, om, a, b, ty, ts, rh, rk: proposed_admm(
            sy, om, a, b, IMAX, ty, ts, rh, svt_method="tracked",
            support_rank=rk,
        ).S
    )(subY, Omega, A, B, tau_Y, tau_S, rho, rank)
    S, _ = fused_tracked_admm(
        subY, Omega, A, B, tau_Y, tau_S, rho, Imax=IMAX,
        support_rank=rank, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(S - ref))) < 2e-4 * scale


def test_fused_point_errors_end_to_end():
    """Full pipeline (channel→HBF→fused ADMM→NMSE) agrees with the
    per-realization XLA pipeline at svt_method='tracked'."""
    pc = PointConfig(
        methods=("proposed", "proposed_angles"), Imax=IMAX,
        svt_method="tracked",
    )
    keys = prng.realization_keys(prng.experiment_key(3), 0, 2)
    nv = jnp.asarray(1.0, jnp.float32)
    ref = jax.vmap(lambda k: realization_errors(k, pc, nv))(keys)
    out = fused_point_errors(keys, pc, nv, interpret=True)
    for m in ("proposed", "proposed_angles"):
        np.testing.assert_allclose(
            np.asarray(out[m]), np.asarray(ref[m]), rtol=2e-3, atol=2e-4
        )


def test_run_point_pallas_routing():
    """run_point(svt_method='pallas') routes proposed→fused and the rest
    through the XLA pipeline, returning every requested method."""
    from jstsp19_tpu.harness.runner import run_point

    pc = PointConfig(
        methods=("ls", "proposed"), Imax=IMAX, svt_method="pallas"
    )
    out = run_point(pc, 1.0, 2)
    assert set(out) == {"ls", "proposed"}
    pc_ref = dataclasses.replace(pc, svt_method="tracked")
    ref = run_point(pc_ref, 1.0, 2)
    np.testing.assert_allclose(
        out["proposed"], ref["proposed"], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(out["ls"], ref["ls"], rtol=1e-5)
