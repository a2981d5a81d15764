"""The 14 reference experiment drivers as typed recipes.

Each entry reproduces one top-level ``plot_*.m`` script's configuration and
produces the same curve data (JSON instead of ``.fig``).  Monte-Carlo counts
default to the reference's where practical; pass ``n_mc`` to raise them
(several reference drivers ship with ``maxMCRealizations = 1`` — e.g.
``plot_errorVSsnr.m:18`` — which produces the noisy committed curves in
``results/errorVSsnr_angles.fig``).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jstsp19_tpu.channel import wideband_mmwave_channel
from jstsp19_tpu.core import prng
from jstsp19_tpu.core.metrics import (
    clamped_nmse,
    power_conventional_hbf,
    power_digital_bf,
    power_proposed,
    spectral_efficiency,
)
from jstsp19_tpu.frontend import (
    awgn,
    create_beamformer,
    hbf,
    proposed_hbf,
    qam4_training_frames,
    comm_system_training,
)
from jstsp19_tpu.harness.pipeline import PointConfig, _dictionaries
from jstsp19_tpu.harness.runner import SweepResult, run_sweep
from jstsp19_tpu.solvers import (
    admm_hyperparams,
    ls_estimate,
    proposed_admm,
    proposed_admm_angles,
)

EXPERIMENTS: Dict[str, Callable] = {}


def _register(name):
    def deco(fn):
        EXPERIMENTS[name] = fn
        fn.experiment_name = name
        return fn

    return deco


def get_experiment(name: str) -> Callable:
    return EXPERIMENTS[name]


def _nv(snr_db) -> float:
    return float(10 ** (-snr_db / 10))


# The fixed-SNR sweep drivers hard-code their noise variance as a literal
# constant, e.g. ``square_noise_variance = 10^(-5/10)`` (plot_errorVSpaths.m:24,
# plot_errorVSdelays.m:22, plot_errorVSnrf.m:23) or ``10^(-15/10)``
# (plot_errorVSframelength.m:21, plot_errorVSnt.m:22,
# plot_rateVSframelength.m:21).  Under the SNR convention of the canonical
# driver (``square_noise_variance = 10^(-SNR/10)``, plot_errorVSsnr.m:49) these
# literals sit at **+5 dB / +15 dB** — the scripts' own "−5 dB"/"−15 dB"
# labels are on the wrong side of the convention.  Parity follows the literal
# constants (they generated the committed artifacts): ``_nv(5)`` = 10^(-5/10),
# ``_nv(15)`` = 10^(-15/10).
_NV_PATHS_DELAYS_NRF = _nv(5)
_NV_FRAMELEN_NT_RATE = _nv(15)


# ---------------------------------------------------------------------------
# Standard NMSE sweeps (the plot_errorVS*.m family)
# ---------------------------------------------------------------------------

@_register("error_vs_snr")
def error_vs_snr(n_mc=8, seed=0, mesh=None, methods=None, **kw):
    """``plot_errorVSsnr.m``: canonical SNR sweep −15:3:15 dB."""
    methods = tuple(methods or ("ls", "vamp", "omp_mmv", "proposed", "proposed_angles"))
    base = PointConfig(methods=methods, **kw)
    return run_sweep(
        "error_vs_snr", "snr_db", list(range(-15, 16, 3)),
        point_fn=lambda s: base, noise_fn=_nv, n_mc=n_mc, seed=seed, mesh=mesh,
    )


@_register("error_vs_snr_quirks")
def error_vs_snr_quirks(n_mc=64, seed=0, mesh=None, methods=None, **kw):
    """``plot_errorVSsnr.m`` under the reference-quirks channel ensemble.

    Same driver as :func:`error_vs_snr` but with ``channel_quirks=True`` so
    the Monte-Carlo ensemble is the one the committed reference artifacts
    (``results/errorVSsnr_angles.fig``) were actually generated from —
    cosh angle sampler, tap-1 steering reuse, cluster double-count
    (``wideband_mmwave_channel.m:24-30,56-62``).  This is the NMSE parity
    mode; see PARITY.md.
    """
    methods = tuple(methods or ("ls", "vamp", "omp_mmv", "proposed", "proposed_angles"))
    base = PointConfig(methods=methods, channel_quirks=True, **kw)
    return run_sweep(
        "error_vs_snr_quirks", "snr_db", list(range(-15, 16, 3)),
        point_fn=lambda s: base, noise_fn=_nv, n_mc=n_mc, seed=seed, mesh=mesh,
    )


@_register("error_vs_framelength")
def error_vs_framelength(n_mc=8, seed=0, mesh=None, **kw):
    """``plot_errorVSframelength.m``: T ∈ {5,15,25,35}, Nt=8, FFT combiner,
    numOfnz=50, noise variance 10^(-15/10) (``plot_errorVSframelength.m:21``
    — +15 dB under the errorVSsnr convention, see ``_NV_FRAMELEN_NT_RATE``)."""
    return run_sweep(
        "error_vs_framelength", "T", [5, 15, 25, 35],
        point_fn=lambda T: PointConfig(
            Nt=8, Gt=8, T=T, num_nonzero=50, beamformer="fft",
            methods=("ls", "vamp", "omp_mmv", "proposed", "proposed_angles"), **kw,
        ),
        noise_fn=lambda T: _NV_FRAMELEN_NT_RATE, n_mc=n_mc, seed=seed, mesh=mesh,
    )


@_register("rate_vs_framelength")
def rate_vs_framelength(n_mc=8, seed=0, mesh=None, **kw):
    """``plot_rateVSframelength.m``: achievable rate (ASE, bits/s/Hz) vs
    T ∈ {5,10,15}; Nt=8, FFT combiner, numOfnz=50, noise variance
    10^(-15/10) (``plot_rateVSframelength.m:20-23``).

    Per realization the reference computes, for every active method,
    ``log2 real(det(I + (1/Nr)·Zbar·Zbarᴴ/(σ² + NMSE)))`` with the raw
    (unclamped) spectral NMSE (``plot_rateVSframelength.m:81,113,130,135``)
    — a deterministic function of each method's NMSE, the true beamspace
    channel and σ² (:func:`jstsp19_tpu.core.metrics.achievable_rate`).
    Runs unsharded (like the other specialized recipes); ``mesh`` is
    accepted for interface uniformity only.
    """
    from jstsp19_tpu.core.metrics import achievable_rate
    from jstsp19_tpu.harness.pipeline import realization_errors as _re

    methods = ("ls", "omp_mmv", "proposed", "proposed_angles")
    nv = _NV_FRAMELEN_NT_RATE
    t0 = time.time()
    curves: Dict[str, list] = {}
    T_values = [5, 10, 15]
    for i, T in enumerate(T_values):
        pc = PointConfig(
            Nt=8, Gt=8, T=T, num_nonzero=50, beamformer="fft",
            methods=methods, **kw,
        )

        def realization(key, noise_var, pc=pc):
            out = _re(key, pc, noise_var, clamp=False, with_zbar=True)
            Zbar = out.pop("Zbar")
            # the reference normalizes by eye(Nr) (plot_rateVSframelength.m:81)
            return {
                m: achievable_rate(Zbar, e, noise_var, pc.Nr)
                for m, e in out.items()
            }

        run = jax.jit(jax.vmap(realization, in_axes=(0, None)))
        keys = prng.realization_keys(prng.experiment_key(seed), i, n_mc)
        out = run(keys, jnp.asarray(nv, jnp.float32))
        for m, v in out.items():
            curves.setdefault(m, []).append(float(np.mean(np.asarray(v))))
    return SweepResult(
        "rate_vs_framelength", "T", T_values, curves, n_mc, time.time() - t0
    )


@_register("error_vs_paths")
def error_vs_paths(n_mc=8, seed=0, mesh=None, **kw):
    """``plot_errorVSpaths.m``: rays ∈ {1,3,6,9,12}; noise variance
    10^(-5/10) (``plot_errorVSpaths.m:24`` — +5 dB under the errorVSsnr
    convention, see ``_NV_PATHS_DELAYS_NRF``)."""
    return run_sweep(
        "error_vs_paths", "n_rays", [1, 3, 6, 9, 12],
        point_fn=lambda r: PointConfig(
            n_rays=r, methods=("ls", "vamp", "omp_mmv", "proposed", "proposed_angles"),
            **kw,
        ),
        noise_fn=lambda r: _NV_PATHS_DELAYS_NRF, n_mc=n_mc, seed=seed, mesh=mesh,
    )


@_register("error_vs_delays")
def error_vs_delays(n_mc=8, seed=0, mesh=None, **kw):
    """``plot_errorVSdelays.m``: L ∈ {2,4,6,8,10} with T = 5·index,
    numOfnz=50, 10 MC; noise variance 10^(-5/10)
    (``plot_errorVSdelays.m:22`` — +5 dB under the errorVSsnr convention)."""
    Ls = [2, 4, 6, 8, 10]
    return run_sweep(
        "error_vs_delays", "L", Ls,
        point_fn=lambda L: PointConfig(
            L=L, T=5 * (Ls.index(L) + 1), num_nonzero=50,
            methods=("ls", "vamp", "omp_mmv", "proposed", "proposed_angles"), **kw,
        ),
        noise_fn=lambda L: _NV_PATHS_DELAYS_NRF, n_mc=n_mc, seed=seed, mesh=mesh,
    )


@_register("error_vs_nt")
def error_vs_nt(n_mc=8, seed=0, mesh=None, **kw):
    """``plot_errorVSnt.m``: Nt ∈ {4,6,8,12,16} with per-Nt T table,
    numOfnz=50, FFT combiner (``plot_errorVSnt.m:72,123``), reference MC
    count 50; noise variance 10^(-15/10) (``plot_errorVSnt.m:22`` —
    +15 dB under the errorVSsnr convention)."""
    T_table = {4: 35, 6: 35, 8: 35, 12: 35, 16: 25}
    return run_sweep(
        "error_vs_nt", "Nt", [4, 6, 8, 12, 16],
        point_fn=lambda Nt: PointConfig(
            Nt=Nt, Gt=Nt, T=T_table[Nt], num_nonzero=50, beamformer="fft",
            methods=("ls", "vamp", "omp_mmv", "proposed", "proposed_angles"), **kw,
        ),
        noise_fn=lambda Nt: _NV_FRAMELEN_NT_RATE, n_mc=n_mc, seed=seed, mesh=mesh,
    )


@_register("error_vs_nrf")
def error_vs_nrf(n_mc=8, seed=0, mesh=None, **kw):
    """``plot_errorVSnrf.m``: RF chains Mr ∈ {4,8,12,16}, T=5; noise
    variance 10^(-5/10) (``plot_errorVSnrf.m:23`` — +5 dB under the
    errorVSsnr convention)."""
    return run_sweep(
        "error_vs_nrf", "Mr", [4, 8, 12, 16],
        point_fn=lambda Mr: PointConfig(
            Mr=Mr, T=5,
            methods=("ls", "vamp", "omp_mmv", "proposed", "proposed_angles"), **kw,
        ),
        noise_fn=lambda Mr: _NV_PATHS_DELAYS_NRF, n_mc=n_mc, seed=seed, mesh=mesh,
    )


# ---------------------------------------------------------------------------
# Specialized drivers
# ---------------------------------------------------------------------------

def _approx_realization(key, noise_var, *, T, sub_ratio, Imax, mode,
                        quirks=False):
    """One realization of the ``plot_errorVSsnr_approx.m`` pipeline: the
    ``wideband_hybBF_comm_system_training`` front end + proposed ADMM in
    'std'(exact) or 'approximate' mode; S recovered by LS de-mixing of the
    completed Y (``plot_errorVSsnr_approx.m:60-72``).

    This driver's hyper-parameters differ from the canonical recipe
    (``plot_errorVSsnr_approx.m:50-53``): τ_X = 1/‖Y_p‖²_F, τ_S = τ_X/2
    (NOT the ground-truth-energy form), and
    ρ = sqrt(min(top-6 eig(Y_pᴴY_p))·(τ_X+τ_S)/2).  B is built from the
    SAME Gaussian training frames the wrapper transmitted (``:55-58``).
    """
    Nt, Nr, L = 4, 32, 4
    k_ch = prng.role_key(key, prng.ROLE_CHANNEL)
    ch = wideband_mmwave_channel(k_ch, L, Nr, Nt, 2, 3, Nr, Nt, quirks=quirks)
    Yp, Yc, W, Omega, Lr, Psi = comm_system_training(
        key, ch.H, T, noise_var, sub_ratio
    )
    A = W.conj().T @ ch.Dr
    B = jnp.einsum("gn,lnt->lgt", ch.Dt.conj().T, Psi).reshape(L * Nt, T)
    tau_X = 1.0 / jnp.sum(jnp.abs(Yp) ** 2)
    tau_S = tau_X / 2.0
    # min of MATLAB eigs' top-6 eigenvalues of YᴴY, via the thin-side Gram
    ev = jnp.linalg.eigvalsh(Yp @ Yp.conj().T)  # ascending, (Nr,)
    rho = jnp.sqrt(jnp.maximum(ev[-6], 0.0) * (tau_X + tau_S) / 2.0)
    res = proposed_admm(Yp, Omega, A, B, Imax, tau_X, tau_S, rho, mode=mode)
    S_hat = ls_estimate(res.Y, A, B)
    return clamped_nmse(S_hat, ch.Zbar)


@_register("error_vs_snr_approx")
def error_vs_snr_approx(n_mc=8, seed=0, mesh=None, T=70, sub_ratio=0.75,
                        channel_quirks=False, **kw):
    """``plot_errorVSsnr_approx.m``: SNR −15:5:15 × Imax ∈ {10,30,50},
    'std' (exact) vs 'approximate' ADMM (T=70, subSamplingRatio=0.75,
    reference MC count 50)."""
    import functools

    curves: Dict[str, list] = {}
    snrs = list(range(-15, 16, 5))
    t0 = time.time()
    for mode in ("exact", "approximate"):
        for Imax in (10, 30, 50):
            run = jax.jit(
                jax.vmap(
                    functools.partial(
                        _approx_realization, T=T, sub_ratio=sub_ratio,
                        Imax=Imax, mode=mode, quirks=channel_quirks,
                    ),
                    in_axes=(0, None),
                ),
                static_argnames=(),
            )
            label = f"{mode}_I{Imax}"
            for i, s in enumerate(snrs):
                keys = prng.realization_keys(prng.experiment_key(seed), i, n_mc)
                errs = run(keys, jnp.asarray(_nv(s), jnp.float32))
                curves.setdefault(label, []).append(float(np.mean(errs)))
    return SweepResult(
        "error_vs_snr_approx", "snr_db", snrs, curves, n_mc, time.time() - t0
    )


@_register("error_vs_zy")
def error_vs_zy(n_mc=4, seed=0, mesh=None, Imax=50, **kw):
    """``plot_errorVSzy.m``: Nt=16, Mr=16, 'ps' combiner, ρ/2; compares
    recovering S directly from the ADMM output Z vs LS on the completed Y
    (``plot_errorVSzy.m:66-75``)."""
    Nt, Nr, Mr_e, Mr, L = 16, 32, 32, 16, 4
    n_rays = 6

    def realization(key, noise_var):
        ch = wideband_mmwave_channel(
            prng.role_key(key, prng.ROLE_CHANNEL), L, Nr, Nt, 2, n_rays, Nr, Nt
        )
        T = 5 * 16
        Psi = qam4_training_frames(prng.role_key(key, prng.ROLE_TRAINING), Nt, T, L)
        N = awgn(prng.role_key(key, prng.ROLE_NOISE), Nr, T, noise_var)
        W = create_beamformer(Nr, "ps")
        obs = proposed_hbf(prng.role_key(key, prng.ROLE_MASK), ch.H, N, Psi, Mr_e, Mr, W)
        A, B = _dictionaries(ch, obs.W_e, Psi)
        tau_Y, tau_S, rho = admm_hyperparams(obs.Y, ch.Zbar)
        res = proposed_admm(obs.Y, obs.Omega, A, B, Imax, tau_Y, tau_S, rho / 2)
        err_z = clamped_nmse(res.S, ch.Zbar)
        err_y = clamped_nmse(ls_estimate(res.Y, A, B), ch.Zbar)
        return {"from_Z": err_z, "from_Y": err_y}

    run = jax.jit(jax.vmap(realization, in_axes=(0, None)))
    t0 = time.time()
    keys = prng.realization_keys(prng.experiment_key(seed), 0, n_mc)
    out = run(keys, jnp.asarray(_nv(15), jnp.float32))
    curves = {k: [float(np.mean(v))] for k, v in out.items()}
    return SweepResult("error_vs_zy", "F", [5], curves, n_mc, time.time() - t0)


@_register("error_vs_admmiters")
def error_vs_admmiters(n_mc=4, seed=0, mesh=None, Imax=100, snr_db=15, **kw):
    """``plot_errorVSadmmiters.m``: per-iteration convergence residuals
    ε1 = ‖V1‖²/‖X‖², ε2 = ‖V2‖²/‖X‖² for both algorithms
    (``plot_errorVSadmmiters.m:50-67``); Mr=16, T=10·Nt, 'ps' combiner."""
    Nt, Nr, Mr_e, Mr, L = 4, 32, 32, 16, 4

    def realization(key, noise_var):
        ch = wideband_mmwave_channel(
            prng.role_key(key, prng.ROLE_CHANNEL), L, Nr, Nt, 2, 3, Nr, Nt
        )
        T = 10 * Nt
        Psi = qam4_training_frames(prng.role_key(key, prng.ROLE_TRAINING), Nt, T, L)
        N = awgn(prng.role_key(key, prng.ROLE_NOISE), Nr, T, noise_var)
        W = create_beamformer(Nr, "ps")
        obs = proposed_hbf(prng.role_key(key, prng.ROLE_MASK), ch.H, N, Psi, Mr_e, Mr, W)
        A, B = _dictionaries(ch, obs.W_e, Psi)
        tau_Y, tau_S, rho = admm_hyperparams(obs.Y, ch.Zbar)
        res = proposed_admm(
            obs.Y, obs.Omega, A, B, Imax, tau_Y, tau_S, rho,
            track_convergence=True,
        )
        indx = jnp.argsort(-jnp.abs(ch.Zbar).reshape(-1))
        res_a = proposed_admm_angles(
            obs.Y, obs.Omega, indx, A, B, Imax, tau_Y, tau_S, rho,
            track_convergence=True,
        )
        return res.convergence, res_a.convergence

    run = jax.jit(jax.vmap(realization, in_axes=(0, None)))
    t0 = time.time()
    keys = prng.realization_keys(prng.experiment_key(seed), 0, n_mc)
    conv, conv_a = run(keys, jnp.asarray(_nv(snr_db), jnp.float32))
    conv = np.mean(np.asarray(conv), axis=0)  # (Imax, 3)
    conv_a = np.mean(np.asarray(conv_a), axis=0)
    curves = {
        "eps1": conv[:, 0].tolist(),
        "eps2": conv[:, 1].tolist(),
        "eps1_angles": conv_a[:, 0].tolist(),
        "eps2_angles": conv_a[:, 1].tolist(),
    }
    return SweepResult(
        "error_vs_admmiters", "iteration", list(range(1, Imax + 1)), curves,
        n_mc, time.time() - t0,
    )


@_register("capacity")
def capacity(
    n_mc=64, seed=0, mesh=None, snr_db=15,
    sizes=((16, 32, 32), (16, 64, 32), (16, 128, 64)), **kw
):
    """``plot_capacity.m``: ASE vs Mr for digital / PS-HBF / ZC-HBF /
    proposed front ends (noiseless observation, T=5) at all three reference
    array geometries (Nt, Nr, Mr_e) = (16,32,32) / (16,64,32) / (16,128,64)
    (``plot_capacity.m:8-20,92-104,175-187``; reference MC count is 1e4).

    Mr enters only through which combiner columns are *kept*, and a zeroed
    column of W contributes an identity block to the log-det, so the sweep
    uses one compiled executable per geometry with a traced column mask
    (no per-Mr recompiles — the sweep axis rides the accelerator batch).
    """
    t0 = time.time()
    curves: Dict[str, list] = {}
    nv = _nv(snr_db)
    Mr_values = list(range(1, 32, 3))
    Mmax = max(Mr_values)

    def realization(key, mr, Nt, Nr, Mr_e):
        # mr is TRACED: keep the first mr columns by masking (identical
        # capacity to slicing because zero columns add identity blocks)
        L, T = 4, 5
        ch = wideband_mmwave_channel(
            prng.role_key(key, prng.ROLE_CHANNEL), L, Nr, Nt, 2, 3, Nr, Nt
        )
        Psi = qam4_training_frames(prng.role_key(key, prng.ROLE_TRAINING), Nt, T, L)
        Z = jnp.zeros((Nr, T), Psi.dtype)
        W_zc = create_beamformer(Nr, "ZC")
        W_q = create_beamformer(Nr, "quantized")
        _, Wc_d = hbf(ch.H, Z, Psi, Nr, W_zc)
        Y = jnp.einsum("lmn,lnt->mt", ch.H, Psi)  # noiseless frame
        mask = (jnp.arange(Mmax) < mr).astype(W_q.real.dtype)
        c_dbf = spectral_efficiency(Y, Wc_d, nv, Nt)
        c_ps = spectral_efficiency(Y, W_q[:, :Mmax] * mask, nv, Nt)
        c_zc = spectral_efficiency(Y, W_zc[:, :Mmax] * mask, nv, Nt)
        # proposed: random Mr-subset of the wide combiner (plot_capacity.m:63-64)
        perm = jax.random.permutation(prng.role_key(key, prng.ROLE_MASK), Mr_e)
        Wp = W_q[:, perm[:Mmax]]
        c_prop = spectral_efficiency(Y, Wp * mask, nv, Nt)
        return c_dbf, c_ps, c_zc, c_prop

    for (Nt, Nr, Mr_e) in sizes:
        run = jax.jit(
            jax.vmap(realization, in_axes=(0, None, None, None, None)),
            static_argnums=(2, 3, 4),
        )
        tag = f"Nr{Nr}"
        for i, Mr in enumerate(Mr_values):
            keys = prng.realization_keys(prng.experiment_key(seed), i, n_mc)
            c_dbf, c_ps, c_zc, c_prop = run(
                keys, jnp.asarray(Mr, jnp.int32), Nt, Nr, Mr_e
            )
            curves.setdefault(f"dbf_{tag}", []).append(float(np.mean(c_dbf)))
            curves.setdefault(f"hbf_ps_{tag}", []).append(float(np.mean(c_ps)))
            curves.setdefault(f"hbf_zc_{tag}", []).append(float(np.mean(c_zc)))
            curves.setdefault(f"proposed_{tag}", []).append(float(np.mean(c_prop)))
    return SweepResult("capacity", "Mr", Mr_values, curves, n_mc, time.time() - t0)


@_register("energy_efficiency")
def energy_efficiency(n_mc=64, seed=0, mesh=None, **kw):
    """``plot_ee.m``: EE = capacity/power vs Mr (Nt=16, Nr=64, Mr_e=32)."""
    Nt, Nr, Mr_e = 16, 64, 32
    cap = capacity(n_mc=n_mc, seed=seed, mesh=mesh, sizes=((Nt, Nr, Mr_e),), **kw)
    curves = {}
    tag = f"Nr{Nr}"
    for i, Mr in enumerate(cap.sweep_values):
        curves.setdefault("ee_dbf", []).append(
            cap.curves[f"dbf_{tag}"][i] / power_digital_bf(Nr)
        )
        curves.setdefault("ee_hbf_ps", []).append(
            cap.curves[f"hbf_ps_{tag}"][i] / power_conventional_hbf(Nr, Mr)
        )
        curves.setdefault("ee_hbf_zc", []).append(
            cap.curves[f"hbf_zc_{tag}"][i] / power_conventional_hbf(Nr, Mr, zc=True)
        )
        curves.setdefault("ee_proposed", []).append(
            cap.curves[f"proposed_{tag}"][i] / power_proposed(Nr, Mr_e)
        )
    return SweepResult(
        "energy_efficiency", "Mr", cap.sweep_values, curves, n_mc, cap.seconds
    )


@_register("rank_r")
def rank_r(n_mc=16, seed=0, mesh=None, geometries=None, channel_quirks=False,
           **kw):
    """``plot_rankR.m``: mean singular-value spectra of the noiseless
    wide-combiner observation Y = W̃ᴴ·R for L ∈ {1,4,8} — the low-rank
    justification (rank marker at min(Np, L·Nt)).

    The reference's full grid is SIX panels: Nr ∈ {32, 64, 128} (Mr_e=32,
    Nt=4, T=50) at two scattering densities — clusters=2/rays=3 (Np=6,
    ``plot_rankR.m:9-19,68-78,124-134``) and clusters=3/rays=12 (Np=36,
    ``plot_rankR.m:182-198,239-255,296-312``).  Each panel plots the first
    min(Nr, Mr_e)=32 singular values of the noiseless 32×50 observation
    (``plot_rankR.m:48,106,163,221``; QAM4 Toeplitz training, ZC combiner,
    N=0).  ``geometries`` entries are (Nr, Mr_e, Nt, clusters, rays).
    """
    if geometries is None:
        geometries = tuple(
            (Nr, 32, 4, c, r)
            for (c, r) in ((2, 3), (3, 12))
            for Nr in (32, 64, 128)
        )
    t0 = time.time()
    curves: Dict[str, list] = {}
    L_values = [1, 4, 8]
    for (Nr, Mr_e, Nt, n_cl, n_rays) in geometries:
        for L in L_values:
            def realization(key):
                T = 50  # plot_rankR.m:19 (all six panels)
                ch = wideband_mmwave_channel(
                    prng.role_key(key, prng.ROLE_CHANNEL), L, Nr, Nt,
                    n_cl, n_rays, Nr, Nt, quirks=channel_quirks,
                )
                Psi = qam4_training_frames(
                    prng.role_key(key, prng.ROLE_TRAINING), Nt, T, L
                )
                W = create_beamformer(Nr, "ZC")
                Y = W[:, :Mr_e].conj().T @ jnp.einsum("lmn,lnt->mt", ch.H, Psi)
                G = Y @ Y.conj().T
                sig2 = jnp.linalg.eigvalsh(G)[::-1]
                return jnp.sqrt(jnp.maximum(sig2, 0.0))

            keys = prng.realization_keys(prng.experiment_key(seed), L, n_mc)
            sv = jax.jit(jax.vmap(realization))(keys)
            curves[f"Nr{Nr}_Mre{Mr_e}_Np{n_cl * n_rays}_L{L}"] = np.mean(
                np.asarray(sv), axis=0
            ).tolist()
    res = SweepResult(
        "rank_r", "sv_index",
        list(range(1, 1 + min(len(c) for c in curves.values()))),
        curves, n_mc, time.time() - t0,
    )
    # marker per geometry (min(Np, L·Nt) with THAT geometry's Nt —
    # identical keys collapse only when the marker value agrees)
    res.extras["rank_marker"] = {
        f"Np{c * r}_Nt{Nt}": {f"L{L}": min(c * r, L * Nt) for L in L_values}
        for (_, _, Nt, c, r) in geometries
    }
    res.extras["channel_quirks"] = channel_quirks
    return res


@_register("rank_r_quirks")
def rank_r_quirks(n_mc=16, seed=0, mesh=None, geometries=None, **kw):
    """:func:`rank_r` under the reference-quirks ensemble — the generating
    mode of the committed fig: the tap-1 steering reuse
    (``wideband_mmwave_channel.m:24``) is what caps the stacked beamspace
    rank at Np and produces the fig's singular-value drop at the
    min(Np, L·Nt) markers; the paper-model spectra drop at the larger
    per-tap-independent rank instead."""
    res = rank_r(n_mc=n_mc, seed=seed, mesh=mesh, geometries=geometries,
                 channel_quirks=True, **kw)
    res.name = "rank_r_quirks"
    return res


@_register("error_vs_snr_nyuwireless")
def error_vs_snr_nyuwireless(n_mc=8, seed=0, mesh=None, mat_path=None, **kw):
    """``plot_errorVSsnr_nyuwireless.m``: the SNR sweep on NYU-Wireless
    ray-traced channels.  The ``nywireless_channel.mat`` file is absent from
    the reference repo (`plot_errorVSsnr_nyuwireless.m:6` loads it); when a
    path is provided the channels are ingested and per-tap normalized
    (``:59-70``), otherwise the synthetic generator is used with the same
    per-tap normalization applied."""
    from jstsp19_tpu.channel.nyu import load_nyu_taps, normalize_taps

    taps = load_nyu_taps(mat_path) if mat_path else None
    if taps is not None:
        taps = normalize_taps(taps)
        n_real, L, Nr, Nt = taps.shape
        n_mc = min(n_mc, n_real)
        taps = taps[:n_mc]
        dims = dict(L=L, Nr=Nr, Nt=Nt)
        dims.update(
            {k: kw.pop(k) for k in ("Gr", "Gt", "Mr_e", "Mr") if k in kw}
        )
        dims.setdefault("Gr", Nr)
        dims.setdefault("Gt", Nt)
        dims.setdefault("Mr_e", Nr)  # wide combiner bounded by the array
        dims.setdefault("Mr", max(1, Nr // 8))
        kw = {**dims, **kw}
    base = PointConfig(methods=("ls", "vamp", "proposed", "proposed_angles"), **kw)
    if taps is None:
        # synthetic stand-in for the absent .mat: draw n_mc channels once
        # (fixed across SNR points, like the ray-traced file) and run them
        # through the SAME per-tap normalization as the ingestion path —
        # the docstring contract round 5 made real (previously the
        # normalization was silently skipped on this branch)
        keys = prng.realization_keys(prng.experiment_key(seed), 9999, n_mc)
        gen = jax.vmap(
            lambda k: wideband_mmwave_channel(
                prng.role_key(k, prng.ROLE_CHANNEL), base.L, base.Nr,
                base.Nt, base.n_clusters, base.n_rays, base.Gr, base.Gt,
            ).H
        )
        taps = normalize_taps(gen(keys))
    return run_sweep(
        "error_vs_snr_nyuwireless", "snr_db", list(range(-15, 16, 3)),
        point_fn=lambda s: base, noise_fn=_nv, n_mc=n_mc, seed=seed, mesh=mesh,
        taps=taps,
    )


@_register("channel_correlation")
def channel_correlation(n_mc=1, seed=0, mesh=None, **kw):
    """``plot_channelcorrelation_nyuwireless.m``: beamspace correlation
    surface |Z̄ Z̄ᴴ| of a synthetic channel (``:17-31``)."""
    t0 = time.time()
    ch = wideband_mmwave_channel(
        prng.experiment_key(seed), 4, 32, 4, 2, 3, 32, 4
    )
    C = np.abs(np.asarray(ch.Zbar @ ch.Zbar.conj().T))
    res = SweepResult(
        "channel_correlation", "row", list(range(C.shape[0])),
        {"corr_rows_max": C.max(axis=1).tolist()}, n_mc, time.time() - t0,
    )
    res.extras["surface"] = C.tolist()
    return res


@_register("bar3_beamspace")
def bar3_beamspace(n_mc=1, seed=0, mesh=None, **kw):
    """``plot_bar3.m``: |Z̄| magnitude grids for L ∈ {4,8,12} (the shipped
    script is buggy — plots an undefined variable; here each grid is
    actually produced)."""
    t0 = time.time()
    curves = {}
    extras = {}
    for L in (4, 8, 12):
        ch = wideband_mmwave_channel(
            prng.experiment_key(seed + L), L, 32, 4, 2, 3, 32, 4
        )
        mag = np.abs(np.asarray(ch.Zbar))
        curves[f"L{L}_colmax"] = mag.max(axis=0).tolist()
        extras[f"L{L}"] = mag.tolist()
    res = SweepResult(
        "bar3_beamspace", "column", list(range(len(curves["L4_colmax"]))),
        curves, n_mc, time.time() - t0,
    )
    res.extras.update(extras)
    return res


@_register("time_comparisons")
def time_comparisons(n_mc=4, seed=0, mesh=None, reps=3, **kw):
    """``plot_time_comparisions.m``: wall-clock of each estimator at the
    canonical config (here: per-batch compiled time / realizations — the
    relevant production metric on an accelerator)."""
    from jstsp19_tpu.harness.runner import run_point

    t0 = time.time()
    curves: Dict[str, list] = {}
    from jstsp19_tpu.harness.pipeline import fastest_point_config

    for method in ("ls", "vamp", "omp_mmv", "proposed", "proposed_angles", "svt", "tssr"):
        pc = fastest_point_config(method)
        run_point(pc, _nv(0), n_mc, seed=seed, mesh=mesh)  # compile + warm
        best = np.inf
        for _ in range(reps):
            t1 = time.time()
            run_point(pc, _nv(0), n_mc, seed=seed, mesh=mesh)
            best = min(best, time.time() - t1)
        curves[method] = [best / n_mc]
    res = SweepResult(
        "time_comparisons", "seconds_per_realization", [0], curves, n_mc,
        time.time() - t0,
    )
    res.extras["backend"] = jax.default_backend()
    res.extras["device_kind"] = jax.devices()[0].device_kind
    res.extras["note"] = (
        f"latency-bound small-batch numbers (batch={n_mc}): per-realization "
        "wall-clock at this batch, NOT peak throughput — the accelerator "
        "amortizes over large batches; the batched-throughput analog of the "
        "reference's tic/toc table is bench_all.py → "
        "results/time_comparisons_tpu_batched.json (batch 256 on-chip: "
        "ls 6942 / vamp 5417 / proposed 3337 est/s; see PERF.md)"
    )
    return res
