"""Frequency-selective (delay-tap) wideband mmWave MIMO channel generator.

TPU-native re-design of the reference generator
(``basic_system_functions/wideband_mmwave_channel.m:1-62``): the per-tap
cluster/ray synthesis is one batched einsum over a (L, n_clusters*n_rays)
grid of rays instead of nested scalar loops, so the whole channel (and any
vmapped batch of Monte-Carlo channels) is a handful of MXU matmuls.

Deliberate deviations from the reference implementation (the *paper* model is
implemented, not the MATLAB quirks — see SURVEY.md §7.1 item 2):

- the reference accumulates the running per-cluster partial sum into each
  cluster slot (``wideband_mmwave_channel.m:24-30``), double-counting early
  rays; here every ray contributes exactly once with the standard
  ``1/sqrt(n_clusters·n_rays)`` normalization;
- the reference's "beamSquint" branch is byte-identical to the plain branch
  (``:25``) — only one branch exists here;
- the reference's inner products reuse tap-1 steering vectors for all taps
  (``Ar(:, index)`` vs ``Ar(:, index, l)``, ``:24``); here each tap uses its
  own ray geometry;
- the reference's truncated-Laplacian sampler
  (``genLaplacianSamples``, ``:56-62``) is not a valid inverse-CDF transform
  (its output is confined to a small negative arc); here a correct
  inverse-transform sampler for the truncated Laplacian power azimuth
  spectrum is used (mean AoA 0, configurable angular std).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from jstsp19_tpu.core.config import COMPLEX_DTYPE, REAL_DTYPE
from jstsp19_tpu.core import prng

# Carrier geometry of the reference (`wideband_mmwave_channel.m:44-49`):
# 90 GHz carrier, half-wavelength ULA spacing => k·d = pi.
KD = jnp.pi  # wavenumber * element spacing for lambda/2 ULA
DEFAULT_SIGMA_PHI_RAD = 50.0 * jnp.pi / 180.0


def ula_steering(phi: jnp.ndarray, M: int) -> jnp.ndarray:
    """Unnormalized ULA steering vector(s) ``exp(-j·k·d·sin(phi)·m)``.

    ``phi``: (...,) angles in radians.  Returns (..., M) complex.
    Matches the reference's ``angle(phi, M)`` helper
    (``wideband_mmwave_channel.m:42-52``; mean AoA ``phi0 = 0``).
    """
    m = jnp.arange(M, dtype=REAL_DTYPE)
    phase = KD * jnp.sin(-phi)[..., None] * m
    return jnp.exp(-1j * phase).astype(COMPLEX_DTYPE)


def truncated_laplacian(
    key: jax.Array, shape, sigma: float = DEFAULT_SIGMA_PHI_RAD
) -> jnp.ndarray:
    """Sample angles from a Laplacian PAS truncated to [-pi, pi].

    Proper inverse-CDF transform (cf. the reference's broken
    ``genLaplacianSamples``, ``wideband_mmwave_channel.m:56-62``): with
    u ~ U(-1/2, 1/2),

        phi = -(sigma/sqrt(2)) · sign(u) · log(1 − 2|u|·(1 − e^{−sqrt(2)·pi/sigma}))
    """
    u = jax.random.uniform(key, shape, REAL_DTYPE, -0.5, 0.5)
    b = sigma / jnp.sqrt(2.0)
    trunc = 1.0 - jnp.exp(-jnp.pi / b)
    return -b * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u) * trunc)


def dft_dictionary(M: int, G: int) -> jnp.ndarray:
    """Beamspace DFT dictionary ``D[m,g] = exp(-j·2π·m·g/G)/sqrt(M)``.

    Matches ``wideband_mmwave_channel.m:9-10`` exactly.
    """
    m = jnp.arange(M, dtype=REAL_DTYPE)[:, None]
    g = jnp.arange(G, dtype=REAL_DTYPE)[None, :]
    return (jnp.exp(-2j * jnp.pi * m * g / G) / jnp.sqrt(M * 1.0)).astype(
        COMPLEX_DTYPE
    )


class Channel(NamedTuple):
    """A wideband channel realization.

    H:    (L, Mr, Mt)   delay-tap antenna-space channel
    Zbar: (Gr, L*Gt)    beamspace channel, taps concatenated column-wise
                        (reference layout ``reshape(Z, Gr, L*Gt)``,
                        ``wideband_mmwave_channel.m:38``)
    Ar:   (L, Np, Mr)   receive steering vectors per tap
    At:   (L, Np, Mt)   transmit steering vectors per tap
    Dr:   (Mr, Gr)      receive beamspace dictionary
    Dt:   (Mt, Gt)      transmit beamspace dictionary
    """

    H: jnp.ndarray
    Zbar: jnp.ndarray
    Ar: jnp.ndarray
    At: jnp.ndarray
    Dr: jnp.ndarray
    Dt: jnp.ndarray


def beamspace(H: jnp.ndarray, Dr: jnp.ndarray, Dt: jnp.ndarray) -> jnp.ndarray:
    """Per-tap beamspace projection ``Z_l = Dr^H H_l Dt`` flattened to
    (Gr, L*Gt) with taps concatenated along columns."""
    Z = jnp.einsum("mg,lmn,nh->lgh", Dr.conj(), H, Dt)
    L, Gr, Gt = Z.shape
    return jnp.transpose(Z, (1, 0, 2)).reshape(Gr, L * Gt)


def wideband_mmwave_channel(
    key: jax.Array,
    L: int,
    Mr: int,
    Mt: int,
    n_clusters: int,
    n_rays: int,
    Gr: int,
    Gt: int,
    sigma_phi: float = DEFAULT_SIGMA_PHI_RAD,
) -> Channel:
    """Generate one wideband mmWave channel realization.

    Per tap l: ``H_l = sqrt(1/(n_clusters·n_rays)) Σ_p α_p a_r(φr_p) a_t(φt_p)^H``
    with α_p ~ CN(0,1) Rayleigh coefficients and truncated-Laplacian angles
    (reference: ``wideband_mmwave_channel.m:13-36``).
    """
    Np = n_clusters * n_rays
    k_coef, k_phir, k_phit = jax.random.split(key, 3)

    alpha = prng.complex_normal(k_coef, (L, Np))
    phi_r = truncated_laplacian(k_phir, (L, Np), sigma_phi)
    phi_t = truncated_laplacian(k_phit, (L, Np), sigma_phi)

    Ar = ula_steering(phi_r, Mr)  # (L, Np, Mr)
    At = ula_steering(phi_t, Mt)  # (L, Np, Mt)

    # H_l = (1/sqrt(Np)) Σ_p α_p · a_r ⊗ a_t^H — one batched einsum (MXU).
    H = jnp.einsum("lp,lpm,lpn->lmn", alpha, Ar, At.conj()) / jnp.sqrt(Np * 1.0)

    Dr = dft_dictionary(Mr, Gr)
    Dt = dft_dictionary(Mt, Gt)
    Zbar = beamspace(H, Dr, Dt)
    return Channel(H=H, Zbar=Zbar, Ar=Ar, At=At, Dr=Dr, Dt=Dt)


def taps_to_subcarriers(H: jnp.ndarray, K: int) -> jnp.ndarray:
    """Frequency response on K subcarriers: ``H_k = Σ_l H_l e^{−j2πkl/K}``.

    The delay-tap ↔ subcarrier view used by the OFDM-style configs
    (BASELINE.json configs with K subcarriers).  ``H``: (L, Mr, Mt) →
    (K, Mr, Mt) via a zero-padded FFT over the tap axis.
    """
    L = H.shape[0]
    Hp = jnp.concatenate(
        [H, jnp.zeros((K - L,) + H.shape[1:], H.dtype)], axis=0
    ) if K > L else H[:K]
    return jnp.fft.fft(Hp, axis=0)


def channel_from_taps(H: jnp.ndarray, Gr: int, Gt: int) -> Channel:
    """Build a :class:`Channel` from externally supplied delay taps
    (the NYU-Wireless ingestion path, ``plot_errorVSsnr_nyuwireless.m:59-70``
    — taps come from a ray tracer instead of the synthetic generator).

    H: (L, Mr, Mt).  Steering-vector fields are not available for measured
    channels and are filled with empty placeholders.
    """
    L, Mr, Mt = H.shape
    Dr = dft_dictionary(Mr, Gr)
    Dt = dft_dictionary(Mt, Gt)
    Zbar = beamspace(H, Dr, Dt)
    empty_r = jnp.zeros((L, 0, Mr), H.dtype)
    empty_t = jnp.zeros((L, 0, Mt), H.dtype)
    return Channel(H=H, Zbar=Zbar, Ar=empty_r, At=empty_t, Dr=Dr, Dt=Dt)
