"""Fused Pallas TPU kernel for the proposed-ADMM hot chain.

One ``pallas_call`` runs the ENTIRE tracked-SVT ADMM solve (all ``Imax``
iterations) for one realization per grid step, with every piece of solver
state resident in VMEM for the whole solve.  This removes the per-op
HBM round-trips and dispatch overhead of the ``lax.scan`` XLA path
(~30 HLOs × Imax iterations × batch): HBM sees exactly one load of the
problem data and one store of the result per realization.

Numerics match ``solvers/admm.py::proposed_admm(svt_method='tracked')``:

- nuclear-norm prox by warm-started spectral tracking — the Gram
  eigenbasis ``U`` is carried across iterations and refreshed with
  ``track_rounds`` parallel-ordering Jacobi rotation rounds per iteration
  (round-robin schedule cycling through all N−1 disjoint-pair rounds);
- the Jacobi rotation generator is built from precomputed one-hot
  pair-selection matrices (``Up``, ``Uq``) instead of scatters — pure
  MXU work, no gather/scatter inside the kernel;
- complex arithmetic is planar (separate re/im f32 planes); complex
  matmuls use the 3-real-multiplication (Karatsuba) form;
- the eigenbasis chain (G, T, U, Grot products) runs at
  ``Precision.HIGHEST`` — the default bf16 passes accumulate across
  Imax·track_rounds sequential rotations and destroy the basis
  (PERF.md tracked-SVT caveat); the remaining dots use the default.

Reference (capability parity): ``proposed_algorithm.m:14-69`` /
``proposed_algorithm_angles.m:36-68``; the fuse-the-hot-op precedent in
the reference is ``MPbased_solvers/main/fastWHtrans.cpp:1``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jstsp19_tpu.ops.jacobi import _round_robin_schedule

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, *, ta=False, tb=False, prec=None):
    """2D real dot with optional logical transposes folded into the
    contraction pattern (no materialized transpose)."""
    ca = 0 if ta else 1
    cb = 1 if tb else 0
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _cmm(ar, ai, br, bi, *, prec=None):
    """(a @ b) for planar complex operands — 3 real matmuls."""
    t1 = _dot(ar, br, prec=prec)
    t2 = _dot(ai, bi, prec=prec)
    t3 = _dot(ar + ai, br + bi, prec=prec)
    return t1 - t2, t3 - t1 - t2


def _cmm_nh(ar, ai, br, bi, *, prec=None):
    """a @ bᴴ (planar): re = ar·brᵀ + ai·biᵀ, im = ai·brᵀ − ar·biᵀ."""
    t1 = _dot(ar, br, tb=True, prec=prec)
    t2 = _dot(ai, bi, tb=True, prec=prec)
    t3 = _dot(ar + ai, br - bi, tb=True, prec=prec)
    # t3 = ar·brᵀ − ar·biᵀ + ai·brᵀ − ai·biᵀ  ⇒  im = t3 − t1 + t2
    return t1 + t2, t3 - t1 + t2


def _cmm_hn(ar, ai, br, bi, *, prec=None):
    """aᴴ @ b (planar): re = arᵀ·br + aiᵀ·bi, im = arᵀ·bi − aiᵀ·br."""
    t1 = _dot(ar, br, ta=True, prec=prec)
    t2 = _dot(ai, bi, ta=True, prec=prec)
    t3 = _dot(ar - ai, br + bi, ta=True, prec=prec)
    # t3 = ar·bi + ar·br − ai·br − ai·bi  ⇒  im = t3 − t1 + t2
    return t1 + t2, t3 - t1 + t2


def _fused_admm_kernel(
    # ---- inputs (one realization per grid step) ----------------------
    up_ref,       # (N-1, N, N//2) f32   one-hot p-selectors per round
    uq_ref,       # (N-1, N, N//2) f32   one-hot q-selectors per round
    hp_ref,       # (B, 8) f32 SMEM (full array; row = grid step):
                  #   rho, tauY/rho, tauS/rho, 1/rho
    suby_re, suby_im,   # (1, N, M)
    dinv_ref,           # (1, N, M)  1/(Omega + 2rho)
    a_re, a_im,         # (1, N, Gr)
    b_re, b_im,         # (1, K, M)
    aha_re, aha_im,     # (1, Gr, Gr)
    bbh_re, bbh_im,     # (1, K, K)
    rank_ref,           # (1, Gr, K) i32 support order (angles schedule)
    # ---- outputs ------------------------------------------------------
    s_re_o, s_im_o,     # (1, Gr, K)
    y_re_o, y_im_o,     # (1, N, M)
    *,
    Imax: int,
    track_rounds: int,
    use_support: bool,
    support_base: int,
    support_step: int,
):
    N = suby_re.shape[1]
    Gr = a_re.shape[2]
    K = b_re.shape[1]
    n_rounds = N - 1

    b = pl.program_id(0)
    rho = hp_ref[b, 0]
    thrY = hp_ref[b, 1]       # tau_Y / rho
    thrS = hp_ref[b, 2]       # tau_S / rho
    inv_rho = hp_ref[b, 3]

    sYr, sYi = suby_re[0], suby_im[0]
    dinv = dinv_ref[0]
    Ar, Ai = a_re[0], a_im[0]
    Br, Bi = b_re[0], b_im[0]
    Hr, Hi = aha_re[0], aha_im[0]          # AᴴA
    Pr, Pi = bbh_re[0], bbh_im[0]          # B·Bᴴ
    eyeN = jnp.eye(N, dtype=jnp.float32)

    def rotation_rounds(Tr, Ti, Ur, Ui, i):
        """track_rounds Jacobi rounds on (T, U), cycling the round-robin
        schedule from offset (i·track_rounds) mod (N−1)."""

        def rr(j, carry):
            Tr, Ti, Ur, Ui = carry
            ridx = (i * track_rounds + j) % n_rounds
            Up = up_ref[ridx]              # (N, half)
            Uq = uq_ref[ridx]
            # diagonal / off-diagonal entries at the pairs:
            #   app = diag(Upᵀ T Up), aqq = diag(Uqᵀ T Uq),
            #   apq = diag(Upᵀ T Uq)   (each a length-half vector)
            TUp_r = _dot(Tr, Up, prec=_HI)     # (N, half)
            TUq_r = _dot(Tr, Uq, prec=_HI)
            TUq_i = _dot(Ti, Uq, prec=_HI)
            app = jnp.sum(Up * TUp_r, axis=0, keepdims=True)   # (1, half)
            aqq = jnp.sum(Uq * TUq_r, axis=0, keepdims=True)
            apq_r = jnp.sum(Up * TUq_r, axis=0, keepdims=True)
            apq_i = jnp.sum(Up * TUq_i, axis=0, keepdims=True)
            mag = jnp.sqrt(apq_r * apq_r + apq_i * apq_i)
            pos = mag > 0.0
            ph_r = jnp.where(pos, apq_r / jnp.where(pos, mag, 1.0), 1.0)
            ph_i = jnp.where(pos, apq_i / jnp.where(pos, mag, 1.0), 0.0)
            # trig-free Jacobi angle (Pallas TPU has no atan2/sin/cos):
            # theta = atan2(2m, d)/2 with m >= 0 gives theta in [0, pi/2];
            # u = tan(min(theta, pi/2 - theta)) = 2m / (|d| + sqrt(d^2+4m^2))
            # in [0, 1], then (c, sin) = (1, u)/sqrt(1+u^2) up to the swap
            # when d < 0.  Exact (same branch structure) and stable at m=0.
            d = app - aqq
            u = 2.0 * mag / (jnp.abs(d) + jnp.sqrt(d * d + 4.0 * mag * mag) + 1e-30)
            w = 1.0 / jnp.sqrt(1.0 + u * u)
            dpos = d >= 0.0
            c = jnp.where(dpos, w, u * w)
            st = jnp.where(dpos, u * w, w)
            s_r = st * ph_r
            s_i = st * ph_i
            # G = I + Up·diag(c−1)·Upᵀ + Uq·diag(c−1)·Uqᵀ
            #       − Up·diag(s)·Uqᵀ + Uq·diag(s̄)·Upᵀ   (G[p,q] = −s)
            cm1 = c - 1.0
            Gr_ = (
                eyeN
                + _dot(Up * cm1, Up, tb=True, prec=_HI)
                + _dot(Uq * cm1, Uq, tb=True, prec=_HI)
                - _dot(Up * s_r, Uq, tb=True, prec=_HI)
                + _dot(Uq * s_r, Up, tb=True, prec=_HI)
            )
            Gi_ = (
                -_dot(Up * s_i, Uq, tb=True, prec=_HI)
                - _dot(Uq * s_i, Up, tb=True, prec=_HI)
            )
            # T ← Gᴴ T G ; U ← U G
            Wr, Wi = _cmm(Tr, Ti, Gr_, Gi_, prec=_HI)
            Tr, Ti = _cmm_hn(Gr_, Gi_, Wr, Wi, prec=_HI)
            Ur, Ui = _cmm(Ur, Ui, Gr_, Gi_, prec=_HI)
            return Tr, Ti, Ur, Ui

        Tr, Ti, Ur, Ui = jax.lax.fori_loop(
            0, track_rounds, rr, (Tr, Ti, Ur, Ui)
        )
        return Tr, Ti, Ur, Ui

    def body(i, st):
        (Xr, Xi, V1r, V1i, V2r, V2i, Cr, Ci, Sr, Si, vr, vi, Ur, Ui,
         Yr, Yi) = st

        # -- sub 1: tracked-SVT nuclear prox of W = X − V1/ρ -------------
        Wr = Xr - V1r * inv_rho
        Wi = Xi - V1i * inv_rho
        # matrix-level NaN reset (svt.m semantics, as in ops/tracked.py)
        ok = jnp.all(jnp.isfinite(Wr) & jnp.isfinite(Wi))
        Wr = jnp.where(ok, Wr, 0.0)
        Wi = jnp.where(ok, Wi, 0.0)
        Gr_, Gi_ = _cmm_nh(Wr, Wi, Wr, Wi, prec=_HI)        # W Wᴴ (N,N)
        Qr, Qi = _cmm(Gr_, Gi_, Ur, Ui, prec=_HI)           # G U
        Tr, Ti = _cmm_hn(Ur, Ui, Qr, Qi, prec=_HI)          # Uᴴ G U
        Tr, Ti, Ur, Ui = rotation_rounds(Tr, Ti, Ur, Ui, i)
        sig = jnp.sqrt(
            jnp.maximum(jnp.sum(Tr * eyeN, axis=0, keepdims=True), 0.0)
        )                                                    # (1, N)
        pos = sig > 0.0
        f = jnp.where(
            pos, jnp.maximum(sig - thrY, 0.0) / jnp.where(pos, sig, 1.0), 0.0
        )
        PWr, PWi = _cmm_hn(Ur, Ui, Wr, Wi, prec=_HI)        # Uᴴ W (N,M)
        Yr, Yi = _cmm(Ur * f, Ui * f, PWr, PWi, prec=_HI)   # (U f) (Uᴴ W)

        # -- sub 2: masked LS — diagonal solve ----------------------------
        # (recompute A S B of the carried S: measured faster than carrying
        # the product across iterations — see solvers/admm.py round-5 note)
        ASr, ASi = _cmm(Ar, Ai, Sr, Si)                      # A S (N,K)
        ASBr, ASBi = _cmm(ASr, ASi, Br, Bi)                  # A S B (N,M)
        Xr = (V1r + rho * Yr + sYr + V2r + rho * Cr + rho * ASBr) * dinv
        Xi = (V1i + rho * Yi + sYi + V2i + rho * Ci + rho * ASBi) * dinv

        # -- sub 3: sparse code — one SD step on the kron-free normal eqs
        Kr = Xr - V2r * inv_rho - Cr
        Ki = Xi - V2i * inv_rho - Ci
        AKr, AKi = _cmm_hn(Ar, Ai, Kr, Ki)                   # Aᴴ K (Gr,M)
        R1r, R1i = _cmm_nh(AKr, AKi, Br, Bi)                 # ·Bᴴ (Gr,K)
        Hvr, Hvi = _cmm(Hr, Hi, vr, vi)                      # AᴴA v
        R2r, R2i = _cmm(Hvr, Hvi, Pr, Pi)                    # ·BBᴴ
        rr_ = R1r - R2r
        ri_ = R1i - R2i
        HRr, HRi = _cmm(Hr, Hi, rr_, ri_)
        RRr, RRi = _cmm(HRr, HRi, Pr, Pi)                    # AᴴA r BBᴴ
        num = jnp.sum(rr_ * rr_ + ri_ * ri_)
        den = jnp.sum(rr_ * RRr + ri_ * RRi)
        alpha = jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)
        vr = vr + alpha * rr_
        vi = vi + alpha * ri_
        # complex soft-threshold, re/im separately (proposed_algorithm.m:56)
        Sr = jnp.sign(vr) * jnp.maximum(jnp.abs(vr) - thrS, 0.0)
        Si = jnp.sign(vi) * jnp.maximum(jnp.abs(vi) - thrS, 0.0)
        if use_support:
            nnz_i = jnp.minimum(
                support_base + support_step * (i + 1), Gr * K
            ).astype(jnp.int32)
            keep = rank_ref[0] < nnz_i
            Sr = jnp.where(keep, Sr, 0.0)
            Si = jnp.where(keep, Si, 0.0)
        XSr, XSi = _cmm(Ar, Ai, Sr, Si)
        XsBr, XsBi = _cmm(XSr, XSi, Br, Bi)                  # A S B (new S)

        # -- sub 4 + dual ascent ------------------------------------------
        g = rho / (rho + 1.0)
        Cr = g * (Xr - XsBr - V2r * inv_rho)
        Ci = g * (Xi - XsBi - V2i * inv_rho)
        V1r = V1r + rho * (Yr - Xr)
        V1i = V1i + rho * (Yi - Xi)
        V2r = V2r + rho * (Cr - Xr + XsBr)
        V2i = V2i + rho * (Ci - Xi + XsBi)

        return (Xr, Xi, V1r, V1i, V2r, V2i, Cr, Ci, Sr, Si, vr, vi,
                Ur, Ui, Yr, Yi)

    M = sYr.shape[1]
    zNM = jnp.zeros((N, M), jnp.float32)
    zGK = jnp.zeros((Gr, K), jnp.float32)
    init = (zNM, zNM, zNM, zNM, zNM, zNM, zNM, zNM, zGK, zGK, zGK, zGK,
            eyeN, jnp.zeros((N, N), jnp.float32), zNM, zNM)
    final = jax.lax.fori_loop(0, Imax, body, init)
    s_re_o[0] = final[8]
    s_im_o[0] = final[9]
    y_re_o[0] = final[14]
    y_im_o[0] = final[15]


@functools.partial(
    jax.jit,
    static_argnames=(
        "Imax", "track_rounds", "support_base", "support_step", "interpret",
    ),
)
def fused_tracked_admm(
    subY: jnp.ndarray,       # (B, N, M) complex64
    Omega: jnp.ndarray,      # (B, N, M) real
    A: jnp.ndarray,          # (B, N, Gr) complex64
    B: jnp.ndarray,          # (B, K, M) complex64
    tau_Y: jnp.ndarray,      # (B,)
    tau_S: jnp.ndarray,      # (B,)
    rho: jnp.ndarray,        # (B,)
    Imax: int = 100,
    support_rank: Optional[jnp.ndarray] = None,   # (B, Gr, K) int32
    track_rounds: int = 1,
    support_base: int = 10,
    support_step: int = 5,
    interpret: bool = False,
):
    """Batched fused tracked-SVT ADMM (grid = one realization per step).

    Returns ``(S, Y)``: the (B, Gr, K) post-threshold beamspace estimate
    and the (B, N, M) completed low-rank observation — numerically
    matching ``proposed_admm(svt_method='tracked')`` vmapped over the
    batch.  ``support_rank`` enables the Algorithm-3 angle schedule
    (``proposed_algorithm_angles.m:36-43``).
    """
    Bt, N, M = subY.shape
    Gr = A.shape[2]
    K = B.shape[1]
    if N % 2 or N > M:
        raise ValueError("fused tracked ADMM needs even N <= M")

    sched = _round_robin_schedule(N)                      # (N-1, 2, N/2)
    half = N // 2
    up_tab = np.zeros((N - 1, N, half), np.float32)
    uq_tab = np.zeros((N - 1, N, half), np.float32)
    r_idx = np.arange(half)
    for r in range(N - 1):
        up_tab[r, sched[r, 0], r_idx] = 1.0
        uq_tab[r, sched[r, 1], r_idx] = 1.0
    up_tab = jnp.asarray(up_tab)
    uq_tab = jnp.asarray(uq_tab)

    rho_f = rho.astype(jnp.float32).reshape(Bt)
    hp = jnp.stack(
        [
            rho_f,
            tau_Y.astype(jnp.float32).reshape(Bt) / rho_f,
            tau_S.astype(jnp.float32).reshape(Bt) / rho_f,
            1.0 / rho_f,
        ],
        axis=1,
    )
    hp = jnp.pad(hp, ((0, 0), (0, 4)))                    # (B, 8)

    dinv = 1.0 / (Omega.real.astype(jnp.float32) + 2.0 * rho_f[:, None, None])

    use_support = support_rank is not None
    rank = (
        support_rank.astype(jnp.int32)
        if use_support
        else jnp.zeros((Bt, Gr, K), jnp.int32)
    )

    f32 = lambda x: x.astype(jnp.float32)
    kern = functools.partial(
        _fused_admm_kernel,
        Imax=Imax,
        track_rounds=track_rounds,
        use_support=use_support,
        support_base=support_base,
        support_step=support_step,
    )

    def bspec(*shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    shared = pl.BlockSpec(
        (N - 1, N, half), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    out_S = jax.ShapeDtypeStruct((Bt, Gr, K), jnp.float32)
    out_Y = jax.ShapeDtypeStruct((Bt, N, M), jnp.float32)

    s_re, s_im, y_re, y_im = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=[
            shared, shared,
            # full-array SMEM table (the (1, 8)-blocked form trips the
            # Mosaic last-two-dims divisibility rule); kernel indexes the
            # row by pl.program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec(N, M), bspec(N, M), bspec(N, M),
            bspec(N, Gr), bspec(N, Gr),
            bspec(K, M), bspec(K, M),
            bspec(Gr, Gr), bspec(Gr, Gr),
            bspec(K, K), bspec(K, K),
            bspec(Gr, K),
        ],
        out_specs=[bspec(Gr, K), bspec(Gr, K), bspec(N, M), bspec(N, M)],
        out_shape=[out_S, out_S, out_Y, out_Y],
        interpret=interpret,
    )(
        up_tab, uq_tab, hp,
        f32(subY.real), f32(subY.imag), dinv,
        f32(A.real), f32(A.imag),
        f32(B.real), f32(B.imag),
        f32((A.conj().swapaxes(1, 2) @ A).real),
        f32((A.conj().swapaxes(1, 2) @ A).imag),
        f32((B @ B.conj().swapaxes(1, 2)).real),
        f32((B @ B.conj().swapaxes(1, 2)).imag),
        rank,
    )
    S = (s_re + 1j * s_im).astype(subY.dtype)
    Y = (y_re + 1j * y_im).astype(subY.dtype)
    return S, Y
