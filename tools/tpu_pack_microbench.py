"""Measure the asserted perf ceiling: do ≥128-row packed operands beat the
32-row batched dictionary products?

PERF.md r3 pins the remaining ADMM time on the A·S·B dictionary products
whose operands have 32 rows — a quarter of the 128×128 MXU tile — and
asserts the gap is "fixed by the physics of the 32-antenna problem".
VERDICT r3 #3a demands the measurement: pack FOUR realizations'
(32×32)·(32×16) products into one block-diagonal (128×128)·(128×16)
product (correct per-realization results in stacked rows, 4× padded FLOPs
on the zero off-diagonal blocks) and compare against the batched 32-row
form XLA runs today.  A dense-128 control row shows the raw tile effect
without the 4× zero-padding waste.

Methodology: the product chain runs inside a 100-step lax.scan with a data
dependency (mimicking the ADMM iteration structure), batch 256, complex64,
default matmul precision, one host transfer per timed rep (axon sync).

Artifact: results/pack_microbench_tpu.json.
Run:  python tools/tpu_pack_microbench.py [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from jstsp19_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

ITERS = 100
BATCH = 256
GROUP = 4  # realizations packed per 128-row operand


def log(m):
    print(f"[pack {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    ns = p.parse_args()
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)

    # Upload ONLY real arrays and build complex values inside jit; return
    # ONLY real scalars.  Complex host<->device transfers are unimplemented
    # on the tunneled TPU backend (CLAUDE.md), and an async-failed upload
    # surfaces as UNIMPLEMENTED at the next fetch.
    def cx_np(*shape):
        return (
            (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
            / np.sqrt(2)
        ).astype(np.complex64)

    def split(x):
        return jnp.asarray(x.real.copy()), jnp.asarray(x.imag.copy())

    def j(re, im):
        return re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)

    # per-realization dictionary product geometry (canonical config):
    # A (32×32), S (32×16), B (16×140) — Xs = A·S·B, then the adjoint
    # correlation Aᴴ·Xs·Bᴴ closes the data-dependence loop like the ADMM's
    # sparse-code step.
    A_np = cx_np(BATCH, 32, 32)
    S0_np = cx_np(BATCH, 32, 16)
    B_np = cx_np(BATCH, 16, 140)

    G = GROUP
    nG = BATCH // G
    A_bd_np = np.zeros((nG, 32 * G, 32 * G), np.complex64)
    An = A_np.reshape(nG, G, 32, 32)
    for g in range(G):
        A_bd_np[:, g * 32:(g + 1) * 32, g * 32:(g + 1) * 32] = An[:, g]
    S0_st_np = S0_np.reshape(nG, G * 32, 16)
    B4_np = B_np.reshape(nG, G, 16, 140)
    Ad_np = cx_np(nG, 128, 128)
    Sd_np = cx_np(nG, 128, 16)
    Bd_np = cx_np(nG, 16, 140)

    def _norm(S2):
        return S2 / jnp.sqrt(
            jnp.mean(jnp.abs(S2) ** 2, axis=(-2, -1), keepdims=True) + 1e-9
        )

    def _chain_batched(A, S0, B):
        def body(S, _):
            Xs = (A @ S) @ B
            S2 = A.conj().swapaxes(-2, -1) @ Xs @ B.conj().swapaxes(-2, -1)
            return _norm(S2), ()
        S, _ = jax.lax.scan(body, S0, None, length=ITERS)
        return S

    def _chain_packed(A_bd, S0_st, B4):
        # block-diagonal packing: G realizations' A on the diagonal of one
        # 128×128 operand, S row-stacked — A_bd @ S_stack fills 128 MXU rows
        # (4x padded FLOPs on the zero blocks); the 16-row B products stay
        # per-realization (their stacked rows would need a block-diagonal
        # reshape) — exactly the restructuring available to the solver.
        def body(S, _):
            AS = A_bd @ S                          # (nG, 128, 16)
            Xs = AS.reshape(nG, G, 32, 16) @ B4    # per-realization products
            K = Xs @ B4.conj().swapaxes(-2, -1)
            S2 = (
                A_bd.conj().swapaxes(-2, -1) @ K.reshape(nG, G * 32, 16)
            ).reshape(nG, G, 32, 16)
            return _norm(S2).reshape(nG, G * 32, 16), ()
        S, _ = jax.lax.scan(body, S0_st, None, length=ITERS)
        return S

    def _chain_dense(Ad, Sd, Bd):
        # control: DENSE 128-row operands doing 4 realizations' FLOPs of
        # useful work — the raw tile-utilization ceiling, no padding waste
        def body(S, _):
            Xs = (Ad @ S) @ Bd
            S2 = Ad.conj().swapaxes(-2, -1) @ Xs @ Bd.conj().swapaxes(-2, -1)
            return _norm(S2), ()
        S, _ = jax.lax.scan(body, Sd, None, length=ITERS)
        return S

    def run_batched(Ar, Ai, Sr, Si, Br, Bi):
        S = _chain_batched(j(Ar, Ai), j(Sr, Si), j(Br, Bi))
        return jnp.sum(jnp.abs(S))

    def run_packed(Ar, Ai, Sr, Si, Br, Bi):
        S = _chain_packed(j(Ar, Ai), j(Sr, Si), j(Br, Bi))
        return jnp.sum(jnp.abs(S))

    def run_dense(Ar, Ai, Sr, Si, Br, Bi):
        S = _chain_dense(j(Ar, Ai), j(Sr, Si), j(Br, Bi))
        return jnp.sum(jnp.abs(S))

    args_batched = split(A_np) + split(S0_np) + split(B_np)
    args_packed = split(A_bd_np) + split(S0_st_np) + split(B4_np)
    args_dense = split(Ad_np) + split(Sd_np) + split(Bd_np)

    rows = {}
    for name, fn, args, n_real in (
        ("batched_32row", run_batched, args_batched, BATCH),
        ("blockdiag_128row", run_packed, args_packed, BATCH),
        ("dense_128row_control", run_dense, args_dense, nG),
    ):
        jf = jax.jit(fn)
        t0 = time.time()
        float(jf(*args))
        t_first = time.time() - t0
        best = float("inf")
        for _ in range(5):
            t1 = time.time()
            float(jf(*args))
            best = min(best, time.time() - t1)
        rows[name] = dict(
            best_s=round(best, 5),
            first_incl_compile_s=round(t_first, 2),
            realizations=n_real,
            chain_rate_per_s=round(n_real / best, 1),
        )
        log(f"{name:22s} best {best:.4f}s ({n_real / best:8.1f} chains/s)")

    # correctness: the packed chain must equal the batched chain
    # per-realization — one jit returning the real max-|diff| scalar
    def run_diff(Ar, Ai, Sr, Si, Br, Bi, Abr, Abi, Ssr, Ssi, B4r, B4i):
        Sb = _chain_batched(j(Ar, Ai), j(Sr, Si), j(Br, Bi))
        Sp = _chain_packed(j(Abr, Abi), j(Ssr, Ssi), j(B4r, B4i)).reshape(
            BATCH, 32, 16
        )
        return jnp.max(jnp.abs(Sb - Sp))

    max_diff = float(jax.jit(run_diff)(*(args_batched + args_packed)))
    log(f"packed-vs-batched max|diff| = {max_diff:.2e}")

    out = dict(
        iters=ITERS, batch=BATCH, group=GROUP,
        packed_vs_batched_max_abs_diff=max_diff,
        device=jax.devices()[0].device_kind,
        backend=jax.default_backend(),
        note="100-iteration scanned A·S·B + adjoint chain, complex64, "
             "default matmul precision; blockdiag packs 4 realizations "
             "into 128-row A operands (4x padded FLOPs on zero blocks); "
             "dense control shows the raw 128-row tile rate",
        rows=rows,
    )
    path = "/root/repo/results/pack_microbench_tpu.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"artifact": path, **{k: v["chain_rate_per_s"] for k, v in rows.items()}}))


if __name__ == "__main__":
    main()
