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

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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

    def cx(*shape):
        return jnp.asarray(
            (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
            / np.sqrt(2),
            jnp.complex64,
        )

    # per-realization dictionary product geometry (canonical config):
    # A (32×32), S (32×16), B (16×140) — Xs = A·S·B, then the adjoint
    # correlation Aᴴ·Xs·Bᴴ closes the data-dependence loop like the ADMM's
    # sparse-code step.
    A = cx(BATCH, 32, 32)
    S0 = cx(BATCH, 32, 16)
    B = cx(BATCH, 16, 140)

    def chain_batched(A, S0, B):
        def body(S, _):
            Xs = (A @ S) @ B
            S2 = A.conj().swapaxes(-2, -1) @ Xs @ B.conj().swapaxes(-2, -1)
            S2 = S2 / jnp.sqrt(
                jnp.mean(jnp.abs(S2) ** 2, axis=(-2, -1), keepdims=True) + 1e-9
            )
            return S2, ()
        S, _ = jax.lax.scan(body, S0, None, length=ITERS)
        return S

    # block-diagonal packing: G realizations' A on the diagonal of one
    # 128×128 operand; their S row-stacked — A_bd @ S_stack computes all G
    # products with 128 live rows (and 4x padded FLOPs).  B stays
    # per-realization (its 16-row operand packs the same way).
    G = GROUP
    nG = BATCH // G
    A_bd = np.zeros((nG, 32 * G, 32 * G), np.complex64)
    An = np.asarray(A).reshape(nG, G, 32, 32)
    for g in range(G):
        A_bd[:, g * 32:(g + 1) * 32, g * 32:(g + 1) * 32] = An[:, g]
    A_bd = jnp.asarray(A_bd)
    S0_st = S0.reshape(nG, G * 32, 16)

    def chain_packed(A_bd, S0_st, B4):
        # the 16-row B operand cannot pack into the same block-diagonal
        # trick (the stacked AS rows would need a block-diagonal reshape),
        # so the 2nd/3rd products stay per-realization — exactly the
        # restructuring available to the real solver.
        def body(S, _):
            AS = A_bd @ S                       # (nG, 128, 16) — packed rows
            Xs = AS.reshape(nG, G, 32, 16) @ B4    # per-realization products
            K = Xs @ B4.conj().swapaxes(-2, -1)    # (nG, G, 32, 16)
            S2 = (
                A_bd.conj().swapaxes(-2, -1) @ K.reshape(nG, G * 32, 16)
            ).reshape(nG, G, 32, 16)
            # per-realization normalization (matches the batched chain)
            S2 = S2 / jnp.sqrt(
                jnp.mean(jnp.abs(S2) ** 2, axis=(-2, -1), keepdims=True) + 1e-9
            )
            return S2.reshape(nG, G * 32, 16), ()
        S, _ = jax.lax.scan(body, S0_st, None, length=ITERS)
        return S

    B4 = B.reshape(nG, G, 16, 140)

    # control: a DENSE 128-row operand doing 4 realizations' FLOPs worth of
    # useful work (no zero padding) — the raw tile-utilization ceiling.
    Ad = cx(nG, 128, 128)
    Sd = cx(nG, 128, 16)
    Bd = cx(nG, 16, 140)

    def chain_dense128(Ad, Sd, Bd):
        def body(S, _):
            Xs = (Ad @ S) @ Bd
            S2 = Ad.conj().swapaxes(-2, -1) @ Xs @ Bd.conj().swapaxes(-2, -1)
            S2 = S2 / jnp.sqrt(
                jnp.mean(jnp.abs(S2) ** 2, axis=(-2, -1), keepdims=True) + 1e-9
            )
            return S2, ()
        S, _ = jax.lax.scan(body, Sd, None, length=ITERS)
        return S

    rows = {}
    for name, fn, args, n_real in (
        ("batched_32row", chain_batched, (A, S0, B), BATCH),
        ("blockdiag_128row", chain_packed, (A_bd, S0_st, B4), BATCH),
        ("dense_128row_control", chain_dense128, (Ad, Sd, Bd), nG),
    ):
        jf = jax.jit(fn)
        t0 = time.time()
        float(jnp.sum(jnp.abs(jf(*args))))
        t_first = time.time() - t0
        best = float("inf")
        for _ in range(5):
            t1 = time.time()
            float(jnp.sum(jnp.abs(jf(*args))))
            best = min(best, time.time() - t1)
        rows[name] = dict(
            best_s=round(best, 5),
            first_incl_compile_s=round(t_first, 2),
            realizations=n_real,
            chain_rate_per_s=round(n_real / best, 1),
        )
        log(f"{name:22s} best {best:.4f}s ({n_real / best:8.1f} chains/s)")

    # correctness: the packed chain must equal the batched chain
    # per-realization (block-diagonal rows carry independent products)
    Sb = jax.jit(chain_batched)(A, S0, B)
    Sp = jax.jit(chain_packed)(A_bd, S0_st, B4).reshape(BATCH, 32, 16)
    max_diff = float(jnp.max(jnp.abs(Sb - Sp)))
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
