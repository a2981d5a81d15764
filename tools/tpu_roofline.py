"""Roofline microbenchmarks on the real chip (results/roofline_tpu.json).

Measures achieved FLOP/s / HBM bandwidth for the framework's hot kernels
against the chip's peaks (TPU v5e: ~197 TFLOP/s bf16, ~49 TFLOP/s f32,
~819 GB/s HBM), plus dense-matmul/stream ceilings for context.

Methodology notes (axon relay):
- every dispatch costs a relay round-trip, so each measurement runs the
  op ``INNER`` times inside ONE jitted ``lax.fori_loop`` with a data
  dependence between trips, and divides;
- complex operands are built inside jit (eager complex ops are
  unimplemented on the relay);
- timing uses a scalar host fetch (block_until_ready does not
  synchronize on this backend).
"""
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

import jax.numpy as jnp
import numpy as np

PEAKS = {"bf16_tflops": 197.0, "f32_tflops": 49.0, "hbm_gbps": 819.0}
INNER = 20
out = {"device": jax.devices()[0].device_kind, "peaks_assumed": PEAKS,
       "inner_reps": INNER, "kernels": {}}


def log(m):
    print(f"[roofline {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def timeit(fn, *args, reps=4):
    _ = float(fn(*args))
    best = float("inf")
    for _i in range(reps):
        t0 = time.time()
        _ = float(fn(*args))
        best = min(best, (time.time() - t0) / INNER)
    return best


def record(name, secs, flops=None, bytes_=None, note=""):
    e = {"per_op_s": round(secs, 7), "note": note}
    if flops:
        e["tflops"] = round(flops / secs / 1e12, 2)
        e["pct_of_peak"] = round(
            100 * flops / secs / 1e12
            / (PEAKS["bf16_tflops"] if "bf16" in name else PEAKS["f32_tflops"]),
            1,
        )
    if bytes_:
        e["gbps"] = round(bytes_ / secs / 1e9, 1)
        e["pct_of_hbm_peak"] = round(
            100 * bytes_ / secs / 1e9 / PEAKS["hbm_gbps"], 1
        )
    out["kernels"][name] = e
    log(f"{name}: {e}")
    with open("/root/repo/results/roofline_tpu.json", "w") as f:
        json.dump(out, f, indent=1)


key = jax.random.PRNGKey(0)


def loop(fn_one):
    """Run fn_one INNER times with a data dependence; return a scalar."""

    def body(i, c):
        return fn_one(c, i)

    return body


# 1. dense bf16 matmul ceiling (4096^3)
n = 4096
a = jax.random.normal(key, (n, n), jnp.bfloat16)
b = jax.random.normal(jax.random.fold_in(key, 1), (n, n), jnp.bfloat16)


@jax.jit
def mm_bf16(a, b):
    def one(c, i):
        return (a + c * jnp.bfloat16(1e-30)) @ b

    c = jax.lax.fori_loop(0, INNER, loop(one), a)
    return jnp.sum(c.astype(jnp.float32))


record("dense_matmul_bf16_4096", timeit(mm_bf16, a, b), flops=2 * n**3,
       note="MXU ceiling check")

# 2. dense f32 HIGHEST matmul (2048^3)
n2 = 2048
af = jax.random.normal(key, (n2, n2), jnp.float32)
bf = jax.random.normal(jax.random.fold_in(key, 2), (n2, n2), jnp.float32)


@jax.jit
def mm_f32(a, b):
    def one(c, i):
        return jax.lax.dot_general(
            a + c * 1e-30, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    c = jax.lax.fori_loop(0, INNER, loop(one), a)
    return jnp.sum(c)


record("dense_matmul_f32_hi_2048", timeit(mm_f32, af, bf), flops=2 * n2**3,
       note="six-pass bf16 emulation ceiling")

# 3. HBM stream: triad over 256 MB arrays
ns = 64 * 1024 * 1024
x = jax.random.normal(key, (ns,), jnp.float32)
y = jax.random.normal(jax.random.fold_in(key, 3), (ns,), jnp.float32)


@jax.jit
def triad(x, y):
    def one(c, i):
        return x + 1.5 * c

    c = jax.lax.fori_loop(0, INNER, loop(one), y)
    return jnp.sum(c[:8])


record("hbm_triad_f32_256MB", timeit(triad, x, y), bytes_=12 * ns,
       note="stream: 2 reads + 1 write per trip")

# 4. FWHT (ops/fourier.py) batched 256 x 4096
from jstsp19_tpu.ops.fourier import fwht

mB, nw = 256, 4096
xw = jax.random.normal(key, (mB, nw), jnp.float32)


@jax.jit
def fw(xw):
    def one(c, i):
        return fwht(c) * (1.0 / nw)  # normalized -> involution-ish, stays bounded

    c = jax.lax.fori_loop(0, INNER, loop(one), xw)
    return jnp.sum(c[:2, :8])


record("fwht_256x4096", timeit(fw, xw),
       flops=mB * nw * int(np.log2(nw)), bytes_=2 * 4 * mB * nw,
       note="12 butterfly passes; effective HBM traffic ~1 read+1 write")

# 5. dictionary correlation (ADMM sub-3) batch 256 complex64,
#    built + iterated entirely inside jit
B_, N_, G_, K_, M_ = 256, 32, 128, 16, 140


@jax.jit
def corr(key):
    k1, k2, k3 = jax.random.split(key, 3)

    def cx(k, s):
        kr, ki = jax.random.split(k)
        return (jax.random.normal(kr, s) + 1j * jax.random.normal(ki, s)
                ).astype(jnp.complex64)

    A = cx(k1, (B_, N_, G_))
    Kx = cx(k2, (B_, N_, M_))
    Bm = cx(k3, (B_, K_, M_))

    def one(c, i):
        return jnp.einsum("bng,bnm,bkm->bgk", A.conj(), Kx + c.mean() * 1e-30,
                          Bm.conj())

    c = jax.lax.fori_loop(0, INNER, loop(one), jnp.zeros((B_, G_, K_),
                                                         jnp.complex64))
    return jnp.sum(jnp.abs(c[:1, :4, :4]))


fl = 8 * B_ * (N_ * G_ * M_ + G_ * M_ * K_)
record("dict_correlation_b256", timeit(corr, key), flops=fl,
       note="Ah K Bh batched complex einsum (ADMM sub-3 correlation)")

# 6. whole-solve MFU from the measured headline
flops_per_est = 100 * (
    8 * (N_ * N_ * M_ + 2 * N_ ** 3 + 10 * N_ * N_ * (N_ // 2))
    + 8 * (N_ * G_ * K_ + N_ * K_ * M_)
    + 8 * (N_ * G_ * M_ + G_ * M_ * K_ + G_ * G_ * K_ + G_ * K_ * K_) * 2
)
out["kernels"]["admm_tracked_tr1_whole_solve"] = {
    "est_per_sec_measured": 2652,
    "approx_flops_per_estimation": flops_per_est,
    "achieved_tflops": round(2652 * flops_per_est / 1e12, 3),
    "note": "from results/tracked_rounds_tpu.json; xprof roofline of the "
            "same program (results/trace_roofline.json): 8.8 TFLOP/s "
            "program-level, hot matmul fusions at ~21 TFLOP/s, HBM ~91 "
            "GiB/s, 0% DMA stalls -> compute-bound on sub-MXU-tile "
            "matmul shapes, not HBM-bound",
}
with open("/root/repo/results/roofline_tpu.json", "w") as f:
    json.dump(out, f, indent=1)
log("done")
