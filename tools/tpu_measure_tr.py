"""On-chip throughput of the tracked/fused ADMM vs track_rounds.

CPU-verified fact (see PERF.md): track_rounds=1 is NMSE-identical to
eigh-SVT at the canonical config (per-realization diff <= 8e-6 across
SNR/quirks/angles) — the warm-started basis needs only one
parallel-ordering rotation round per ADMM iteration.  This measures the
resulting throughput.  One warm process for every config (relay contact
is expensive); writes results/tracked_rounds_tpu.json.
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

from jstsp19_tpu.core import prng
from jstsp19_tpu.harness.pipeline import (
    PointConfig, fused_point_errors, realization_errors,
)

out_path = "/root/repo/results/tracked_rounds_tpu.json"
out = {"device": jax.devices()[0].device_kind, "steps": {}}
nv = jnp.asarray(1.0, jnp.float32)


def log(msg):
    print(f"[tr {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def measure(name, fn, batch, reps=3):
    keys = prng.realization_keys(prng.experiment_key(1), 0, batch)
    log(f"start {name}")
    try:
        t0 = time.time()
        m = float(jnp.mean(fn(keys, nv)))
        first = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t1 = time.time()
            m = float(jnp.mean(fn(keys, nv)))
            best = min(best, time.time() - t1)
        out["steps"][name] = {
            "first_s": round(first, 2), "best_s": round(best, 4),
            "est_per_sec": round(batch / best, 1), "mean_nmse": round(m, 6),
        }
        log(f"{name}: first={first:.1f}s best={best:.3f}s "
            f"({batch / best:.0f} est/s) NMSE={m:.5f}")
    except Exception as e:  # noqa: BLE001
        out["steps"][name] = {"error": repr(e)[:400]}
        log(f"{name} FAILED: {e!r}")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


def tracked(tr):
    pc = PointConfig(methods=("proposed",), svt_method="tracked",
                     track_rounds=tr)

    @jax.jit
    def run(keys, nv):
        return jax.vmap(lambda k: realization_errors(k, pc, nv))(keys)["proposed"]

    return run


def fused(tr):
    pc = PointConfig(methods=("proposed",), svt_method="tracked",
                     track_rounds=tr)

    @jax.jit
    def run(keys, nv):
        return fused_point_errors(keys, pc, nv, interpret=False)["proposed"]

    return run


measure("tracked_tr8_b256", tracked(8), 256)   # cached baseline
measure("tracked_tr1_b256", tracked(1), 256)
measure("tracked_tr1_b512", tracked(1), 512)
measure("tracked_tr1_b1024", tracked(1), 1024)
measure("tracked_tr2_b256", tracked(2), 256)
measure("fused_tr1_b256", fused(1), 256)
measure("fused_tr1_b512", fused(1), 512)
log("done")
