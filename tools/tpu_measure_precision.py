"""On-chip A/B of the tracked-chain matmul precision + fused large-batch.

Measures tracked tr1 at track_precision 'highest' (6-pass bf16 = exact
f32) vs 'high' (3-pass, ~2x faster MXU) vs 'float32' alias, with an
on-chip eigh reference for per-realization NMSE agreement, plus the
fused kernel at batch 1024 (it scales with batch).  Appends to
results/tracked_rounds_tpu.json.
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

from jstsp19_tpu.core import prng
from jstsp19_tpu.harness.pipeline import (
    PointConfig, fused_point_errors, realization_errors,
)

out_path = "/root/repo/results/tracked_rounds_tpu.json"
out = json.load(open(out_path)) if os.path.exists(out_path) else {"steps": {}}
nv = jnp.asarray(1.0, jnp.float32)


def log(m):
    print(f"[prec {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def run_for(pc):
    @jax.jit
    def run(keys, nv):
        return jax.vmap(lambda k: realization_errors(k, pc, nv))(keys)["proposed"]

    return run


def measure(name, fn, batch, reps=3):
    keys = prng.realization_keys(prng.experiment_key(1), 0, batch)
    log(f"start {name}")
    try:
        t0 = time.time()
        e = np.asarray(fn(keys, nv))
        first = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t1 = time.time()
            e = np.asarray(fn(keys, nv))
            best = min(best, time.time() - t1)
        out["steps"][name] = {
            "first_s": round(first, 2), "best_s": round(best, 4),
            "est_per_sec": round(batch / best, 1),
            "mean_nmse": round(float(e.mean()), 6),
        }
        log(f"{name}: best={best:.3f}s ({batch / best:.0f} est/s) "
            f"NMSE={float(e.mean()):.5f}")
        return e
    except Exception as ex:  # noqa: BLE001
        out["steps"][name] = {"error": repr(ex)[:400]}
        log(f"{name} FAILED: {ex!r}")
        return None
    finally:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


B = 256
e_ref = measure(
    "eigh_b256", run_for(PointConfig(methods=("proposed",), svt_method="eigh")), B
)
e_hi = measure(
    "tracked_tr1_hi_b256",
    run_for(PointConfig(methods=("proposed",), svt_method="tracked")), B,
)
e_h3 = measure(
    "tracked_tr1_high3_b256",
    run_for(PointConfig(methods=("proposed",), svt_method="tracked",
                        track_precision="high")), B,
)
for nm, e in (("tracked_tr1_hi", e_hi), ("tracked_tr1_high3", e_h3)):
    if e is not None and e_ref is not None:
        d = float(np.max(np.abs(e - e_ref)))
        out["steps"][f"{nm}_vs_eigh_maxdiff"] = d
        log(f"{nm} per-realization |NMSE - eigh| max = {d:.2e}")
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)

measure(
    "fused_tr1_b1024",
    lambda k, v: fused_point_errors(
        k, PointConfig(methods=("proposed",), svt_method="tracked"), v,
        interpret=False,
    )["proposed"],
    1024,
)
log("done")
