"""One-shot TPU validation of the fused Pallas ADMM (kernels/admm_fused.py).

Single warm process (relay contact is expensive): tracked-SVT baseline at
batch 32 (cached executable), then the fused kernel at batch 32 for an
NMSE-equality check, then fused throughput at batch 256.  Writes findings
to stderr and a JSON summary to results/fused_kernel_tpu.json.
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

out = {"device": jax.devices()[0].device_kind, "steps": {}}
nv = jnp.asarray(1.0, jnp.float32)
pc = PointConfig(methods=("proposed",), svt_method="tracked")


def log(msg):
    print(f"[validate {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timed(fn, keys, reps=3):
    t0 = time.time()
    m = float(jnp.mean(fn(keys, nv)))
    first = time.time() - t0
    best = float("inf")
    for r in range(reps):
        t1 = time.time()
        m = float(jnp.mean(fn(keys, nv)))
        best = min(best, time.time() - t1)
    return first, best, m


@jax.jit
def run_tracked(keys, nv):
    return jax.vmap(lambda k: realization_errors(k, pc, nv))(keys)["proposed"]


@jax.jit
def run_fused(keys, nv):
    return fused_point_errors(keys, pc, nv, interpret=False)["proposed"]


for name, fn, batch in [
    ("tracked_b32", run_tracked, 32),
    ("pallas_b32", run_fused, 32),
    ("pallas_b256", run_fused, 256),
    ("tracked_b256", run_tracked, 256),
    ("pallas_b512", run_fused, 512),
]:
    keys = prng.realization_keys(prng.experiment_key(1), 0, batch)
    log(f"start {name}")
    try:
        first, best, m = timed(fn, keys)
        out["steps"][name] = {
            "first_s": round(first, 2),
            "best_s": round(best, 4),
            "est_per_sec": round(batch / best, 1),
            "mean_nmse": round(m, 6),
        }
        log(f"{name}: first={first:.1f}s best={best:.3f}s "
            f"({batch / best:.0f} est/s) NMSE={m:.5f}")
    except Exception as e:  # noqa: BLE001
        out["steps"][name] = {"error": repr(e)[:500]}
        log(f"{name} FAILED: {e!r}")
    with open("/root/repo/results/fused_kernel_tpu.json", "w") as f:
        json.dump(out, f, indent=1)

log("done")
