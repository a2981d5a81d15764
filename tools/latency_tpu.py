"""Per-realization LATENCY on-chip — the ``plot_time_comparisions.m`` axis.

The reference tic/tocs ONE realization at a time
(`plot_time_comparisions.m:78-121`); bench_all.py measures batched
THROUGHPUT.  This tool closes the remaining axis: controlled small-batch
latency per estimator family — one compiled executable per (family,
batch), warm process, best-of-reps wall time around a host transfer
(axon sync recipe), batch ∈ {1, 4, 32}.  For the flagship it also runs
the fused Pallas kernel (`svt_method='pallas'`), whose hypothesized
advantage is exactly this regime (PERF.md:233): per-realization
VMEM-resident state vs the XLA scan's per-op HBM round-trips.

Artifact: results/latency_tpu.json (merged incrementally so a relay
stall loses nothing).  Run under ``timeout`` in background (CLAUDE.md).

Run:  python tools/latency_tpu.py [--batches 1,4,32] [--methods ...] [--cpu]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

from jstsp19_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

# VERDICT-priority order: the fused-vs-XLA flagship question first, then
# the baseline families (each novel shape risks a slow remote compile on
# a degraded relay — incremental artifact writes keep partial progress)
METHODS = (
    "proposed", "proposed_pallas", "ls", "omp_mmv", "tssr", "svt",
    "vamp", "mc_admm", "omp_td",
)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batches", default="1,4,32")
    ap.add_argument("--methods", default=",".join(METHODS))
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "results", "latency_tpu.json"))
    ns = ap.parse_args()
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from jstsp19_tpu.core import prng
    from jstsp19_tpu.harness.pipeline import (
        PointConfig,
        fastest_point_config,
        fused_point_errors,
        realization_errors,
    )
    from bench_all import _mc_admm_errors

    noise_var = jnp.asarray(1.0, jnp.float32)  # 0 dB, as bench.py
    rows = {}
    if os.path.exists(ns.out):
        try:
            with open(ns.out) as f:
                rows = json.load(f).get("rows", {})
        except (json.JSONDecodeError, OSError):
            rows = {}

    def make_run(method):
        if method == "proposed_pallas":
            pc = PointConfig(methods=("proposed",), svt_method="tracked")
            interp = jax.default_backend() != "tpu"
            return jax.jit(
                lambda keys, nv: fused_point_errors(
                    keys, pc, nv, interpret=interp
                )["proposed"]
            )
        if method == "mc_admm":
            return jax.jit(jax.vmap(_mc_admm_errors, in_axes=(0, None)))
        pc = fastest_point_config(method)
        return jax.jit(
            lambda keys, nv, pc=pc, m=method: jax.vmap(
                lambda k: realization_errors(k, pc, nv)
            )(keys)[m]
        )

    for method in ns.methods.split(","):
        run = make_run(method)
        for batch in [int(b) for b in ns.batches.split(",")]:
            tag = f"{method}@b{batch}"
            keys = prng.realization_keys(prng.experiment_key(0), 0, batch)
            t0 = time.time()
            nmse0 = float(jnp.mean(run(keys, noise_var)))
            t_first = time.time() - t0
            best = float("inf")
            for r in range(ns.reps):
                keys_r = prng.realization_keys(
                    prng.experiment_key(r + 1), 0, batch
                )
                t1 = time.time()
                # host transfer in the timed section (axon sync recipe)
                float(jnp.mean(run(keys_r, noise_var)))
                best = min(best, time.time() - t1)
            rows[tag] = dict(
                method=method,
                batch=batch,
                latency_ms=round(best * 1e3, 3),
                per_realization_ms=round(best / batch * 1e3, 3),
                first_incl_compile_s=round(t_first, 2),
                mean_nmse_0db=round(nmse0, 5),
                device=jax.devices()[0].device_kind,
            )
            print(
                f"[latency] {tag:24s} {best * 1e3:9.2f} ms/call "
                f"({best / batch * 1e3:8.2f} ms/realization, first {t_first:.1f}s)",
                file=sys.stderr, flush=True,
            )
            payload = dict(
                reps=ns.reps,
                backend=jax.default_backend(),
                config="canonical errorVSsnr configs (fastest_point_config "
                       "per family; proposed Imax=100); latency = best "
                       "single-dispatch wall time incl. host fetch of the "
                       "batch-mean NMSE",
                reference="plot_time_comparisions.m:78-121 per-realization "
                          "tic/toc (single workstation MATLAB)",
                rows=rows,
            )
            os.makedirs(os.path.dirname(ns.out), exist_ok=True)
            with open(ns.out, "w") as f:
                json.dump(payload, f, indent=1)
    print(json.dumps({"artifact": ns.out, "rows": len(rows)}))


if __name__ == "__main__":
    main()
