"""Per-estimator batched TPU throughput — the ``plot_time_comparisions.m`` analog.

The reference tic/tocs every estimator once per realization at the canonical
errorVSsnr configuration (``plot_time_comparisions.m:78-121``: LS, single
kron-dictionary OMP, VAMP, CoSaMP, MMV-OMP, proposed, proposed+angles).  On
an accelerator the production metric is batched throughput, so this runs
each estimator family as one compiled batch of Monte-Carlo realizations
(channel + frontend + solver + NMSE, exactly the bench.py methodology) and
reports estimations/second per family.

Artifact: results/time_comparisons_tpu_batched.json; summary table on
stderr.  Run each family under the persistent compile cache; novel shapes
risk a slow remote compile on a degraded relay — run under ``timeout`` in
background (CLAUDE.md).

Run:  python bench_all.py [--batch 256] [--cpu] [--methods m1,m2,...]
"""
import argparse
import json
import os
import sys
import time

import jax

from jstsp19_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

METHODS = (
    "ls", "vamp", "omp_mmv", "omp_td", "svt", "tssr", "mc_admm",
    "proposed", "proposed_angles",
)
# conservative single-workstation MATLAB estimate at the flagship config
# (bench.py docstring) — the denominator of every vs_matlab ratio
MATLAB_EST_PER_SEC = 1.0


def _mc_admm_errors(key, noise_var):
    """SVT-ADMM matrix completion of the masked observation (``mc_admm.m``):
    complete Y from Ω∘Y, then LS de-mix — the mc_admm baseline family."""
    import jax.numpy as jnp

    from jstsp19_tpu.core.metrics import clamped_nmse
    from jstsp19_tpu.harness.pipeline import PointConfig, _proposed_frontend
    from jstsp19_tpu.solvers import ls_estimate
    from jstsp19_tpu.solvers.lowrank import mc_admm

    pc = PointConfig()
    ch, obs, A_p, B_p, tau_Y, tau_S, rho = _proposed_frontend(
        key, pc, noise_var
    )
    X, _ = mc_admm(obs.Y_full, obs.Y, obs.Omega, pc.Imax, tau_Y, rho,
                   svt_method="tracked")
    return clamped_nmse(ls_estimate(X, A_p, B_p), ch.Zbar)


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--methods", default=",".join(METHODS))
    p.add_argument(
        "--out", default="results/time_comparisons_tpu_batched.json"
    )
    ns = p.parse_args()
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from jstsp19_tpu.core import prng
    from jstsp19_tpu.harness.pipeline import (
        fastest_point_config, realization_errors,
    )

    noise_var = jnp.asarray(1.0, jnp.float32)  # SNR 0 dB, as bench.py
    # partial --methods runs merge into an existing artifact
    rows = {}
    if os.path.exists(ns.out):
        try:
            with open(ns.out) as f:
                rows = json.load(f).get("methods", {})
        except (json.JSONDecodeError, OSError):
            rows = {}
    for method in ns.methods.split(","):
        if method == "mc_admm":
            run = jax.jit(jax.vmap(_mc_admm_errors, in_axes=(0, None)))
        else:
            pc = fastest_point_config(method)

            def run_fn(keys, nv, pc=pc, method=method):
                return jax.vmap(
                    lambda k: realization_errors(k, pc, nv)
                )(keys)[method]

            run = jax.jit(run_fn)

        keys = prng.realization_keys(prng.experiment_key(0), 0, ns.batch)
        t0 = time.time()
        nmse0 = float(jnp.mean(run(keys, noise_var)))
        t_first = time.time() - t0
        best = float("inf")
        for r in range(ns.reps):
            keys_r = prng.realization_keys(prng.experiment_key(r + 1), 0, ns.batch)
            t1 = time.time()
            # host transfer inside the timed section (axon sync quirk)
            float(jnp.mean(run(keys_r, noise_var)))
            best = min(best, time.time() - t1)
        est_per_sec = ns.batch / best
        rows[method] = dict(
            est_per_sec=round(est_per_sec, 1),
            vs_matlab=round(est_per_sec / MATLAB_EST_PER_SEC, 1),
            best_batch_seconds=round(best, 4),
            first_incl_compile_s=round(t_first, 2),
            mean_nmse_0db=round(nmse0, 5),
            # per-row provenance: partial --methods runs merge into the
            # artifact, so the batch/device a row was measured at lives on
            # the row itself (top-level fields describe the LAST run only)
            batch=ns.batch,
            device=jax.devices()[0].device_kind,
        )
        print(
            f"[bench_all] {method:16s} {est_per_sec:9.1f} est/s "
            f"(best {best:.3f}s/b{ns.batch}, first {t_first:.1f}s, "
            f"NMSE@0dB {nmse0:.4f})",
            file=sys.stderr, flush=True,
        )
        payload = dict(
            batch=ns.batch,
            reps=ns.reps,
            device=jax.devices()[0].device_kind,
            backend=jax.default_backend(),
            config="canonical errorVSsnr (Imax=100, paper-model ensemble, "
                   "0 dB); every SVT-bearing family (proposed*, svt, tssr, "
                   "mc_admm) runs svt_method='tracked' (ops/tracked.py)",
            matlab_reference_est_per_sec=MATLAB_EST_PER_SEC,
            note="batched throughput: one compiled batch per family "
                 "(channel+frontend+solver+NMSE), best of reps, host "
                 "transfer in the timed section",
            methods=rows,
        )
        with open(ns.out, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps({"artifact": ns.out, "methods": len(rows)}))


if __name__ == "__main__":
    main()
