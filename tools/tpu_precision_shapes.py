"""Validate ``track_precision='default'`` on non-canonical shapes (on-chip).

PERF.md r3 measured 'default' (single-pass bf16) at 3527 est/s (+4.6% over
'high') with canonical-config NMSE equal to eigh, but parked it pending
evidence on other shapes (VERDICT r3 #3c).  This runs the three
non-canonical sweep extremes — delays (L=10, T=25), nt (Nt=16, T=25, FFT)
and nrf (Mr=16, T=5) — with the tracked-SVT chain at 'default' and 'high'
against the eigh-SVT oracle on the SAME realizations, and reports the
per-realization NMSE agreement.

Artifact: results/precision_shapes_tpu.json.
Run:  python tools/tpu_precision_shapes.py [--cpu] [--n-mc 32]
(novel shapes → possible slow remote compiles on a degraded relay; run
under timeout in background.)
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


def log(m):
    print(f"[precshape {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--n-mc", type=int, default=32)
    ns = p.parse_args()
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from jstsp19_tpu.core import prng
    from jstsp19_tpu.harness.pipeline import PointConfig, realization_errors

    # the sweep extremes with the most non-canonical geometry, at their
    # drivers' literal noise variances (harness/experiments.py)
    CONFIGS = {
        "delays_L10_T25": (
            dict(L=10, T=25, num_nonzero=50), 10 ** (-5 / 10)),
        "nt_Nt16_T25": (
            dict(Nt=16, Gt=16, T=25, num_nonzero=50, beamformer="fft"),
            10 ** (-15 / 10)),
        "nrf_Mr16_T5": (dict(Mr=16, T=5), 10 ** (-5 / 10)),
        "canonical_0db": (dict(), 1.0),
    }
    METHODS = ("proposed", "proposed_angles")

    rows = {}
    for name, (kwargs, nv) in CONFIGS.items():
        nvj = jnp.asarray(nv, jnp.float32)
        keys = prng.realization_keys(prng.experiment_key(0), 0, ns.n_mc)
        per_variant = {}
        for variant, pckw in (
            ("eigh", dict(svt_method="eigh")),
            ("tracked_high", dict(svt_method="tracked", track_precision="high")),
            ("tracked_default", dict(svt_method="tracked",
                                     track_precision="default")),
        ):
            pc = PointConfig(methods=METHODS, **kwargs, **pckw)
            t0 = time.time()
            # pass the noise variance as an argument (a closure-captured
            # device scalar becomes a traced constant whose host fetch can
            # fail through the relay)
            out = jax.jit(
                jax.vmap(lambda k, nv_: realization_errors(k, pc, nv_),
                         in_axes=(0, None))
            )(keys, nvj)
            out = {m: np.asarray(v) for m, v in out.items()}
            log(f"{name}/{variant}: {time.time()-t0:.1f}s "
                f"mean={out['proposed'].mean():.4f}")
            per_variant[variant] = out
        row = {}
        for m in METHODS:
            ref = per_variant["eigh"][m]
            row[m] = {
                v: dict(
                    mean_nmse=round(float(per_variant[v][m].mean()), 6),
                    mean_abs_diff_vs_eigh=round(
                        float(np.abs(per_variant[v][m] - ref).mean()), 8),
                    max_abs_diff_vs_eigh=round(
                        float(np.abs(per_variant[v][m] - ref).max()), 8),
                )
                for v in per_variant
            }
        rows[name] = dict(noise_var=nv, **row)
        _write(rows, ns)

    _write(rows, ns)
    print(json.dumps({"artifact": PATH}))


PATH = "/root/repo/results/precision_shapes_tpu.json"


def _write(rows, ns):
    import jax

    out = dict(
        n_mc=ns.n_mc,
        device=jax.devices()[0].device_kind,
        backend=jax.default_backend(),
        note="per-realization clamped NMSE agreement of the tracked-SVT "
             "chain at matmul precision 'default' (1-pass bf16) and 'high' "
             "(3-pass) vs the eigh-SVT oracle, same keys",
        configs=rows,
    )
    with open(PATH, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
