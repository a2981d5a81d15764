"""Command-line entry: run experiment recipes.

Usage:
  python -m jstsp19_tpu list
  python -m jstsp19_tpu run error_vs_snr --n-mc 64 --seed 0 --out results
  python -m jstsp19_tpu run all --n-mc 16
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="jstsp19_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list experiment recipes")
    runp = sub.add_parser("run", help="run an experiment recipe")
    runp.add_argument("experiment")
    runp.add_argument("--n-mc", type=int, default=8)
    runp.add_argument("--seed", type=int, default=0)
    runp.add_argument("--out", default="results")
    runp.add_argument("--no-plot", action="store_true")
    runp.add_argument("--cpu", action="store_true", help="force the CPU backend")
    runp.add_argument(
        "--checkpoint-dir",
        default=None,
        help="journal per-point results here and resume completed points",
    )
    runp.add_argument(
        "--checkpoint-backend",
        default="json",
        choices=("json", "orbax"),
        help="json = per-point means; orbax = full per-realization arrays",
    )
    runp.add_argument(
        "--mat-path",
        default=None,
        help="NYU-Wireless channel .mat for error_vs_snr_nyuwireless",
    )
    args = parser.parse_args(argv)

    if args.cmd == "list":
        from jstsp19_tpu.harness import EXPERIMENTS

        for name, fn in sorted(EXPERIMENTS.items()):
            doc = (fn.__doc__ or "").strip().splitlines()[0]
            print(f"{name:28s} {doc}")
        return 0

    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from jstsp19_tpu.harness import EXPERIMENTS
    from jstsp19_tpu.harness.artifacts import save_result

    if args.checkpoint_dir:
        from jstsp19_tpu.harness.runner import set_default_checkpoint

        set_default_checkpoint(args.checkpoint_dir, args.checkpoint_backend)

    names = (
        sorted(EXPERIMENTS) if args.experiment == "all" else [args.experiment]
    )
    for name in names:
        if name not in EXPERIMENTS:
            print(f"unknown experiment {name!r}; try `list`", file=sys.stderr)
            return 1
        kwargs = {"n_mc": args.n_mc, "seed": args.seed}
        if args.mat_path and name == "error_vs_snr_nyuwireless":
            kwargs["mat_path"] = args.mat_path
        res = EXPERIMENTS[name](**kwargs)
        path = save_result(res, args.out, plot=not args.no_plot)
        print(f"[{name}] wrote {path} ({res.seconds:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
