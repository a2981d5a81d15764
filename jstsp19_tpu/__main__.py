"""Command-line entry: run experiment recipes.

Usage:
  python -m jstsp19_tpu list
  python -m jstsp19_tpu run error_vs_snr --n-mc 64 --seed 0 --out results
  python -m jstsp19_tpu run all --n-mc 16
  python -m jstsp19_tpu demo            # list the worked demos
  python -m jstsp19_tpu demo snipe      # run one (the GUI/ analog:
                                        # an interactive demo launcher)
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="jstsp19_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list experiment recipes")
    demop = sub.add_parser(
        "demo",
        help="list / run the worked solver demos (examples/) — the "
        "capability analog of the reference's GUI demo launcher",
    )
    demop.add_argument("name", nargs="?", default=None)
    demop.add_argument("--tpu", action="store_true",
                       help="run on the TPU backend (default: CPU)")
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

    if args.cmd == "demo":
        # GUI-analog demo launcher (reference `GUI/` capability: browse and
        # launch per-solver demos). Demos live in examples/ as standalone
        # scripts; each takes --cpu.
        import os
        import subprocess

        ex_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
        )
        demos = sorted(
            f[:-3] for f in os.listdir(ex_dir)
            if f.endswith(".py") and not f.startswith("_")
        )
        if args.name is None:
            print("worked demos (run: python -m jstsp19_tpu demo <name>):")
            for d in demos:
                with open(os.path.join(ex_dir, f"{d}.py")) as fh:
                    first = fh.readline().strip().strip('"').rstrip(".")
                print(f"  {d:26s} {first}")
            return 0
        if args.name not in demos:
            print(f"unknown demo {args.name!r}; run `demo` to list",
                  file=sys.stderr)
            return 1
        cmd = [sys.executable, os.path.join(ex_dir, f"{args.name}.py")]
        if not args.tpu:
            cmd.append("--cpu")
        return subprocess.run(cmd).returncode

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
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. `... list | head`
        sys.exit(0)
