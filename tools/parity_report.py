"""Render the parity-campaign results into comparison tables.

Reads results/<family>_quirks.json (from tools/parity_campaign.py, with
per-realization raw errors) and results/reference_fig_curves.json (from
tools/extract_figs.py), prints a markdown table per family: our quirks
mean + [q5, q95] per sweep point and method, next to the reference fig
curve where one exists, with a bracketing verdict.

Run: python tools/parity_report.py
"""
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# family -> (our json, fig file, x mapping note, method map {ours: fig label})
FAMILIES = {
    "error_vs_delays": (
        "error_vs_delays_quirks.json", "errorVSdelays.fig",
        {"proposed": "Proposed", "vamp": "VAMP [23]",
         "omp_mmv": "TD-OMP [11]", "tssr": "TSSR [15]"},
    ),
    "error_vs_paths": (
        "error_vs_paths_quirks.json", "errorVSspatialpaths.fig",
        {"proposed": "Proposed", "vamp": "VAMP [23]",
         "omp_mmv": "TD-OMP [11]", "tssr": "TSSR [15]"},
    ),
    "error_vs_framelength": (
        "error_vs_framelength_quirks.json", "errorVStraining_dbf.fig",
        {"proposed": "Proposed", "vamp": "VAMP [23]",
         "omp_mmv": "TD-OMP [11]", "tssr": "TSSR [15]"},
    ),
    "error_vs_nt": ("error_vs_nt_quirks.json", None, {}),
    "error_vs_nrf": ("error_vs_nrf_quirks.json", None, {}),
}


def main():
    figs = json.load(
        open(os.path.join(REPO, "results", "reference_fig_curves.json"))
    )
    for fam, (ours_name, fig_name, method_map) in FAMILIES.items():
        path = os.path.join(REPO, "results", ours_name)
        if not os.path.exists(path):
            print(f"== {fam}: MISSING {ours_name}")
            continue
        ours = json.load(open(path))
        sweep_name, xs = next(iter(ours["sweep"].items()))
        raw = ours.get("raw", {})
        print(f"\n== {fam} (n_mc={ours['n_mc']}, quirks ensemble)")
        fig = {l["label"]: l for l in figs.get(fig_name, [])} if fig_name else {}
        for method, means in sorted(ours["curves"].items()):
            rows = []
            for i, x in enumerate(xs):
                cell = f"{means[i]:.4g}"
                if method in raw:
                    e = np.asarray(raw[method][i])
                    q5, q95 = np.quantile(e, [0.05, 0.95])
                    cell += f" [{q5:.3g}, {q95:.3g}]"
                rows.append(f"{sweep_name}={x:g}: {cell}")
            print(f"  {method:16s} " + " | ".join(rows))
            lbl = method_map.get(method)
            if lbl and lbl in fig:
                ref = fig[lbl]
                print(
                    f"  {'^ref ' + lbl:16s} "
                    + " | ".join(
                        f"x={rx:g}: {ry:.4g}"
                        for rx, ry in zip(ref["x"], ref["y"])
                    )
                )


if __name__ == "__main__":
    main()
