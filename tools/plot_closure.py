"""Render the constructive-closure comparison figure.

Three panels (results/parity_closure.png): the errorVSsnr.fig closure (our
quirks/0.75/T=70 curves vs the fig's committed points), the
errorVStraining_dbf.fig closure (ratio 1.0, +15 dB, T sweep), and the
round-4 errorVSdelays.fig closure (T=90, ratio 1.0, +5 dB member).  Colors are
the Okabe-Ito CVD-safe hues in fixed method order with distinct markers +
line styles as secondary encoding; reference points are open black marks.

Run: python tools/plot_closure.py
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fixed method order -> (color, marker, linestyle)
STYLE = {
    "proposed": ("#0072B2", "s", "-"),
    "vamp": ("#E69F00", "o", "--"),
    "tssr": ("#009E73", "^", "-."),
    "omp_td": ("#CC79A7", "d", ":"),
}
FIG_LABEL = {
    "proposed": "Proposed",
    "vamp": "VAMP [23]",
    "tssr": "TSSR [15]",
    "omp_td": "TD-OMP [11]",
}


def main():
    closure = json.load(open(os.path.join(REPO, "results", "parity_closure.json")))
    figs = json.load(
        open(os.path.join(REPO, "results", "reference_fig_curves.json"))
    )

    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(16, 4.2))

    # -- panel 1: errorVSsnr.fig vs quirks/0.75/T=70 ----------------------
    row = next(
        r for r in closure if r["quirks"] and r["ratio"] == 0.75 and r["T"] == 70
    )
    for m, (c, mk, ls) in STYLE.items():
        ax1.semilogy(
            row["snr_db"], row["curves"][m], color=c, marker=mk, ls=ls,
            lw=2, ms=5, label=f"{FIG_LABEL[m]} (ours)",
        )
    ref = {l["label"]: l for l in figs["errorVSsnr.fig"]}
    for m in STYLE:
        r = ref[FIG_LABEL[m]]
        ax1.semilogy(
            r["x"], r["y"], ls="none", marker="o", ms=10, mfc="none",
            mec="black", mew=1.5,
        )
    ax1.semilogy([], [], ls="none", marker="o", ms=10, mfc="none",
                 mec="black", mew=1.5, label="errorVSsnr.fig points")
    ax1.set_xlabel("SNR (dB)")
    ax1.set_ylabel("NMSE")
    ax1.set_title("errorVSsnr.fig closure\n(quirks ensemble, T=70, ratio 0.75)")
    ax1.grid(True, which="both", alpha=0.25)
    ax1.legend(fontsize=8)

    # -- panel 2: errorVStraining_dbf.fig vs ratio 1.0 / +15 dB -----------
    Ts = (10, 30, 50, 70, 90)
    by_T = {
        r["T"]: r
        for r in closure
        if not r["quirks"] and r["ratio"] == 1.0
    }
    si = row["snr_db"].index(15)
    for m in ("proposed", "vamp", "omp_td"):
        c, mk, ls = STYLE[m]
        ys = [by_T[T]["curves"][m][si] for T in Ts]
        ax2.semilogy(Ts, ys, color=c, marker=mk, ls=ls, lw=2, ms=5,
                     label=f"{FIG_LABEL[m]} (ours)")
    ref2 = {l["label"]: l for l in figs["errorVStraining_dbf.fig"]}
    for m in ("proposed", "vamp", "omp_td"):
        r = ref2[FIG_LABEL[m]]
        ax2.semilogy(r["x"], r["y"], ls="none", marker="o", ms=10,
                     mfc="none", mec="black", mew=1.5)
    ax2.semilogy([], [], ls="none", marker="o", ms=10, mfc="none",
                 mec="black", mew=1.5, label="errorVStraining_dbf.fig points")
    ax2.set_xlabel("training frames T")
    ax2.set_ylabel("NMSE")
    ax2.set_title("errorVStraining_dbf.fig closure\n(ratio 1.0 = digital BF, +15 dB)")
    ax2.grid(True, which="both", alpha=0.25)
    ax2.legend(fontsize=8)

    # -- panel 3: errorVSdelays.fig Proposed closure (round 4) ------------
    refine = json.load(
        open(os.path.join(REPO, "results", "delays_fingerprint_refine.json"))
    )
    win = next(
        r for r in refine["results"] if r["T"] == 90 and r["ratio"] == 1.0
    )
    c, mk, ls = STYLE["proposed"]
    ax3.semilogy(win["L"], win["curves"]["proposed"], color=c, marker=mk,
                 ls=ls, lw=2, ms=5, label="Proposed (ours, T=90/r1.0/+5dB)")
    cv, mkv, lsv = STYLE["vamp"]
    t70 = next(
        r for r in refine["results"] if r["T"] == 70 and r["ratio"] == 1.0
    )
    ax3.semilogy(t70["L"], t70["curves"]["vamp"], color=cv, marker=mkv,
                 ls=lsv, lw=2, ms=5, label="VAMP (ours, T=70/r1.0/+5dB)")
    ref3 = {l["label"]: l for l in figs["errorVSdelays.fig"]}
    for m in ("proposed", "vamp"):
        r = ref3[FIG_LABEL[m]]
        ax3.semilogy(r["x"], r["y"], ls="none", marker="o", ms=10,
                     mfc="none", mec="black", mew=1.5)
    ax3.semilogy([], [], ls="none", marker="o", ms=10, mfc="none",
                 mec="black", mew=1.5, label="errorVSdelays.fig points")
    ax3.set_xlabel("delay taps L")
    ax3.set_ylabel("NMSE")
    ax3.set_title("errorVSdelays.fig closure"
                  "\n(quirks, composite family members)")
    ax3.grid(True, which="both", alpha=0.25)
    ax3.legend(fontsize=8)

    fig.tight_layout()
    out = os.path.join(REPO, "results", "parity_closure.png")
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
