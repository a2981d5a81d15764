"""Extract curve data from the reference's committed MATLAB ``.fig`` artifacts.

A ``.fig`` is a MAT file holding an ``hgS_070000`` handle-graphics struct;
line objects live in the children tree with ``XData``/``YData`` properties
and (usually) a ``DisplayName``.  This walks the tree and dumps every line
to ``results/reference_fig_curves.json`` — the ground-truth numbers for the
NMSE parity campaign (BASELINE.md / PARITY.md).

Run: python tools/extract_figs.py [/root/reference/results] [out.json]
"""
import json
import os
import sys

import numpy as np
import scipy.io as sio


def _walk(obj, lines):
    """Collect (type, DisplayName, XData, YData) from the hg struct tree."""
    if isinstance(obj, np.ndarray):
        for o in np.atleast_1d(obj).ravel():
            _walk(o, lines)
        return
    t = getattr(obj, "type", None)
    props = getattr(obj, "properties", None)
    if t is not None and "graph2d" in str(t) or str(t) == "line":
        x = getattr(props, "XData", None) if props is not None else None
        y = getattr(props, "YData", None) if props is not None else None
        name = getattr(props, "DisplayName", "") if props is not None else ""
        if x is not None and y is not None:
            lines.append(
                {
                    "label": str(name),
                    "x": np.atleast_1d(np.asarray(x, float)).tolist(),
                    "y": np.atleast_1d(np.asarray(y, float)).tolist(),
                }
            )
    for child_attr in ("children", "Children"):
        ch = getattr(obj, child_attr, None)
        if ch is not None:
            _walk(ch, lines)


def _extract_v73(fig_path):
    """MATLAB ≥v7.3 .fig (HDF5): line objects are `#refs#` groups carrying
    XData/YData/DisplayName datasets (uint16-coded strings)."""
    import h5py

    lines = []
    with h5py.File(fig_path, "r") as f:
        refs = f.get("#refs#")
        if refs is None:
            return lines
        for k, g in refs.items():
            if not isinstance(g, h5py.Group):
                continue
            if "XData" not in g or "YData" not in g:
                continue
            name = ""
            if "DisplayName" in g:
                raw = np.asarray(g["DisplayName"]).ravel()
                if raw.dtype.kind in "ui":
                    name = "".join(chr(c) for c in raw)
            lines.append(
                {
                    "label": name,
                    "x": np.asarray(g["XData"], float).ravel().tolist(),
                    "y": np.asarray(g["YData"], float).ravel().tolist(),
                }
            )
    return lines


def extract(fig_path):
    try:
        d = sio.loadmat(fig_path, squeeze_me=True, struct_as_record=False)
    except NotImplementedError:  # v7.3 → HDF5
        return _extract_v73(fig_path)
    lines = []
    _walk(d["hgS_070000"], lines)
    return lines


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/results"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "results",
                          "reference_fig_curves.json")
    )
    out = {}
    for f in sorted(os.listdir(src)):
        if not f.endswith(".fig"):
            continue
        try:
            out[f] = extract(os.path.join(src, f))
        except Exception as e:  # noqa: BLE001 — report and continue
            out[f] = {"error": str(e)}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    for f, lines in out.items():
        if isinstance(lines, dict):
            print(f, "ERROR", lines["error"])
        else:
            print(f, [(l["label"], len(l["x"])) for l in lines])


if __name__ == "__main__":
    main()
