"""Summarize a jax.profiler trace into committed artifacts.

Input: the trace dir written by ``python bench.py --profile``
(/tmp/jstsp19_tpu_trace).  Output:

- ``results/trace_op_stats.json`` — top device ops by self-time
  (xprof ``framework_op_stats``), with the capture context;
- ``results/trace_roofline.json`` — xprof ``roofline_model`` rows for
  the top programs.

Usage: python tools/trace_summary.py [trace_dir] [out_prefix]
(out_prefix defaults to results/trace — pass e.g. results/trace_omp_td to
keep a separate capture from clobbering the committed flagship artifacts)
"""
import glob
import json
import sys

from xprof.convert import raw_to_tool_data as rtd

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jstsp19_tpu_trace"
out_prefix = sys.argv[2] if len(sys.argv) > 2 else "results/trace"
xs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
if not xs:
    sys.exit(f"no xplane.pb under {trace_dir}")


def gviz_rows(tool):
    data, _ = rtd.xspace_to_tool_data(xs, tool, {})
    parts = json.loads(data if isinstance(data, str) else data.decode())
    for part in parts:
        if isinstance(part, dict) and part.get("rows"):
            cols = [c.get("label") for c in part["cols"]]
            rows = [
                dict(zip(cols, [c.get("v") for c in r.get("c", [])]))
                for r in part["rows"]
            ]
            return cols, rows, {k: v for k, v in part.get("p", {}).items()}
    return [], [], {}


# -- per-op self-time table ------------------------------------------------
cols, rows, meta = gviz_rows("framework_op_stats")
dev_rows = [r for r in rows if r.get("Host/device") == "Device"][:40]
keep = [
    "Rank", "Operation Type", "Operation Name", "#Occurrences",
    "Total self-time (us)", "Total self-time on Device (%)",
    "Normalized FLOP Rate (FLOPs/s)",
]
op_stats = {
    "context": f"jax.profiler capture under {trace_dir}: one steady-state "
               "batch on the TPU; xprof framework_op_stats, device ops "
               "ranked by self-time",
    "capture_meta": meta,
    "ops": [{k: r.get(k) for k in keep} for r in dev_rows],
}
with open(out_prefix + "_op_stats.json", "w") as f:
    json.dump(op_stats, f, indent=1)
tot = sum(float(r.get("Total self-time on Device (%)") or 0) for r in dev_rows)
print(f"{out_prefix}_op_stats.json: {len(dev_rows)} device ops, "
      f"{100 * tot:.1f}% of device self-time covered")

# -- roofline rows ---------------------------------------------------------
try:
    cols, rows, meta = gviz_rows("roofline_model")
    roof = {
        "context": "xprof roofline_model over the same capture",
        "capture_meta": meta,
        "rows": rows[:30],
    }
    with open(out_prefix + "_roofline.json", "w") as f:
        json.dump(roof, f, indent=1)
    print(f"{out_prefix}_roofline.json: {len(rows[:30])} rows")
except Exception as e:  # noqa: BLE001
    print("roofline_model unavailable:", repr(e)[:200])
