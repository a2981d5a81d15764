"""The gampShowHist-analog visualizer renders a PNG from a real history."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_show_hist_renders(tmp_path):
    from show_hist import _demo_history, plot_gamp_history

    hist, x, z = _demo_history(n=64, m=32, k=4)
    out = tmp_path / "hist.png"
    plot_gamp_history(hist, x_true=x, z_true=z, out_path=str(out))
    assert out.exists() and out.stat().st_size > 10_000
    # histories must carry the stop mask so frozen iterations are not
    # rendered as step rejections
    assert "stopped" in hist
    assert np.asarray(hist["xhat"]).shape[0] == 60
