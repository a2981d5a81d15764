"""Device-mesh construction helpers.

Mesh axes for this workload (SURVEY.md §2.6):
  dp — data parallel over Monte-Carlo channel realizations
  sp — sequence parallel over the training-frame axis T
  tp — tensor parallel over the beamspace grid axis Gr

The reference's only parallelism is a host-side ``parfor`` process pool over
realizations; here all three axes are XLA-sharded with on-device collectives
(psum / all_gather over ICI).  There is no pipeline or expert axis in this
workload — the solver iteration is a short sequential chain of small ops (no
layer stack to pipeline) and there are no conditional experts.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int) -> Tuple[int, int, int]:
    """Factor n_devices into (dp, sp, tp), preferring dp (the embarrassingly
    parallel axis), then sp, then tp."""
    if n_devices <= 0:
        raise ValueError("need at least one device")
    dp, sp, tp = 1, 1, 1
    n = n_devices
    # give tp and sp at most a factor of 2 each unless n is large
    for target in ("tp", "sp"):
        if n % 2 == 0 and n > 1:
            if target == "tp":
                tp = 2
            else:
                sp = 2
            n //= 2
    dp = n
    assert dp * sp * tp == n_devices
    return dp, sp, tp


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, str, str] = ("dp", "sp", "tp"),
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    dp, sp, tp = mesh_shape_for(n)
    grid = np.array(devs[:n]).reshape(dp, sp, tp)
    return Mesh(grid, axis_names)
