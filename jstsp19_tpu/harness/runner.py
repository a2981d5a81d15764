"""Sweep runner: Monte-Carlo batches under jit/vmap, optionally sharded
over a device mesh.

The reference parallelizes with a MATLAB PCT ``parfor`` over realizations
(`plot_errorVSsnr_approx.m:41`); here one compiled executable evaluates the
whole realization batch (vmap), and the batch axis is sharded over the
``mc`` mesh axis with a NamedSharding so the same code runs 1-chip or
N-chip — reduction to the curve mean happens on device.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jstsp19_tpu.core import prng
from jstsp19_tpu.harness.pipeline import PointConfig, realization_errors


@dataclasses.dataclass
class SweepResult:
    name: str
    sweep_name: str
    sweep_values: List
    curves: Dict[str, List[float]]  # method -> mean metric per sweep point
    n_mc: int
    seconds: float
    extras: Dict = dataclasses.field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "experiment": self.name,
                "sweep": {self.sweep_name: list(map(float, self.sweep_values))},
                "n_mc": self.n_mc,
                "curves": {k: list(map(float, v)) for k, v in self.curves.items()},
                "seconds": self.seconds,
                **{k: v for k, v in self.extras.items() if _jsonable(v)},
            },
            indent=2,
        )


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


@functools.lru_cache(maxsize=None)
def _compiled_point(pc: PointConfig):
    """Batched, jitted evaluation of one sweep point: (keys, noise_var) →
    {method: per-realization NMSE}."""

    @jax.jit
    def run(keys, noise_var):
        return jax.vmap(lambda k: realization_errors(k, pc, noise_var))(keys)

    return run


def default_mesh(axis: str = "mc") -> Optional[Mesh]:
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), (axis,))


def run_point(
    pc: PointConfig,
    noise_var: float,
    n_mc: int,
    seed: int = 0,
    sweep_index: int = 0,
    mesh: Optional[Mesh] = None,
) -> Dict[str, np.ndarray]:
    """Evaluate one sweep point over n_mc realizations (device-sharded)."""
    root = prng.experiment_key(seed)
    keys = prng.realization_keys(root, sweep_index, n_mc)
    if mesh is not None:
        n_dev = mesh.devices.size
        if n_mc % n_dev:
            raise ValueError(f"n_mc={n_mc} must divide over {n_dev} devices")
        keys = jax.device_put(keys, NamedSharding(mesh, P(mesh.axis_names[0])))
    out = _compiled_point(pc)(keys, jnp.asarray(noise_var, jnp.float32))
    return {k: np.asarray(v) for k, v in out.items()}


def run_sweep(
    name: str,
    sweep_name: str,
    sweep_values: Sequence,
    point_fn: Callable[[object], PointConfig],
    noise_fn: Callable[[object], float],
    n_mc: int = 8,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
) -> SweepResult:
    """Run a full sweep: for each sweep value, build the PointConfig, run the
    MC batch, and average each method's metric (the reference's
    ``mean(error_*)`` reduction, ``plot_errorVSsnr.m:170-178``).

    ``checkpoint_dir``: if given, per-point results are journaled there and
    completed points are skipped on re-run (sweep-level resume — the
    checkpoint/resume capability the reference lacks, SURVEY.md §5).
    """
    import os

    t0 = time.time()
    curves: Dict[str, List[float]] = {}
    for i, val in enumerate(sweep_values):
        ckpt = (
            os.path.join(checkpoint_dir, f"{name}.{sweep_name}.{i}.json")
            if checkpoint_dir
            else None
        )
        if ckpt and os.path.exists(ckpt):
            with open(ckpt) as f:
                point = json.load(f)
        else:
            pc = point_fn(val)
            nv = noise_fn(val)
            out = run_point(pc, nv, n_mc, seed=seed, sweep_index=i, mesh=mesh)
            point = {m: float(np.mean(errs)) for m, errs in out.items()}
            if ckpt:
                os.makedirs(checkpoint_dir, exist_ok=True)
                with open(ckpt, "w") as f:
                    json.dump(point, f)
        for m, mean_err in point.items():
            curves.setdefault(m, []).append(mean_err)
        if verbose:
            msg = ", ".join(f"{m}={point[m]:.4g}" for m in sorted(point))
            print(f"[{name}] {sweep_name}={val}: {msg}")
    return SweepResult(
        name=name,
        sweep_name=sweep_name,
        sweep_values=list(sweep_values),
        curves=curves,
        n_mc=n_mc,
        seconds=time.time() - t0,
    )
