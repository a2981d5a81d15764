from jstsp19_tpu.harness.pipeline import PointConfig, realization_errors  # noqa: F401
from jstsp19_tpu.harness.runner import run_sweep, SweepResult  # noqa: F401
from jstsp19_tpu.harness.experiments import EXPERIMENTS, get_experiment  # noqa: F401
