from jstsp19_tpu.core.config import SystemConfig, canonical_system  # noqa: F401
from jstsp19_tpu.core.metrics import nmse, clamped_nmse  # noqa: F401
