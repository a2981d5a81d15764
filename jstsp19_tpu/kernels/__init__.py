from jstsp19_tpu.kernels.dictionary import dict_correlation  # noqa: F401
from jstsp19_tpu.kernels.softthresh import fused_soft_threshold  # noqa: F401
from jstsp19_tpu.kernels.wht import pallas_fwht  # noqa: F401
