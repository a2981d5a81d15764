from jstsp19_tpu.utils.native import (  # noqa: F401
    native_available,
    native_fwht,
    native_sparse_conj_mult,
)
from jstsp19_tpu.utils.distributions import (  # noqa: F401
    DisDist,
    weibull_grid,
)
