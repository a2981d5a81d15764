from jstsp19_tpu.utils.native import (  # noqa: F401
    native_available,
    native_fwht,
    native_sparse_conj_mult,
)
