"""NYU-Wireless ray-traced channel ingestion.

The reference loads ``basic_system_functions/nywireless_channel.mat`` — a
cell array ``Hf{...}`` of per-tap channel matrices — in
``plot_errorVSsnr_nyuwireless.m:6`` and normalizes each tap to unit
Frobenius energy scaled by the antenna count (``:59-70``).  The .mat file is
**absent from the reference repository**; this loader handles the documented
format when a file is supplied and otherwise returns None.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


def load_nyu_taps(mat_path: Optional[str]):
    """Load the ``Hf`` cell array → ndarray (n_realizations, L, Nr, Nt),
    or None if no path given / file missing."""
    if not mat_path:
        return None
    import os

    if not os.path.exists(mat_path):
        return None
    import scipy.io as sio

    m = sio.loadmat(mat_path, squeeze_me=True)
    Hf = m.get("Hf")
    if Hf is None:
        raise ValueError(f"{mat_path} has no 'Hf' variable")
    cells = np.atleast_1d(Hf)
    taps = np.stack([np.stack(list(row), axis=0) for row in cells], axis=0)
    return jnp.asarray(taps, jnp.complex64)


def normalize_taps(H: jnp.ndarray) -> jnp.ndarray:
    """Per-tap normalization of ``plot_errorVSsnr_nyuwireless.m:59-70``:
    each tap scaled to ``sqrt(Nr·Nt)`` Frobenius norm."""
    L, Nr, Nt = H.shape[-3:]
    norms = jnp.sqrt(jnp.sum(jnp.abs(H) ** 2, axis=(-2, -1), keepdims=True))
    return H / jnp.maximum(norms, 1e-30) * jnp.sqrt(Nr * Nt * 1.0)
