"""NaN/Inf sentinels (reference ``model/common.py:218-240``:
``check_weights`` / ``check_tensor`` — kept out of the hot loop there and
here; use these from host-side debugging hooks, not inside jit)."""

from __future__ import annotations

import logging

import numpy as np
import jax

logger_py = logging.getLogger(__name__)


def check_params(params) -> list:
    """Log any parameter leaves containing NaN; returns the bad paths."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and np.isnan(arr).any():
            name = jax.tree_util.keystr(path)
            logger_py.warning("NaN values in param %s", name)
            bad.append(name)
    return bad


def check_tensor(tensor, tensorname: str = "") -> bool:
    """Log when ``tensor`` contains NaN/Inf; returns True if it does."""
    arr = np.asarray(tensor)
    bad = bool(np.logical_not(np.isfinite(arr)).any())
    if bad:
        logger_py.warning("Tensor %s contains NaN or Inf values", tensorname)
    return bad
