"""Failure-detection utilities.

The reference's approach is NaN tripwires that dump tensors and raise
(renderer.py:1637-1641, 1890-1906).  The TPU-native equivalents:
* ``check_finite_tree``: host-side check of a pytree (used by the trainer
  when ``NUNERF_DEBUG_NAN=1``), raising with the offending leaf path;
* under jit, ``jax.debug_nans`` can be enabled globally via the same flag.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def debug_nan_enabled() -> bool:
    return os.environ.get("NUNERF_DEBUG_NAN", "0") == "1"


def check_finite_tree(tree, name: str = "tree"):
    """Raise FloatingPointError naming the first non-finite leaf."""
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            keystr = jax.tree_util.keystr(path)
            bad = int(np.sum(~np.isfinite(arr)))
            raise FloatingPointError(
                f"non-finite values in {name}{keystr}: {bad}/{arr.size} bad, "
                f"shape {arr.shape}")


def maybe_enable_debug_nans():
    if debug_nan_enabled():
        jax.config.update("jax_debug_nans", True)
