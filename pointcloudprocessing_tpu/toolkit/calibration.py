"""Kabsch extrinsic calibration (API parity: utils/calibration.py:3-31).

Same signature and return contract as the reference's ``solve_kabsch``;
the math dispatches to the jit-compiled JAX implementation in ops.mat_ops
and returns numpy for GUI/toolkit consumers.
"""

from __future__ import annotations

import numpy as np

from pointcloudprocessing_tpu.ops import mat_ops


def solve_kabsch(truth_vecs: np.ndarray, measured_vecs: np.ndarray):
    """SVD Kabsch alignment; returns (R (3,3), t (3,), rmse) as numpy."""
    r, t, rmse = mat_ops.solve_kabsch_jit(
        np.asarray(truth_vecs, dtype=np.float64),
        np.asarray(measured_vecs, dtype=np.float64),
    )
    return np.asarray(r), np.asarray(t), float(rmse)
