"""Iterative Closest Point (point-to-point) registration.

The reference's SemanticMeshICP GUI view (gui/SemanticMeshICP.py:10-48) is
named for ICP but ships no solver (display stub only — SURVEY §2 T2). This
module supplies the real thing, TPU-style: a fixed-iteration
``lax.fori_loop`` of (nearest-neighbor correspondence -> Kabsch -> compose),
fully jit-compatible with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudprocessing_tpu.ops.knn import knn
from pointcloudprocessing_tpu.ops.mat_ops import solve_kabsch


def icp(
    source: jnp.ndarray,
    target: jnp.ndarray,
    iterations: int = 20,
    exact_nn: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Align ``source`` to ``target``.

    Args:
      source: (n, 3) cloud to move.
      target: (m, 3) fixed cloud.
      iterations: fixed ICP iteration count (static for jit).
      exact_nn: exact nearest neighbors (True) or approx_min_k.

    Returns (R (3,3), t (3,), rmse) such that ``source @ R.T + t ~= target``.
    """
    source = jnp.asarray(source, dtype=jnp.result_type(float))
    target = jnp.asarray(target, dtype=source.dtype)

    def body(_, carry):
        r, t, _ = carry
        # HIGHEST: applying R at TPU-default bf16 matmul precision injects
        # ~4e-3 relative coordinate noise — far above calibration scale
        moved = jnp.matmul(source, r.T, precision=jax.lax.Precision.HIGHEST) + t
        idx, _d = knn(moved, target, 1, exact=exact_nn)
        matched = target[idx[:, 0]]
        r_new, t_new, rmse = solve_kabsch(matched, source)
        return r_new, t_new, rmse

    r0 = jnp.eye(3, dtype=source.dtype)
    t0 = jnp.zeros(3, dtype=source.dtype)
    return jax.lax.fori_loop(0, iterations, body, (r0, t0, jnp.asarray(jnp.inf, source.dtype)))
