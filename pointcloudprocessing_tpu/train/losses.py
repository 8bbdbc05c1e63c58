"""Losses matching the reference's Keras compile() configuration.

Reference (pointnet_train.py:334-351): SparseCategoricalCrossentropy on the
classification and segmentation softmax outputs, MeanSquaredError on the
SE(3) head, combined with per-stage loss weights; T-Net orthogonality
regularizers (model.losses) are added to the total unweighted.

Keras numerical conventions matched: probabilities are renormalized along the
class axis then clipped to [eps, 1-eps] with eps=1e-7 before the log.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloudprocessing_tpu.core.constants import KERAS_EPSILON


def sparse_categorical_crossentropy(
    probs: jnp.ndarray, labels: jnp.ndarray
) -> jnp.ndarray:
    """Per-element negative log-likelihood from probabilities.

    probs: (..., C) softmax outputs; labels: (...) int. Returns (...) losses.

    The label pick is a one-hot contraction rather than take_along_axis:
    per-row gathers (and the scatter in their backward) lower poorly on TPU,
    while the elementwise select fuses into the surrounding program.
    """
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = jnp.clip(probs, KERAS_EPSILON, 1.0 - KERAS_EPSILON)
    # clamp labels into range (the gather formulation's XLA clamp semantics);
    # an unclamped out-of-range label would match no class and silently
    # contribute zero loss
    labels = jnp.clip(labels.astype(jnp.int32), 0, probs.shape[-1] - 1)
    classes = jax.lax.broadcasted_iota(jnp.int32, probs.shape, probs.ndim - 1)
    onehot = classes == labels[..., None]
    return -jnp.sum(jnp.where(onehot, jnp.log(probs), 0.0), axis=-1)


def mean_squared_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Keras MSE: mean over the last axis per sample; we fold the batch mean
    in at the call site (mean of means == global mean for equal sizes)."""
    return jnp.mean(jnp.square(pred - target), axis=tuple(range(1, pred.ndim)))


def multi_head_loss(
    outputs: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    loss_weights: tuple[float, float, float],
    reg_losses_sum: jnp.ndarray | float = 0.0,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Weighted multi-head training loss.

    Args:
      outputs/targets: dicts keyed by MODEL_OUTPUTS names.
      loss_weights: (classification, segmentation, rotation).
      reg_losses_sum: summed T-Net regularizers (added unweighted, matching
        Keras model.losses).

    Returns (total, {per-head unweighted losses}) — the per-head values feed
    the Keras-named history keys.
    """
    w_cls, w_seg, w_rot = loss_weights

    cls_loss = jnp.mean(
        sparse_categorical_crossentropy(
            outputs["classification_output"], targets["classification_output"]
        )
    )
    seg_loss = jnp.mean(
        sparse_categorical_crossentropy(
            outputs["segmentation_output"], targets["segmentation_output"]
        )
    )
    rot_loss = jnp.mean(mean_squared_error(outputs["se3"], targets["se3"]))

    total = w_cls * cls_loss + w_seg * seg_loss + w_rot * rot_loss + reg_losses_sum
    return total, {
        "classification_output_loss": cls_loss,
        "segmentation_output_loss": seg_loss,
        "se3_loss": rot_loss,
    }
