"""T-Net: learned KxK feature transform.

Parity target: ``pointnet/PointNet.py:379-490`` (current model) and the
legacy variant in ``pointnet/PointNetClassifier.py:264-331``:

- conv(64, 128, 1024) -> global max over points -> dense(512) -> dense(256)
  -> ``X @ w + b`` reshaped to (K, K).
- ``w``: (256, K^2) GlorotUniform in the current model (PointNet.py:415),
  zeros in the legacy one (PointNetClassifier.py:292).
- ``b``: (K, K) identity init (PointNet.py:416) — so an untrained T-Net is
  the identity transform.
- Current-model conv layers carry BN + ReLU (ConvLayer defaults,
  PointNet.py:406-408); legacy conv layers have neither
  (PointNetClassifier.py:283-285 with apply_bn/activation defaults).
- Optional orthogonality regularizer ``1e-3 * l2_loss(I - X X^T)`` where
  ``l2_loss(t) = sum(t^2) / 2`` summed over the batch (PointNet.py:447-451);
  surfaced through the ``reg_losses`` flax collection (the JAX equivalent of
  Keras ``add_loss``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pointcloudprocessing_tpu.core.constants import KERAS_BN_MOMENTUM
from pointcloudprocessing_tpu.models.layers import (
    DenseBlock,
    PointwiseBlock,
    PooledPointwiseBlock,
)


def _identity_kxk(key, shape, dtype=jnp.float32):
    del key
    k = shape[0]
    return jnp.eye(k, dtype=dtype)


class TNet(nn.Module):
    k: int
    add_regularization: bool = False
    bn_momentum: float = KERAS_BN_MOMENTUM
    layer_widths: tuple[int, ...] = (64, 128, 1024, 512, 256)
    # Legacy (PointNetClassifier) TNet: conv blocks without BN/ReLU and w
    # initialized to zeros. The current model uses BN+ReLU convs and Glorot w.
    conv_apply_bn: bool = True
    conv_activation: Optional[str] = "relu"
    w_init_zeros: bool = False
    dtype: Optional[jnp.dtype] = None
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool, frozen: bool = False) -> jnp.ndarray:
        """x: (b, n, k) -> (b, k, k) transform matrix."""
        widths = self.layer_widths

        h = PointwiseBlock(
            widths[0], apply_bn=self.conv_apply_bn, bn_momentum=self.bn_momentum,
            activation=self.conv_activation, dtype=self.dtype, name="conv_layer_1",
        )(x, train=train, frozen=frozen)
        h = PointwiseBlock(
            widths[1], apply_bn=self.conv_apply_bn, bn_momentum=self.bn_momentum,
            activation=self.conv_activation, dtype=self.dtype, name="conv_layer_2",
        )(h, train=train, frozen=frozen)
        if self.conv_apply_bn and self.conv_activation == "relu":
            # fused conv+BN+relu+max custom-VJP path: the (b, n, 1024)
            # activation never backs gradients through HBM
            h = PooledPointwiseBlock(
                widths[2], bn_momentum=self.bn_momentum, dtype=self.dtype,
                allow_pallas=self.allow_pallas, name="conv_layer_3",
            )(h, train=train, frozen=frozen)
        else:  # legacy TNet (no BN/activation, PointNetClassifier.py:283-285)
            h = PointwiseBlock(
                widths[2], apply_bn=self.conv_apply_bn, bn_momentum=self.bn_momentum,
                activation=self.conv_activation, dtype=self.dtype, name="conv_layer_3",
            )(h, train=train, frozen=frozen)
            # Symmetric (permutation-invariant) global feature. PointNet.py:429.
            h = jnp.max(h, axis=-2)  # (b, 1024)

        h = DenseBlock(
            widths[3], apply_bn=True, bn_momentum=self.bn_momentum,
            activation="relu", dtype=self.dtype, name="dense_layer_1",
        )(h, train=train, frozen=frozen)
        h = DenseBlock(
            widths[4], apply_bn=True, bn_momentum=self.bn_momentum,
            activation="relu", dtype=self.dtype, name="dense_layer_2",
        )(h, train=train, frozen=frozen)

        w = self.param(
            "w",
            nn.initializers.zeros if self.w_init_zeros else nn.initializers.glorot_uniform(),
            (widths[4], self.k * self.k),
        )
        b = self.param("b", _identity_kxk, (self.k, self.k))

        if self.dtype is not None:
            h = h.astype(self.dtype)
            w = w.astype(self.dtype)
        # final transform assembled in f32 (it feeds a matmul with the cloud)
        out = (h @ w).astype(jnp.float32).reshape(-1, self.k, self.k) + b

        if self.add_regularization:
            eye = jnp.eye(self.k, dtype=out.dtype)
            x_xt = out @ jnp.swapaxes(out, -1, -2)
            # tf.nn.l2_loss sums over ALL elements incl. batch, halved.
            reg = 0.5 * jnp.sum(jnp.square(eye - x_xt))
            self.sow("reg_losses", "orthogonality", 1e-3 * reg)

        return out
