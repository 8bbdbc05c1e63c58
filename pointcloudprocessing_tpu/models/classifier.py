"""Legacy classification-only PointNet and the T-Net pretrainer.

Parity targets in ``pointnet/PointNetClassifier.py``:

- ``PointNetClassifier`` (:85-186): pure-classification PointNet. Its
  private layer copies differ from the current model's: the legacy T-Net's
  conv layers have no BN and no activation (:283-285 with ConvLayer defaults
  apply_bn=False/activation=None, :343-351), and its ``w`` is zero-initialized
  (:292) so an untrained T-Net is exactly the identity.
- ``TNetRegressor`` (:188-214): a lone input T-Net trained to regress the
  rotation matrix directly (used by the pretrained-T-Net experiments in
  ``examples/pointnet_train.ipynb`` cell 10).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pointcloudprocessing_tpu.core.constants import KERAS_BN_MOMENTUM
from pointcloudprocessing_tpu.models.layers import PointwiseBlock, DenseBlock
from pointcloudprocessing_tpu.models.tnet import TNet


def _legacy_tnet(
    k: int, add_regularization: bool, name: str,
    bn_momentum: float = KERAS_BN_MOMENTUM,
) -> TNet:
    return TNet(
        k=k,
        add_regularization=add_regularization,
        bn_momentum=bn_momentum,
        conv_apply_bn=False,
        conv_activation=None,
        w_init_zeros=True,
        name=name,
    )


class PointNetClassifier(nn.Module):
    num_classes: int = 2
    dropout_rate: float = 0.3
    bn_momentum: float = KERAS_BN_MOMENTUM

    @nn.compact
    def __call__(self, points: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """points: (b, n, 3) -> (b, num_classes) softmax probabilities.

        Note the legacy model applies NO input normalization
        (PointNetClassifier.py:152-183) — parity preserved.
        """
        r = _legacy_tnet(3, False, "input_transform", self.bn_momentum)(points, train=train)
        x = points @ r

        x = PointwiseBlock(64, bn_momentum=self.bn_momentum, name="mlp_1_1")(x, train=train)
        x = PointwiseBlock(64, bn_momentum=self.bn_momentum, name="mlp_1_2")(x, train=train)

        r64 = _legacy_tnet(64, True, "feature_transform", self.bn_momentum)(x, train=train)
        x = x @ r64

        x = PointwiseBlock(64, bn_momentum=self.bn_momentum, name="mlp_2_1")(x, train=train)
        x = PointwiseBlock(128, bn_momentum=self.bn_momentum, name="mlp_2_2")(x, train=train)
        x = PointwiseBlock(1024, bn_momentum=self.bn_momentum, name="mlp_2_3")(x, train=train)

        x = jnp.max(x, axis=-2)  # (b, 1024)

        x = DenseBlock(512, apply_bn=True, bn_momentum=self.bn_momentum, activation="relu", name="dense_1")(x, train=train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train, name="dropout_1")(x)
        x = DenseBlock(256, apply_bn=True, bn_momentum=self.bn_momentum, activation="relu", name="dense_2")(x, train=train)
        x = nn.Dropout(self.dropout_rate, deterministic=not train, name="dropout_2")(x)
        return DenseBlock(self.num_classes, activation="softmax", name="dense_out")(x, train=train)


class TNetRegressor(nn.Module):
    add_regularization: bool = False
    bn_momentum: float = KERAS_BN_MOMENTUM
    tnet_layer_widths: tuple[int, ...] = (64, 128, 1024, 512, 256)

    @nn.compact
    def __call__(self, points: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """points: (b, n, 3) -> (b, 3, 3) predicted rotation."""
        tnet = TNet(
            k=3,
            add_regularization=self.add_regularization,
            bn_momentum=self.bn_momentum,
            layer_widths=self.tnet_layer_widths,
            conv_apply_bn=False,
            conv_activation=None,
            w_init_zeros=True,
            name="input_transform",
        )
        return tnet(points, train=train)
