"""Multi-head PointNet: classification + per-point segmentation + SE(3).

Parity target: ``pointnet/PointNet.py:84-376`` — input unit-sphere
normalization, optional input T-Net (3x3), shared MLP(64,64), optional
feature T-Net (64x64), MLP(64,128,1024), global max-pool, a classification
head (512 -> dropout -> 256 -> dropout -> softmax) and a segmentation head on
[per-point 64-d features ++ tiled 1024-d global] through
512 -> 256 -> 128 -> 128 -> softmax. Outputs
{classification_output, segmentation_output, se3} matching the reference's
``[X_cls, X_seg, R]`` (PointNet.py:292).

TPU-first notes: every op here is a batched matmul, reduction, or elementwise
op over static shapes — the whole forward (and the train step around it)
compiles to one XLA program; the pointwise MLPs are (b*n, c) x (c, f) MXU
matmuls. The freeze/thaw curriculum (PointNet.py:294-342) is realized as
static ``FreezeFlags`` (recompile per stage — stages are minutes-to-hours
long) plus optax gradient masks; frozen BatchNorms use running statistics
exactly like Keras ``trainable=False``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pointcloudprocessing_tpu.core.config import TrainableConfig
from pointcloudprocessing_tpu.core.constants import KERAS_BN_MOMENTUM
from pointcloudprocessing_tpu.models.layers import (
    ConcatPointwiseBlock,
    DenseBlock,
    PointwiseBlock,
    PooledPointwiseBlock,
)
from pointcloudprocessing_tpu.models.tnet import TNet
from pointcloudprocessing_tpu.ops.normalize import normalize_unit_sphere


@dataclasses.dataclass(frozen=True)
class FreezeFlags:
    """Static per-stage freeze switches.

    Mirrors the freeze/thaw API of the reference (PointNet.py:294-342) with
    the driver's application order (pointnet_train.py:322-332): the
    ``shared_network`` flag covers both T-Nets and the shared MLPs, then
    ``input_transform`` overrides the input T-Net specifically.
    """

    input_transform: bool = False
    shared_network: bool = False
    classification_head: bool = False
    segmentation_head: bool = False


NOTHING_FROZEN = FreezeFlags()


def freeze_flags_from_trainable(trainable: TrainableConfig) -> FreezeFlags:
    return FreezeFlags(
        input_transform=not trainable.input_transform,
        shared_network=not trainable.shared_network,
        classification_head=not trainable.classification_head,
        segmentation_head=not trainable.segmentation_head,
    )


def layer_trainability(freeze: FreezeFlags, vanilla: bool) -> dict[str, bool]:
    """Per-layer trainability report, same names/ordering as the reference's
    ``PointNet.get_layer_trainability`` (PointNet.py:344-349) for log parity."""
    report: dict[str, bool] = {"input_normalization": False}
    if not vanilla:
        report["input_transform"] = not freeze.input_transform
    report["s1_l1_64_convolution_layer"] = not freeze.shared_network
    report["s1_l2_64_convolution_layer"] = not freeze.shared_network
    if not vanilla:
        report["feature_transform"] = not freeze.shared_network
    report["s2_l1_64_convolution_layer"] = not freeze.shared_network
    report["s2_l2_128_convolution_layer"] = not freeze.shared_network
    report["s2_l3_1024_convolution_layer"] = not freeze.shared_network
    report["s3_l1_512_dense_layer"] = not freeze.classification_head
    report["s3_l2_256_dense_layer"] = not freeze.classification_head
    report["output_dense_layer"] = not freeze.classification_head
    report["seg_l1_512_convolution_layer"] = not freeze.segmentation_head
    report["seg_l2_256_convolution_layer"] = not freeze.segmentation_head
    report["seg_l3_128_convolution_layer"] = not freeze.segmentation_head
    report["seg_l4_128_convolution_layer"] = not freeze.segmentation_head
    report["seg_l5_output_convolution_layer"] = not freeze.segmentation_head
    return report


class PointNet(nn.Module):
    num_classes: int
    num_parts: int
    dropout_rate: float = 0.3
    vanilla: bool = False
    regularize_input_transform: bool = False
    regularize_feature_transform: bool = False
    bn_momentum: float = KERAS_BN_MOMENTUM
    # bfloat16 runs the trunk matmuls on the MXU at 2-4x f32 throughput;
    # final heads and the softmaxes stay f32. None = full f32 (parity mode).
    dtype: Optional[jnp.dtype] = None
    #: False = jnp pooled chains only (set by the training driver when the
    #: step compiles under multi-device GSPMD jit — it cannot partition the
    #: Pallas custom calls; single-device and shard_map paths keep them)
    allow_pallas: bool = True

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        *,
        train: bool = False,
        freeze: FreezeFlags = NOTHING_FROZEN,
        heads: tuple[str, ...] = (
            "classification_output", "segmentation_output", "se3",
        ),
    ) -> dict[str, jnp.ndarray]:
        """points: (b, n, 3) -> dict of the requested heads' outputs.

        ``heads`` subsets the output dict AND the compute: the segmentation
        head is ~80% of inference FLOPs (512/256/128/128-wide per-point
        convs, reference PointNet.py:268-290), so classification-only
        serving skips it entirely. Initialize variables with the default
        (all heads) so the full parameter tree exists; ``apply`` with a
        subset simply leaves the unused parameters untouched. Training
        always uses all heads (the reference's 3-loss objective).
        """
        # Input normalization (PointNet.py:202) — weightless, fused into the
        # same XLA program rather than a separate layer.
        pc, _ = normalize_unit_sphere(points)

        # Input transform (PointNet.py:205-212).
        if not self.vanilla:
            r = TNet(
                k=3,
                add_regularization=self.regularize_input_transform,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                allow_pallas=self.allow_pallas,
                name="input_transform",
            )(pc, train=train, frozen=freeze.input_transform)
            x = pc @ r
        else:
            r = jnp.broadcast_to(
                jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3)
            )
            x = pc

        # Shared MLP (64, 64) (PointNet.py:215-223).
        x = PointwiseBlock(64, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_1_1")(
            x, train=train, frozen=freeze.shared_network
        )
        x = PointwiseBlock(64, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_1_2")(
            x, train=train, frozen=freeze.shared_network
        )

        # Feature transform (PointNet.py:226-231). Frozen with the shared
        # network (pointnet_train.py:322-326 ordering).
        if not self.vanilla:
            r64 = TNet(
                k=64,
                add_regularization=self.regularize_feature_transform,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                allow_pallas=self.allow_pallas,
                name="feature_transform",
            )(x, train=train, frozen=freeze.shared_network)
            x_64 = x @ r64
        else:
            x_64 = x

        # Shared MLP (64, 128, 1024) (PointNet.py:234-245).
        x = PointwiseBlock(64, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_2_1")(
            x_64, train=train, frozen=freeze.shared_network
        )
        x = PointwiseBlock(128, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_2_2")(
            x, train=train, frozen=freeze.shared_network
        )
        # Final trunk layer + symmetric max-pool (PointNet.py:248), fused
        # with a custom VJP: the (b, n, 1024) activation is the widest tensor
        # in the network and its backward otherwise dominates HBM traffic.
        global_features = PooledPointwiseBlock(
            1024, bn_momentum=self.bn_momentum, dtype=self.dtype,
            allow_pallas=self.allow_pallas, name="mlp_2_3"
        )(x, train=train, frozen=freeze.shared_network)  # (b, 1024)

        outputs: dict[str, jnp.ndarray] = {}
        if "se3" in heads:
            outputs["se3"] = r

        if "classification_output" in heads:
            # Classification head (PointNet.py:252-263).
            x_cls = DenseBlock(
                512, apply_bn=True, bn_momentum=self.bn_momentum, activation="relu",
                dtype=self.dtype, name="mlp_cls_1",
            )(global_features, train=train, frozen=freeze.classification_head)
            x_cls = nn.Dropout(self.dropout_rate, deterministic=not train, name="dropout_1")(x_cls)
            x_cls = DenseBlock(
                256, apply_bn=True, bn_momentum=self.bn_momentum, activation="relu",
                dtype=self.dtype, name="mlp_cls_2",
            )(x_cls, train=train, frozen=freeze.classification_head)
            x_cls = nn.Dropout(self.dropout_rate, deterministic=not train, name="dropout_2")(x_cls)
            x_cls = DenseBlock(
                self.num_classes, apply_bn=False, activation="softmax", name="mlp_cls_3",
            )(x_cls.astype(jnp.float32), train=train, frozen=freeze.classification_head)
            outputs["classification_output"] = x_cls

        if "segmentation_output" in heads:
            # Segmentation head on [per-point 64-d ++ tiled global 1024-d]
            # (PointNet.py:268-290). The concat is virtual: the first seg
            # layer's 1088-wide kernel splits into a 64-wide per-point matmul
            # plus a per-cloud contribution (ConcatPointwiseBlock) — ~1.8x
            # fewer model FLOPs with an identical parameter tree.
            x_seg = ConcatPointwiseBlock(
                512, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_seg_1"
            )(x_64, global_features, train=train, frozen=freeze.segmentation_head)
            x_seg = PointwiseBlock(256, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_seg_2")(
                x_seg, train=train, frozen=freeze.segmentation_head
            )
            x_seg = PointwiseBlock(128, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_seg_3")(
                x_seg, train=train, frozen=freeze.segmentation_head
            )
            x_seg = PointwiseBlock(128, bn_momentum=self.bn_momentum, dtype=self.dtype, name="mlp_seg_4")(
                x_seg, train=train, frozen=freeze.segmentation_head
            )
            x_seg = PointwiseBlock(
                self.num_parts, apply_bn=False, activation="softmax", name="mlp_seg_5",
            )(x_seg.astype(jnp.float32), train=train, frozen=freeze.segmentation_head)
            outputs["segmentation_output"] = x_seg

        return outputs
