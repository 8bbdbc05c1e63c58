"""PointNet++ (hierarchical set abstraction) — a second model family.

The reference repo is PointNet-only (`pointnet/PointNet.py:84`); this module
goes beyond it with the canonical successor architecture (Qi et al. 2017,
single-scale grouping), rebuilt TPU-first on this framework's own
primitives instead of the usual CUDA ball-query/grouping kernels:

- **FPS centroids** via `ops.fps.farthest_point_sample_batch` — the Pallas
  VMEM kernel on TPU, distmat/stream XLA fallbacks elsewhere.
- **Ball query as radius-masked kNN**: an MXU distance matmul +
  `lax.approx_min_k` (recall 0.85 — the setting where XLA's PartialReduce
  fires instead of a full-sort fallback); neighbors outside the query
  radius are replaced by the nearest neighbor, reproducing the classic
  ball-query "duplicate the first in-ball point" padding with FIXED shapes
  (no data-dependent group sizes — XLA-friendly by construction).
- **Pointwise MLPs / heads** reuse `PointwiseBlock`/`DenseBlock`, so the
  Keras numerical conventions (BN eps 1e-3 / momentum 0.99,
  `use_bias = not apply_bn`) and the bf16 compute-dtype switch behave
  exactly as in the PointNet family.

Head/output contract matches `PointNet` (`classification_output`,
`segmentation_output`, `se3`) so the training driver, losses, metrics,
checkpointing, and serving plumbing work unchanged; `se3` is the identity
(PointNet++ has no transform regression — document, don't fake). Freeze
semantics: module names map onto the same `freeze_label_tree` prefixes —
`mlp_cls_*` / `mlp_seg_*` for the heads (feature-propagation decoder
included: it exists only for segmentation), everything else is the shared
trunk. `input_transform`/`vanilla`/T-Net regularizers do not apply.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudprocessing_tpu.core.constants import KERAS_BN_MOMENTUM
from pointcloudprocessing_tpu.models.layers import DenseBlock, PointwiseBlock
from pointcloudprocessing_tpu.models.pointnet import NOTHING_FROZEN, FreezeFlags
from pointcloudprocessing_tpu.ops.fps import farthest_point_sample_batch
from pointcloudprocessing_tpu.ops.gather import gather_rows
from pointcloudprocessing_tpu.ops.normalize import normalize_unit_sphere


def pointnet2_for_width(
    num_classes: int,
    num_parts: int,
    input_width: int,
    **kwargs,
) -> "PointNet2":
    """PointNet2 with SA sizes scaled down for small clouds.

    The canonical SSG config (512/128 centroids, k 32/64) assumes >=1024
    points; for smaller ``input_width`` (unit tests, toy configs) the
    centroid counts and group sizes clamp so FPS never over-samples and
    kNN never asks for more neighbors than exist. At >=1024 points this
    returns the canonical configuration unchanged.
    """
    m1 = max(min(512, input_width // 2), 4)
    k1 = max(min(32, input_width), 1)
    m2 = max(min(128, m1 // 4), 4)
    k2 = max(min(64, m1), 1)
    return PointNet2(
        num_classes=num_classes,
        num_parts=num_parts,
        sa1=(m1, k1, 0.2, (64, 64, 128)),
        sa2=(m2, k2, 0.4, (128, 128, 256)),
        **kwargs,
    )


def layer_trainability_pointnet2(freeze: FreezeFlags) -> dict[str, bool]:
    """Per-layer trainability report for the training log (the PointNet2
    analogue of ``layer_trainability``; PointNet2 has no transforms)."""
    report: dict[str, bool] = {"input_normalization": False}
    for name in ("sa1", "sa2", "sa3"):
        report[f"{name}_set_abstraction"] = not freeze.shared_network
    for name in ("mlp_cls_1_512", "mlp_cls_2_256", "mlp_cls_out"):
        report[name] = not freeze.classification_head
    for name in ("seg_fp2", "seg_fp1", "mlp_seg_1_128", "mlp_seg_2_128",
                 "mlp_seg_out"):
        report[name] = not freeze.segmentation_head
    return report


# Row gathers route through ops.gather: on TPU they become one-hot MXU
# matmuls — the XLA native gather is per-index latency-bound and was 47% of
# the whole PN++ step (docs/PERF.md "PointNet++ hotspots").
_gather_rows = gather_rows
_gather_groups = gather_rows


def _grouping_knn(queries: jnp.ndarray, points: jnp.ndarray, k: int,
                  exact: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched kNN for grouping: (b, m, 3) over (b, n, 3) -> idx/sq_d
    (b, m, k). Approximate mode pins recall_target=0.85: at the default
    0.95 XLA rejects the PartialReduce and lowers approx_min_k to a FULL
    row sort (31.6 ms at the b256 SA1 shape); 0.85 fires the TPU partial
    reduction at 5.9 ms (docs/exp/pn2_hotspot_bench.py). For radius-masked
    ball-query grouping feeding a max-pool, missing ~15% of the exact
    nearest set is immaterial — any in-radius support set works."""
    q2 = jnp.sum(queries * queries, -1, keepdims=True)
    p2 = jnp.sum(points * points, -1)
    # HIGHEST: see ops/knn.py::pairwise_sq_dists
    cross = jnp.einsum(
        "bmc,bnc->bmn", queries, points, precision=jax.lax.Precision.HIGHEST
    )
    d = jnp.maximum(q2 + p2[:, None, :] - 2.0 * cross, 0.0)
    if exact:
        neg, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), -neg
    vals, idx = jax.lax.approx_min_k(d, k, recall_target=0.85)
    return idx.astype(jnp.int32), vals


def sample_and_group(
    xyz: jnp.ndarray,
    feats: Optional[jnp.ndarray],
    num_centroids: int,
    k: int,
    radius: float,
    *,
    exact_knn: bool = False,
    allow_pallas: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One set-abstraction grouping: FPS centroids + radius-masked kNN.

    Args:
      xyz: (b, n, 3) coordinates (unit-sphere scale).
      feats: optional (b, n, c) per-point features to carry into groups.
      num_centroids: m — FPS sample count (static).
      k: neighbors per group (static).
      radius: ball radius; kNN hits beyond it are replaced by the nearest
        neighbor (for a centroid drawn from the cloud that is itself,
        distance 0 — the classic ball-query duplicate-first padding).
      exact_knn: True -> lax.top_k; False -> lax.approx_min_k (TPU default).
      allow_pallas: threaded to FPS (GSPMD jit cannot partition the Pallas
        custom call; shard_map/single-device paths keep it).

    Returns (new_xyz (b, m, 3), grouped (b, m, k, 3 + c)) where grouped is
    [centered neighbor coords ++ neighbor feats].
    """
    centroid_idx = farthest_point_sample_batch(
        xyz, num_centroids, allow_pallas=allow_pallas
    )
    new_xyz = _gather_rows(xyz, centroid_idx)
    nbr_idx, sq_d = _grouping_knn(new_xyz, xyz, k, exact=exact_knn)
    # radius mask with fixed shapes: out-of-ball slots re-read neighbor 0
    within = sq_d <= (radius * radius)
    nbr_idx = jnp.where(within, nbr_idx, nbr_idx[..., :1])
    grouped_xyz = _gather_groups(xyz, nbr_idx) - new_xyz[:, :, None, :]
    if feats is not None:
        grouped = jnp.concatenate(
            [grouped_xyz, _gather_groups(feats, nbr_idx)], axis=-1
        )
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def _three_nearest(fine_xyz: jnp.ndarray, coarse_xyz: jnp.ndarray):
    """Exact 3-NN via three masked argmin passes — identical indices to
    ``lax.top_k`` but ~1.7x faster on TPU, where a k=3 top_k lowers to a
    FULL row sort of the (b, n, m) distance matrix (measured 32 -> 19 ms at
    the b256 PN++ shape, docs/exp/pn2_hotspot_bench.py)."""
    q2 = jnp.sum(fine_xyz * fine_xyz, -1, keepdims=True)
    p2 = jnp.sum(coarse_xyz * coarse_xyz, -1)
    # HIGHEST: the |p|^2 expansion cancels under the TPU default
    # single-bf16-pass matmul (see ops/knn.py::pairwise_sq_dists)
    cross = jnp.einsum(
        "bnc,bmc->bnm", fine_xyz, coarse_xyz,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(q2 + p2[:, None, :] - 2.0 * cross, 0.0)
    idxs, vals = [], []
    for _ in range(3):
        i = jnp.argmin(d, axis=-1)
        # min() is a reduce (~0.7 ms at the b256 shape); gathering d[i] by
        # index is a per-row latency-bound gather (~3.7 ms — the same
        # pathology ops/gather.py exists for)
        vals.append(jnp.min(d, axis=-1))
        idxs.append(i)
        d = jnp.where(jax.nn.one_hot(i, d.shape[-1], dtype=bool), jnp.inf, d)
    return jnp.stack(idxs, -1).astype(jnp.int32), jnp.stack(vals, -1)


def interpolate_features(
    fine_xyz: jnp.ndarray,
    coarse_xyz: jnp.ndarray,
    coarse_feats: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-distance 3-NN feature propagation (fine (b, n, 3), coarse
    (b, m, 3)/(b, m, c) -> (b, n, c))."""
    idx, sq_d = _three_nearest(fine_xyz, coarse_xyz)
    w = 1.0 / (sq_d + eps)  # (b, n, 3)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    nbr = _gather_groups(coarse_feats, idx)  # (b, n, 3, c)
    return jnp.sum(nbr * w[..., None].astype(nbr.dtype), axis=2)


class _SetAbstraction(nn.Module):
    """FPS + group + pointwise MLP + max-pool over the group axis."""

    num_centroids: int
    k: int
    radius: float
    mlp: tuple[int, ...]
    bn_momentum: float = KERAS_BN_MOMENTUM
    dtype: Optional[jnp.dtype] = None
    exact_knn: bool = False
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool, frozen: bool = False):
        new_xyz, grouped = sample_and_group(
            xyz, feats, self.num_centroids, self.k, self.radius,
            exact_knn=self.exact_knn, allow_pallas=self.allow_pallas,
        )
        x = grouped
        for i, width in enumerate(self.mlp):
            x = PointwiseBlock(
                width, bn_momentum=self.bn_momentum, dtype=self.dtype,
                name=f"l{i + 1}",
            )(x, train=train, frozen=frozen)
        return new_xyz, jnp.max(x, axis=2)  # (b, m, 3), (b, m, mlp[-1])


class _GlobalAbstraction(nn.Module):
    """Single-group SA: MLP over [coords ++ feats], max over all points."""

    mlp: tuple[int, ...]
    bn_momentum: float = KERAS_BN_MOMENTUM
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool, frozen: bool = False):
        x = jnp.concatenate([xyz.astype(feats.dtype), feats], axis=-1)
        for i, width in enumerate(self.mlp):
            x = PointwiseBlock(
                width, bn_momentum=self.bn_momentum, dtype=self.dtype,
                name=f"l{i + 1}",
            )(x, train=train, frozen=frozen)
        return jnp.max(x, axis=1)  # (b, mlp[-1])


class PointNet2(nn.Module):
    """Multi-head PointNet++ (SSG): classification + per-point segmentation.

    Same output contract as :class:`PointNet` — the training driver, losses,
    history keys, checkpoints, and serving entry points apply unchanged.
    ``se3`` is the identity: this family regresses no rotation (the MSE
    rotation loss against identity-targets is exactly the reference's
    behavior for clouds already in the sensor frame; configs that train
    this family should weight the rotation loss 0).
    """

    num_classes: int
    num_parts: int
    dropout_rate: float = 0.3
    bn_momentum: float = KERAS_BN_MOMENTUM
    dtype: Optional[jnp.dtype] = None
    #: (centroids, k, radius, mlp widths) per SA level; radii are on the
    #: unit-sphere normalized scale. Defaults are the canonical SSG config.
    sa1: tuple = (512, 32, 0.2, (64, 64, 128))
    sa2: tuple = (128, 64, 0.4, (128, 128, 256))
    sa3_mlp: tuple[int, ...] = (256, 512, 1024)
    exact_knn: bool = False
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
        pc, _ = normalize_unit_sphere(points)

        m1, k1, r1, mlp1 = self.sa1
        m2, k2, r2, mlp2 = self.sa2
        xyz1, f1 = _SetAbstraction(
            m1, k1, r1, tuple(mlp1), self.bn_momentum, self.dtype,
            self.exact_knn, self.allow_pallas, name="sa1",
        )(pc, None, train=train, frozen=freeze.shared_network)
        xyz2, f2 = _SetAbstraction(
            m2, k2, r2, tuple(mlp2), self.bn_momentum, self.dtype,
            self.exact_knn, self.allow_pallas, name="sa2",
        )(xyz1, f1, train=train, frozen=freeze.shared_network)
        global_features = _GlobalAbstraction(
            self.sa3_mlp, self.bn_momentum, self.dtype, name="sa3",
        )(xyz2, f2, train=train, frozen=freeze.shared_network)  # (b, 1024)

        outputs: dict[str, jnp.ndarray] = {}
        if "se3" in heads:
            outputs["se3"] = jnp.broadcast_to(
                jnp.eye(3, dtype=points.dtype), (points.shape[0], 3, 3)
            )

        if "classification_output" in heads:
            # Head widths/conventions mirror the PointNet family's
            # classification head (reference PointNet.py:252-263).
            x_cls = DenseBlock(
                512, apply_bn=True, bn_momentum=self.bn_momentum,
                activation="relu", dtype=self.dtype, name="mlp_cls_1",
            )(global_features, train=train, frozen=freeze.classification_head)
            x_cls = nn.Dropout(
                self.dropout_rate, deterministic=not train, name="dropout_1"
            )(x_cls)
            x_cls = DenseBlock(
                256, apply_bn=True, bn_momentum=self.bn_momentum,
                activation="relu", dtype=self.dtype, name="mlp_cls_2",
            )(x_cls, train=train, frozen=freeze.classification_head)
            x_cls = nn.Dropout(
                self.dropout_rate, deterministic=not train, name="dropout_2"
            )(x_cls)
            outputs["classification_output"] = DenseBlock(
                self.num_classes, apply_bn=False, activation="softmax",
                name="mlp_cls_out",
            )(x_cls.astype(jnp.float32), train=train,
              frozen=freeze.classification_head)

        if "segmentation_output" in heads:
            frozen_seg = freeze.segmentation_head
            # Feature propagation decoder (part of the segmentation head:
            # it exists only to produce per-point features).
            g2 = jnp.broadcast_to(
                global_features[:, None, :],
                (f2.shape[0], f2.shape[1], global_features.shape[-1]),
            )
            d2 = jnp.concatenate([f2, g2], axis=-1)  # (b, m2, 256+1024)
            for i, width in enumerate((256, 256)):
                d2 = PointwiseBlock(
                    width, bn_momentum=self.bn_momentum, dtype=self.dtype,
                    name=f"mlp_seg_fp2_l{i + 1}",
                )(d2, train=train, frozen=frozen_seg)

            d1 = jnp.concatenate(
                [f1, interpolate_features(xyz1, xyz2, d2)], axis=-1
            )  # (b, m1, 128+256)
            for i, width in enumerate((256, 128)):
                d1 = PointwiseBlock(
                    width, bn_momentum=self.bn_momentum, dtype=self.dtype,
                    name=f"mlp_seg_fp1_l{i + 1}",
                )(d1, train=train, frozen=frozen_seg)

            d0 = interpolate_features(pc, xyz1, d1)  # (b, n, 128)
            for i, width in enumerate((128, 128)):
                d0 = PointwiseBlock(
                    width, bn_momentum=self.bn_momentum, dtype=self.dtype,
                    name=f"mlp_seg_l{i + 1}",
                )(d0, train=train, frozen=frozen_seg)
            outputs["segmentation_output"] = PointwiseBlock(
                self.num_parts, apply_bn=False, activation="softmax",
                name="mlp_seg_out",
            )(d0.astype(jnp.float32), train=train, frozen=frozen_seg)

        return outputs
