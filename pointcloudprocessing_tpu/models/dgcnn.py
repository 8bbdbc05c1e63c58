"""DGCNN (dynamic-graph EdgeConv) — a third model family.

The reference repo is PointNet-only (`pointnet/PointNet.py:84`); this module
goes beyond it with Dynamic Graph CNN (Wang et al. 2019), rebuilt TPU-first
on this framework's primitives rather than the usual CUDA kNN/gather
kernels:

- **Dynamic kNN graph per layer**: each EdgeConv recomputes k nearest
  neighbors in the CURRENT feature space (coords for the first layer,
  learned features after). The distance matrix is an MXU matmul
  (``|q|^2 + |p|^2 - 2 q.p`` with ``precision=HIGHEST`` — the cancellation
  rule from ops/knn.py) and selection is ``lax.approx_min_k`` at
  recall_target=0.85, the setting where XLA emits the real PartialReduce
  custom call instead of a full row sort (docs/PERF.md "PointNet++
  hotspots" item 2 — the same finding applies verbatim here).
- **Neighbor-feature gathers** route through ``ops.gather.gather_rows``:
  on TPU a batched row gather is per-index latency-bound, so the selection
  becomes a one-hot bf16 matmul on the MXU (docs/PERF.md item 1).
- **Edge MLPs** reuse :class:`PointwiseBlock` on the (b, n, k, 2c) edge
  tensor, so the Keras numerical conventions (BN eps 1e-3 / momentum 0.99,
  ``use_bias = not apply_bn``) and the bf16 compute-dtype switch behave
  exactly as in the other families.

Head/output contract matches :class:`PointNet` (`classification_output`,
`segmentation_output`, `se3`) so the training driver, losses, metrics,
checkpointing, export, and serving plumbing work unchanged; ``se3`` is the
identity (DGCNN regresses no rotation — document, don't fake). Freeze
semantics map onto the same ``freeze_label_tree`` prefixes: ``mlp_cls_*`` /
``mlp_seg_*`` for the heads, everything else (``ec1..ec4``, ``emb``) is the
shared trunk. ``input_transform``/``vanilla``/T-Net regularizers do not
apply.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudprocessing_tpu.core.constants import (
    KERAS_BN_EPSILON,
    KERAS_BN_MOMENTUM,
)
from pointcloudprocessing_tpu.models.layers import (
    ConcatPointwiseBlock,
    DenseBlock,
    PointwiseBlock,
)
from pointcloudprocessing_tpu.models.pointnet import NOTHING_FROZEN, FreezeFlags
from pointcloudprocessing_tpu.ops.gather import gather_rows
from pointcloudprocessing_tpu.ops.normalize import normalize_unit_sphere
from pointcloudprocessing_tpu.ops.pallas.gather_maxmin import gather_maxmin


def dgcnn_for_width(
    num_classes: int,
    num_parts: int,
    input_width: int,
    k: Optional[int] = None,
    **kwargs,
) -> "DGCNN":
    """DGCNN with the graph size clamped for small clouds.

    Canonical k is 20 (override via ``k`` — e.g. the k=10 serving config of
    the DGCNN serving table, docs/PERF.md); for tiny ``input_width`` (unit
    tests, toy configs) k clamps to the cloud size so kNN never asks for
    more neighbors than exist. At >=32 points this returns the canonical
    configuration.
    """
    return DGCNN(
        num_classes=num_classes,
        num_parts=num_parts,
        k=max(min(20 if k is None else int(k), input_width), 1),
        **kwargs,
    )


def layer_trainability_dgcnn(freeze: FreezeFlags) -> dict[str, bool]:
    """Per-layer trainability report for the training log (the DGCNN
    analogue of ``layer_trainability``; DGCNN has no transforms)."""
    report: dict[str, bool] = {"input_normalization": False}
    for name in ("ec1_edgeconv", "ec2_edgeconv", "ec3_edgeconv",
                 "ec4_edgeconv", "emb_aggregation"):
        report[name] = not freeze.shared_network
    for name in ("mlp_cls_1_512", "mlp_cls_2_256", "mlp_cls_out"):
        report[name] = not freeze.classification_head
    for name in ("mlp_seg_1_256", "mlp_seg_2_256", "mlp_seg_3_128",
                 "mlp_seg_out"):
        report[name] = not freeze.segmentation_head
    return report


def knn_graph(feats: jnp.ndarray, k: int, *, exact: bool = False) -> jnp.ndarray:
    """k nearest neighbors of every point within its own cloud (self
    included, as in the canonical DGCNN implementations): (b, n, c) ->
    (b, n, k) int32 indices.

    The distance matrix never needs materializing beyond one (b, n, n)
    block XLA streams through ``approx_min_k``; the matmul pins
    ``precision=HIGHEST`` because the ``-2 q.p`` expansion subtracts large
    products to recover small gaps (see ops/knn.py::pairwise_sq_dists and
    the CLAUDE.md precision invariant). Distances are computed in f32 even
    under a bf16 trunk — the n^2 c matmul is cheap next to the neighbor
    gathers, and neighbor ORDER is all that leaves this function.
    """
    f = feats.astype(jnp.float32)
    sq = jnp.sum(f * f, axis=-1)
    cross = jnp.einsum(
        "bnc,bmc->bnm", f, f, precision=jax.lax.Precision.HIGHEST
    )
    d = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * cross, 0.0)
    if exact:
        _, idx = jax.lax.top_k(-d, k)
    else:
        _, idx = jax.lax.approx_min_k(d, k, recall_target=0.85)
    return idx.astype(jnp.int32)


def edge_features(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Edge tensor [x_i ++ (x_j - x_i)] for a kNN graph: x (b, n, c),
    idx (b, n, k) -> (b, n, k, 2c). Gathers go through ops.gather (one-hot
    MXU matmuls on TPU)."""
    nbr = gather_rows(x, idx)  # (b, n, k, c)
    center = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([center, nbr - center], axis=-1)


class _EdgeKernel(nn.Module):
    """Bare (2c, features) kernel param — declared through a module named
    ``conv`` so the factored edge block's parameter tree is byte-identical
    to ``PointwiseBlock``'s (``l1/conv/kernel``): checkpoints trained with
    either edge implementation load into the other."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (self.in_features, self.features),
        )


class _FactoredEdgeBlock(nn.Module):
    """EdgeConv MLP + neighbor-max with the edge tensor factored away.

    The edge matmul distributes over the concat:
    ``W [x_i ++ (x_j - x_i)] = (U - V) x_i + V x_j = p_i + q_j`` with
    ``U = W[:c]``, ``V = W[c:]``. So instead of gathering neighbor features,
    materializing the (b, n, k, 2c) edge tensor, and running a k-times-wider
    matmul over it (the canonical CUDA formulation), this computes two
    per-point matmuls and gathers ``q`` — k-fold fewer MLP FLOPs and no
    (b, n, k, 2c) HBM round trip.

    When BN runs from fixed statistics (inference, or a frozen layer) the
    neighbor max collapses too: per channel the affine+relu is monotone in
    ``q_j`` (direction given by the affine scale's sign), so the max over k
    neighbors is attained at ``max_j q_j`` or ``min_j q_j`` —
    ``max(relu(BN(p + qmax)), relu(BN(p + qmin)))`` selects the right
    extremum per channel with no sign bookkeeping, and nothing k-wide ever
    exists. With batch statistics (training) the (b, n, k, w) tensor is
    materialized so the BN moments see the exact edge population — still
    ahead of the canonical path by the edge matmul and the 2c edge tensor.

    Parameter/batch-stats tree is identical to ``PointwiseBlock`` (module
    name ``l1``, children ``conv``/``bn``), so both edge implementations are
    checkpoint-compatible both ways.
    """

    features: int
    bn_momentum: float = KERAS_BN_MOMENTUM
    dtype: Optional[jnp.dtype] = None
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, x, idx, *, train: bool, frozen: bool = False):
        c = x.shape[-1]
        kernel = _EdgeKernel(2 * c, self.features, name="conv")()
        bn = nn.BatchNorm(
            use_running_average=(not train) or frozen,
            momentum=self.bn_momentum,
            epsilon=KERAS_BN_EPSILON,
            dtype=self.dtype,
            name="bn",
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        u, v = kernel[:c], kernel[c:]
        p = x @ (u - v)  # (b, n, w)
        q = x @ v
        if train and not frozen:
            g = gather_rows(q, idx)  # (b, n, k, w) — one-hot MXU matmul
            h = bn(p[:, :, None, :] + g)
            return jnp.max(nn.relu(h), axis=2)
        # inference: the neighbor extrema collapse the k axis — the VMEM
        # lane kernel computes them with no (b, n, k, w) tensor at all
        # (ops/pallas/gather_maxmin.py; one-hot fallback above its width
        # crossover and under GSPMD jit, which cannot partition custom calls)
        qmax, qmin = gather_maxmin(q, idx, allow_pallas=self.allow_pallas)
        return jnp.maximum(
            nn.relu(bn(p + qmax)), nn.relu(bn(p + qmin))
        )


class _EdgeConv(nn.Module):
    """One EdgeConv: dynamic kNN graph + pointwise MLP over the edge tensor
    + max over the neighbor axis.

    ``impl='reference'`` materializes the (b, n, k, 2c) edge tensor and runs
    ``PointwiseBlock`` over it (the literal Wang et al. dataflow; bit-stable
    on CPU for the numpy-golden tests). ``impl='factored'`` computes the
    identical function through :class:`_FactoredEdgeBlock`. ``'auto'`` picks
    factored on TPU backends, reference elsewhere."""

    features: int
    k: int
    bn_momentum: float = KERAS_BN_MOMENTUM
    dtype: Optional[jnp.dtype] = None
    exact_knn: bool = False
    impl: str = "auto"
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool, frozen: bool = False, idx=None):
        impl = self.impl
        if impl not in ("auto", "reference", "factored"):
            # a typo like 'factoredd' must not silently run the slow
            # literal dataflow and mask a perf regression
            raise ValueError(
                f"edge impl must be 'auto', 'reference', or 'factored'; "
                f"got {impl!r}"
            )
        if impl == "auto":
            impl = (
                "factored"
                if jax.default_backend() in ("tpu", "axon")
                else "reference"
            )
        if idx is None:
            idx = knn_graph(x, self.k, exact=self.exact_knn)
        if impl == "factored":
            return _FactoredEdgeBlock(
                self.features, bn_momentum=self.bn_momentum, dtype=self.dtype,
                allow_pallas=self.allow_pallas, name="l1",
            )(x, idx, train=train, frozen=frozen)
        e = edge_features(x, idx)
        h = PointwiseBlock(
            self.features, bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="l1",
        )(e, train=train, frozen=frozen)
        return jnp.max(h, axis=2)  # (b, n, features)


class DGCNN(nn.Module):
    """Multi-head DGCNN: classification + per-point segmentation.

    Same output contract as :class:`PointNet` — the training driver, losses,
    history keys, checkpoints, and serving entry points apply unchanged.
    ``se3`` is the identity: this family regresses no rotation (configs that
    train it should weight the rotation loss 0, exactly like PointNet2).

    Trunk: four EdgeConv layers (64, 64, 128, 256) with the graph rebuilt
    in each layer's feature space, their concatenation (512) lifted to 1024
    by a shared pointwise embedding, then a global max-pool. The
    classification head mirrors the PointNet family's (512 -> 256 ->
    softmax with dropout, reference PointNet.py:252-263); the segmentation
    head runs [per-point 512 ++ tiled global 1024] through 256 -> 256 ->
    128 -> softmax via the split-kernel concat block (identical params to a
    literal concat, ~3x fewer per-point FLOPs — models/layers.py).
    """

    num_classes: int
    num_parts: int
    k: int = 20
    edge_widths: tuple[int, ...] = (64, 64, 128, 256)
    emb_width: int = 1024
    dropout_rate: float = 0.3
    bn_momentum: float = KERAS_BN_MOMENTUM
    dtype: Optional[jnp.dtype] = None
    exact_knn: bool = False
    edge_impl: str = "auto"
    allow_pallas: bool = True
    #: 'dynamic' rebuilds the kNN graph in every EdgeConv's feature space
    #: (the canonical Wang et al. dataflow and the default); 'static'
    #: computes it ONCE on the normalized input coordinates and reuses it
    #: for all four layers — the paper's own fixed-graph ablation (Wang et
    #: al. 2019 §5.1), offered as a serving opt-in because each dynamic
    #: layer pays an (n, n) distance matmul + PartialReduce top-k.
    graph: str = "dynamic"

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
        if self.graph not in ("dynamic", "static"):
            raise ValueError(
                f"graph must be 'dynamic' or 'static'; got {self.graph!r}"
            )
        pc, _ = normalize_unit_sphere(points)

        frozen_trunk = freeze.shared_network
        x = pc.astype(self.dtype) if self.dtype is not None else pc
        # static graph: one input-space kNN shared by every EdgeConv (the
        # fixed-graph ablation) instead of four feature-space rebuilds.
        # Built from pc BEFORE the trunk dtype cast (knn_graph upcasts to
        # f32 internally) so a bf16 trunk selects the same neighbor sets as
        # the native ONNX export's f32 shared TopK.
        shared_idx = (
            knn_graph(pc, self.k, exact=self.exact_knn)
            if self.graph == "static"
            else None
        )
        layer_outs = []
        for i, width in enumerate(self.edge_widths):
            x = _EdgeConv(
                width, self.k, self.bn_momentum, self.dtype, self.exact_knn,
                self.edge_impl, self.allow_pallas, name=f"ec{i + 1}",
            )(x, train=train, frozen=frozen_trunk, idx=shared_idx)
            layer_outs.append(x)
        local = jnp.concatenate(layer_outs, axis=-1)  # (b, n, sum(widths))
        emb = PointwiseBlock(
            self.emb_width, bn_momentum=self.bn_momentum, dtype=self.dtype,
            name="emb",
        )(local, train=train, frozen=frozen_trunk)
        global_features = jnp.max(emb, axis=1)  # (b, emb_width)

        outputs: dict[str, jnp.ndarray] = {}
        if "se3" in heads:
            outputs["se3"] = jnp.broadcast_to(
                jnp.eye(3, dtype=points.dtype), (points.shape[0], 3, 3)
            )

        if "classification_output" in heads:
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
            # [per-point local 512 ++ tiled global 1024] without the
            # materialized concat (split-kernel: same params, the per-point
            # matmul stays 512-wide instead of 1536)
            d = ConcatPointwiseBlock(
                256, bn_momentum=self.bn_momentum, dtype=self.dtype,
                name="mlp_seg_1",
            )(local, global_features, train=train, frozen=frozen_seg)
            d = PointwiseBlock(
                256, bn_momentum=self.bn_momentum, dtype=self.dtype,
                name="mlp_seg_2",
            )(d, train=train, frozen=frozen_seg)
            d = PointwiseBlock(
                128, bn_momentum=self.bn_momentum, dtype=self.dtype,
                name="mlp_seg_3",
            )(d, train=train, frozen=frozen_seg)
            outputs["segmentation_output"] = PointwiseBlock(
                self.num_parts, apply_bn=False, activation="softmax",
                name="mlp_seg_out",
            )(d.astype(jnp.float32), train=train, frozen=frozen_seg)

        return outputs
