"""Speed-of-light PointNet serving path.

Builds a jit-compiled inference function from a standard PointNet variable
tree (models.PointNet init/checkpoint format) that:

- folds every inference BatchNorm into its matmul (ops.pallas.fold_bn);
- runs the three conv-chain + max-pool patterns (both T-Nets, shared trunk)
  through the fused Pallas kernel — the (n, 1024) activations never touch
  HBM;
- runs the five-layer segmentation head in one Pallas kernel with the
  tiled-global contribution pre-reduced to a per-cloud bias;
- keeps the tiny dense heads in plain jnp.

Outputs match ``model.apply(variables, x, train=False)`` (same math, BN
folded and sums reassociated — agreement to ~1e-4 in f32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointcloudprocessing_tpu.ops.normalize import normalize_unit_sphere
from pointcloudprocessing_tpu.ops.pallas.chain import (
    fold_bn,
    fused_chain_max,
    fused_seg_head,
)


def _fold_block(params: dict, stats: dict | None, inner: str):
    """(kernel, bias) with inference-BN folded when present."""
    kernel = params[inner]["kernel"]
    if "bn" in params:
        if not stats or "bn" not in stats:
            raise ValueError(
                "Variable tree has BatchNorm params but no batch_stats — "
                "pass {'params': ..., 'batch_stats': ...} (a params-only "
                "checkpoint cannot be BN-folded)."
            )
        return fold_bn(
            kernel,
            params["bn"]["scale"],
            params["bn"]["bias"],
            stats["bn"]["mean"],
            stats["bn"]["var"],
        )
    bias = params[inner].get("bias")
    if bias is None:
        bias = jnp.zeros((kernel.shape[1],), kernel.dtype)
    return kernel, bias


def fold_pointnet(variables: dict, vanilla: bool = False) -> dict:
    """Pre-fold a PointNet variable tree into kernel/bias arrays."""
    p = variables["params"]
    s = variables.get("batch_stats", {})

    def block(name, inner="conv"):
        return _fold_block(p[name], s.get(name), inner)

    def tnet(name):
        tp, ts = p[name], s.get(name, {})
        conv = [
            _fold_block(tp[f"conv_layer_{i}"], ts.get(f"conv_layer_{i}"), "conv")
            for i in (1, 2, 3)
        ]
        dense = [
            _fold_block(tp[f"dense_layer_{i}"], ts.get(f"dense_layer_{i}"), "dense")
            for i in (1, 2)
        ]
        return {"conv": conv, "dense": dense, "w": tp["w"], "b": tp["b"]}

    folded = {
        "mlp_1_1": block("mlp_1_1"),
        "mlp_1_2": block("mlp_1_2"),
        "trunk": [block("mlp_2_1"), block("mlp_2_2"), block("mlp_2_3")],
        "cls": [
            block("mlp_cls_1", "dense"),
            block("mlp_cls_2", "dense"),
            block("mlp_cls_3", "dense"),
        ],
        "seg": [
            block("mlp_seg_1"),
            block("mlp_seg_2"),
            block("mlp_seg_3"),
            block("mlp_seg_4"),
            block("mlp_seg_5"),
        ],
    }
    if not vanilla:
        folded["input_transform"] = tnet("input_transform")
        folded["feature_transform"] = tnet("feature_transform")
    return folded


def _dense_chain_relu(x, layers):
    for kernel, bias in layers:
        x = jnp.maximum(x @ kernel + bias, 0.0)
    return x


def _tnet_transform(folded_tnet, x, k, compute_dtype):
    conv_w = [w for w, _ in folded_tnet["conv"]]
    conv_b = [b for _, b in folded_tnet["conv"]]
    g = fused_chain_max(x, conv_w, conv_b, compute_dtype)  # (b, 1024)
    h = _dense_chain_relu(g, folded_tnet["dense"])  # (b, 256)
    return (h @ folded_tnet["w"]).reshape(-1, k, k) + folded_tnet["b"]


def make_fast_inference(variables: dict, vanilla: bool = False, compute_dtype=None):
    """Returns a jitted ``infer(points) -> {outputs}`` closure."""
    folded = fold_pointnet(variables, vanilla)

    @jax.jit
    def infer(points):
        pc, _ = normalize_unit_sphere(points)

        if not vanilla:
            r = _tnet_transform(folded["input_transform"], pc, 3, compute_dtype)
            x = pc @ r
        else:
            r = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
            x = pc

        k1, b1 = folded["mlp_1_1"]
        k2, b2 = folded["mlp_1_2"]
        x = jnp.maximum(x @ k1 + b1, 0.0)
        x = jnp.maximum(x @ k2 + b2, 0.0)  # (b, n, 64)

        if not vanilla:
            r64 = _tnet_transform(folded["feature_transform"], x, 64, compute_dtype)
            x_64 = x @ r64
        else:
            x_64 = x

        trunk_w = [w for w, _ in folded["trunk"]]
        trunk_b = [b for _, b in folded["trunk"]]
        global_features = fused_chain_max(x_64, trunk_w, trunk_b, compute_dtype)

        # classification head (tiny): relu dense x2 + softmax dense
        (ck1, cb1), (ck2, cb2), (ck3, cb3) = folded["cls"]
        h = jnp.maximum(global_features @ ck1 + cb1, 0.0)
        h = jnp.maximum(h @ ck2 + cb2, 0.0)
        x_cls = jax.nn.softmax(h @ ck3 + cb3, axis=-1)

        # seg head: layer-1 kernel splits into per-point (64 rows) and
        # per-cloud (1024 rows) halves; the latter + folded bias become the
        # per-cloud bias fed to the fused kernel.
        (sk1, sb1) = folded["seg"][0]
        k_local, k_global = sk1[:64], sk1[64:]
        global_bias = global_features @ k_global + sb1  # (b, 512)
        seg_w = [k_local] + [w for w, _ in folded["seg"][1:]]
        seg_b = [b for _, b in folded["seg"][1:]]
        x_seg = fused_seg_head(x_64, global_bias, seg_w, seg_b, compute_dtype)

        return {
            "classification_output": x_cls,
            "segmentation_output": x_seg,
            "se3": r,
        }

    return infer
