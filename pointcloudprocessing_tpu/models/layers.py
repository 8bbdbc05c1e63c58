"""Building-block layers for the PointNet family.

The reference wraps Keras ``Conv2D(kernel_size=(1,1))`` / ``Dense`` with
optional BatchNorm and activation (``pointnet/PointNet.py:493-679``,
ConvLayer/DenseLayer). A 1x1 conv over a (b, n, 1, c) tensor is exactly a
per-point dense layer, so here both collapse into matmuls over (..., c) —
the shape XLA tiles straight onto the MXU with no layout gymnastics.

Numerical conventions matched for <=1e-4 logit parity with the reference:

- ``use_bias = not apply_bn`` (PointNet.py:540, :630).
- BatchNorm momentum 0.99, epsilon 1e-3 (Keras defaults the reference
  inherits), EMA convention ``moving = momentum * moving + (1-m) * batch``.
- A *frozen* layer behaves like Keras ``trainable=False``: BatchNorm uses the
  moving statistics even when training, and never updates them.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pointcloudprocessing_tpu.core.constants import KERAS_BN_EPSILON, KERAS_BN_MOMENTUM


def apply_activation(x: jnp.ndarray, activation: Optional[str]) -> jnp.ndarray:
    if activation is None:
        return x
    if activation == "relu":
        return nn.relu(x)
    if activation == "softmax":
        return nn.softmax(x, axis=-1)
    raise ValueError(f"Unknown activation: {activation!r}")


class PointwiseBlock(nn.Module):
    """Per-point dense + optional BN + activation.

    Equivalent of the reference ``ConvLayer`` (PointNet.py:493-594): the
    kernel is always (1,1), so the conv is a pointwise matmul; with input
    (b, n, c) this is ``einsum('bnc,cf->bnf')`` — batched MXU work.

    ``dtype=bfloat16`` runs the matmul/BN math in bf16 (params stay f32) —
    the MXU-native precision; default None keeps full f32 for reference
    logit parity.
    """

    features: int
    apply_bn: bool = True
    bn_momentum: float = KERAS_BN_MOMENTUM
    activation: Optional[str] = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool, frozen: bool = False) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            use_bias=not self.apply_bn,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.apply_bn:
            x = nn.BatchNorm(
                use_running_average=(not train) or frozen,
                momentum=self.bn_momentum,
                epsilon=KERAS_BN_EPSILON,
                dtype=self.dtype,
                name="bn",
            )(x)
        return apply_activation(x, self.activation)


class _SplitKernelDense(nn.Module):
    """Dense over a virtual concat [local ++ broadcast(global)] without
    materializing the concat: ``local @ K[:d] + global @ K[d:]``.

    Parameter tree is identical to ``nn.Dense`` over the concatenated input
    (one (d_local + d_global, features) kernel), so checkpoints/weight
    transfer are unaffected; only the contraction order changes. The
    per-point matmul shrinks from (d_local + d_global) to d_local wide — for
    PointNet's segmentation head that is 1088 -> 64 per point, the single
    largest FLOP reduction in the model.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, local: jnp.ndarray, global_feats: jnp.ndarray) -> jnp.ndarray:
        d_local = local.shape[-1]
        d_global = global_feats.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (d_local + d_global, self.features),
        )
        if self.dtype is not None:
            local = local.astype(self.dtype)
            global_feats = global_feats.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        per_point = local @ kernel[:d_local]
        per_cloud = global_feats @ kernel[d_local:]
        out = per_point + per_cloud[..., None, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return out


class ConcatPointwiseBlock(nn.Module):
    """PointwiseBlock over [per-point features ++ tiled global vector],
    computed via :class:`_SplitKernelDense` (same params as PointwiseBlock
    fed the explicit concat)."""

    features: int
    apply_bn: bool = True
    bn_momentum: float = KERAS_BN_MOMENTUM
    activation: Optional[str] = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        local: jnp.ndarray,
        global_feats: jnp.ndarray,
        *,
        train: bool,
        frozen: bool = False,
    ) -> jnp.ndarray:
        x = _SplitKernelDense(
            self.features, use_bias=not self.apply_bn, dtype=self.dtype, name="conv"
        )(local, global_feats)
        if self.apply_bn:
            x = nn.BatchNorm(
                use_running_average=(not train) or frozen,
                momentum=self.bn_momentum,
                epsilon=KERAS_BN_EPSILON,
                dtype=self.dtype,
                name="bn",
            )(x)
        return apply_activation(x, self.activation)


class DenseBlock(nn.Module):
    """Dense + optional BN + activation.

    Equivalent of the reference ``DenseLayer`` (PointNet.py:597-679); same
    conventions as :class:`PointwiseBlock` (apply_bn defaults False there,
    callers set it explicitly — we mirror each call site).
    """

    features: int
    apply_bn: bool = False
    bn_momentum: float = KERAS_BN_MOMENTUM
    activation: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool, frozen: bool = False) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            use_bias=not self.apply_bn,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="dense",
        )(x)
        if self.apply_bn:
            x = nn.BatchNorm(
                use_running_average=(not train) or frozen,
                momentum=self.bn_momentum,
                epsilon=KERAS_BN_EPSILON,
                dtype=self.dtype,
                name="bn",
            )(x)
        return apply_activation(x, self.activation)


class _KernelOnly(nn.Module):
    """Bias-free kernel holder named like nn.Dense (param 'kernel')."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.glorot_uniform(), (in_features, self.features)
        )


class _BNVars(nn.Module):
    """BatchNorm parameter/stat holder named like nn.BatchNorm."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, mean, var


class PooledPointwiseBlock(nn.Module):
    """``PointwiseBlock(features, BN, relu)`` + global max over points, fused
    through the custom-VJP op (models/fused_pool.py).

    The (b, n, features) activation is the widest tensor in the network (the
    1024-wide chains feeding the max-pools); the fused op's backward needs
    only the argmax winners plus matmul-factored statistics terms, cutting
    the training step's HBM traffic. Variable tree is identical to
    ``PointwiseBlock`` + ``jnp.max`` (params conv/kernel, bn/{scale, bias};
    batch_stats bn/{mean, var}) so checkpoints, weight transfer, and freeze
    labels are unchanged.
    """

    features: int
    bn_momentum: float = KERAS_BN_MOMENTUM
    dtype: Optional[jnp.dtype] = None
    #: False forces the jnp formulation — required when the train step
    #: compiles under multi-device GSPMD jit, which cannot partition the
    #: Pallas custom calls (the shard_map mode keeps them; see
    #: train/steps.py::make_shardmap_train_multi_step)
    allow_pallas: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool, frozen: bool = False) -> jnp.ndarray:
        from pointcloudprocessing_tpu.models.fused_pool import dense_bn_relu_max

        kernel = _KernelOnly(self.features, name="conv")(x.shape[-1])
        scale, bias, mean_v, var_v = _BNVars(self.features, name="bn")()

        use_running = (not train) or frozen
        cfg = (use_running, self.bn_momentum, KERAS_BN_EPSILON, self.dtype,
               self.allow_pallas)
        pooled, batch_mean, batch_var = dense_bn_relu_max(
            cfg, x, kernel, scale, bias, mean_v.value, var_v.value
        )
        if (
            not use_running
            and not self.is_initializing()
            and self.is_mutable_collection("batch_stats")
        ):
            m = self.bn_momentum
            mean_v.value = m * mean_v.value + (1.0 - m) * batch_mean
            var_v.value = m * var_v.value + (1.0 - m) * batch_var
        return pooled
