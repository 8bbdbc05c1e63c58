"""Model construction from a TrainConfig — the ONE switch on the
``params.model`` config extension, shared by the training driver
(train/profile.py), the serving CLI (serve.py), and the export CLI
(export/cli.py) so the three can never disagree about which family a
checkpoint belongs to."""

from __future__ import annotations

from typing import Optional

from pointcloudprocessing_tpu.models.pointnet import PointNet

MODEL_FAMILIES = ("pointnet", "pointnet2", "dgcnn")


def model_from_config(
    cfg,
    *,
    dtype=None,
    allow_pallas: bool = True,
    training: bool = False,
    dropout_rate: float = 0.3,
):
    """Build the configured model family.

    Args:
      cfg: a ``core.config.TrainConfig``.
      dtype: compute dtype (None = f32 parity mode).
      allow_pallas: False when the consumer compiles under multi-device
        GSPMD jit (custom calls cannot be partitioned) or exports a
        multi-platform artifact.
      training: True applies the config's T-Net regularizers (PointNet
        family only — inference consumers always build without them).
    """
    opts = dict(getattr(cfg, "model_options", {}) or {})
    if cfg.model != "dgcnn" and opts:
        raise ValueError(
            f"params.model_options is not supported for params.model="
            f"{cfg.model!r} (got {sorted(opts)})"
        )
    if cfg.model == "pointnet2":
        from pointcloudprocessing_tpu.models.pointnet2 import pointnet2_for_width

        return pointnet2_for_width(
            cfg.num_classes,
            cfg.num_parts,
            cfg.input_width,
            dropout_rate=dropout_rate,
            dtype=dtype,
            allow_pallas=allow_pallas,
        )
    if cfg.model == "dgcnn":
        from pointcloudprocessing_tpu.models.dgcnn import dgcnn_for_width

        unknown = set(opts) - {"k", "graph"}
        if unknown:
            raise ValueError(
                f"Unknown params.model_options keys for dgcnn: "
                f"{sorted(unknown)} (supported: 'k', 'graph')"
            )
        extra = {}
        if "k" in opts:
            extra["k"] = int(opts["k"])
        if "graph" in opts:
            extra["graph"] = str(opts["graph"])
        return dgcnn_for_width(
            cfg.num_classes,
            cfg.num_parts,
            cfg.input_width,
            dropout_rate=dropout_rate,
            dtype=dtype,
            # the factored edge block's inference extrema use the Pallas
            # lane kernel (ops/pallas/gather_maxmin.py) — must stay off
            # under GSPMD jit / multi-platform export
            allow_pallas=allow_pallas,
            **extra,
        )
    if cfg.model == "pointnet":
        return PointNet(
            num_classes=cfg.num_classes,
            num_parts=cfg.num_parts,
            dropout_rate=dropout_rate,
            vanilla=cfg.vanilla,
            regularize_input_transform=(
                cfg.regularize_input_transform if training else False
            ),
            regularize_feature_transform=(
                cfg.regularize_feature_transform if training else False
            ),
            dtype=dtype,
            allow_pallas=allow_pallas,
        )
    raise ValueError(
        f"Unknown params.model {cfg.model!r} (expected one of {MODEL_FAMILIES})"
    )


def _compute_dtype(cfg) -> Optional[object]:
    """cfg.compute_dtype string -> jnp dtype (None = f32)."""
    import jax.numpy as jnp

    if cfg.compute_dtype in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if cfg.compute_dtype in ("", "float32", "f32"):
        return None
    raise ValueError(f"Unknown compute_dtype {cfg.compute_dtype!r}")


def _moment_dtype(cfg) -> Optional[object]:
    """cfg.optimizer_moment_dtype string -> jnp dtype (None = f32 =
    reference-exact Adam state)."""
    import jax.numpy as jnp

    if cfg.optimizer_moment_dtype in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if cfg.optimizer_moment_dtype in ("", "float32", "f32"):
        return None
    raise ValueError(
        f"Unknown optimizer_moment_dtype {cfg.optimizer_moment_dtype!r}")
