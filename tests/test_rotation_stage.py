"""Rotation-regression training stage (the deprecated 3-stage curriculum's
T-Net pretraining stage: loss_weights rotation-only —
models/deprecated/fill_pipeline_kc46_augment in the reference)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudprocessing_tpu.core.config import LearningConfig
from pointcloudprocessing_tpu.models import PointNet, FreezeFlags
from pointcloudprocessing_tpu.ops.augment import random_so3_rotation
from pointcloudprocessing_tpu.train import steps as steps_lib

B, N = 8, 32


def test_rotation_only_stage_learns():
    model = PointNet(num_classes=3, num_parts=2, regularize_input_transform=True)
    freeze = FreezeFlags(classification_head=True, segmentation_head=True)
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, LearningConfig(rate=1e-3), freeze
    )
    step = steps_lib.make_train_step(
        model, optimizer, (0.0, 0.0, 1.0), freeze, (0.0, 0.0, 0.0)
    )

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    rots = random_so3_rotation(jax.random.key(5), (B,))
    x = base @ rots
    targets = {
        "classification_output": jnp.zeros(B, jnp.int32),
        "segmentation_output": jnp.zeros((B, N), jnp.int32),
        "se3": jnp.swapaxes(rots, -1, -2),
    }

    first = None
    for i in range(25):
        state, logs = step(state, x, targets, jax.random.key(i))
        if first is None:
            first = float(logs["se3_loss"])
    last = float(logs["se3_loss"])
    assert np.isfinite(last)
    assert last < first  # rotation head is learning
    # frozen heads never moved
    for name in ("mlp_cls_1", "mlp_seg_1"):
        pass  # covered structurally by test_freeze_mask_keeps_params_fixed
