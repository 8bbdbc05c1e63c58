"""Config schema tests against the shipped flagship configs (reference
kc46/f15 schema, core/config.py)."""

import pytest

from pointcloudprocessing_tpu.core.config import load_config


def test_kc46_config_parses():
    cfg = load_config("configs/kc46_lidar_config.json")
    assert cfg.name == "kc46_lidar_vanilla"
    assert cfg.num_classes == 23
    assert cfg.num_parts == 12
    assert cfg.class_labels[15] == "kc-46"      # index order preserved
    assert cfg.part_labels[0] == "wing"
    assert cfg.input_width == 8192
    assert cfg.batch_size == 8
    assert cfg.learning.rate == 1e-4
    assert cfg.learning.decay_steps == 7000
    assert cfg.vanilla is True
    assert [s.name for s in cfg.stages] == ["classification_pretrain", "final"]

    pretrain = cfg.stages[0]
    assert pretrain.loss_weights.classification == 1.0
    assert pretrain.loss_weights.segmentation == 0.0
    assert pretrain.trainable.segmentation_head is False
    assert pretrain.monitor == "val_classification_output_loss"
    assert pretrain.noise.as_tuple() == (0.1, 0.1, 0.1)
    assert len(pretrain.datasets) == 4

    final = cfg.stages[1]
    assert final.loss_weights.segmentation == 1.0
    assert final.trainable.classification_head is False
    assert final.monitor == "val_segmentation_output_loss"


def test_f15_config_parses():
    cfg = load_config("configs/f15_lidar_config.json")
    assert cfg.num_classes == 23
    assert cfg.input_width == 8192
    assert len(cfg.stages) >= 1


def test_template_config_parses():
    cfg = load_config("configs/train_config_pointnet_segmentation_template.json")
    assert cfg.num_classes >= 1
    assert cfg.input_width > 0


def test_configs_are_hashable_for_jit():
    """Stage/trainable configs feed jit-static FreezeFlags — must be
    hashable frozen dataclasses."""
    cfg = load_config("configs/kc46_lidar_config.json")
    hash(cfg.stages[0].trainable)
    hash(cfg.learning)


def test_compute_dtype_extension():
    """compute_dtype is an optional extension: absent = f32 (reference
    behavior); 'bfloat16' selects the MXU-native training trunk."""
    import json
    from pointcloudprocessing_tpu.core.config import parse_config

    base = json.load(open("configs/kc46_lidar_config.json"))
    assert parse_config(base).compute_dtype == ""
    base["params"]["compute_dtype"] = "bfloat16"
    assert parse_config(base).compute_dtype == "bfloat16"


def test_model_options_extension():
    """model_options is an optional extension: absent = {} (reference
    behavior); for dgcnn it carries the serving opt-ins (k, graph) through
    to the model factory, and unknown keys / wrong families are rejected."""
    import json
    from pointcloudprocessing_tpu.core.config import parse_config
    from pointcloudprocessing_tpu.models.factory import model_from_config

    base = json.load(open("configs/kc46_lidar_config.json"))
    assert parse_config(base).model_options == {}

    base["params"]["model"] = "dgcnn"
    base["params"]["model_options"] = {"k": 10, "graph": "static"}
    cfg = parse_config(base)
    assert cfg.model_options == {"k": 10, "graph": "static"}
    model = model_from_config(cfg)
    assert model.k == 10
    assert model.graph == "static"

    import pytest as _pytest

    base["params"]["model_options"] = {"bogus": 1}
    with _pytest.raises(ValueError, match="bogus"):
        model_from_config(parse_config(base))

    base["params"]["model"] = "pointnet"
    base["params"]["model_options"] = {"k": 10}
    with _pytest.raises(ValueError, match="model_options"):
        model_from_config(parse_config(base))


def test_optimizer_moment_dtype_extension():
    """optimizer_moment_dtype is an optional extension: absent = '' = f32
    Adam state (reference-exact); 'bfloat16' rounds both stored moments
    (docs/PERF.md 'Training-step wall'); junk is rejected."""
    import json
    from pointcloudprocessing_tpu.core.config import parse_config
    from pointcloudprocessing_tpu.models.factory import _moment_dtype

    import jax.numpy as jnp
    import pytest as _pytest

    base = json.load(open("configs/kc46_lidar_config.json"))
    cfg = parse_config(base)
    assert cfg.optimizer_moment_dtype == ""
    assert _moment_dtype(cfg) is None

    base["params"]["optimizer_moment_dtype"] = "bfloat16"
    cfg = parse_config(base)
    assert cfg.optimizer_moment_dtype == "bfloat16"
    assert _moment_dtype(cfg) == jnp.bfloat16

    base["params"]["optimizer_moment_dtype"] = "fp8"
    with _pytest.raises(ValueError, match="fp8"):
        _moment_dtype(parse_config(base))
