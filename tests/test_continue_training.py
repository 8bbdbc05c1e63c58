"""Cross-run resume via info.continue_training_model
(pointnet_train.py:280-295 semantics)."""

import json
import os

import numpy as np
import pytest

from helpers import make_collect, CLASS_LABELS, PART_LABELS
from test_train_profile import make_config

pytestmark = pytest.mark.slow  # multi-minute e2e: opt out with -m "not slow"

WIDTH = 32


def test_continue_training_model_resumes(tmp_path):
    from pointcloudprocessing_tpu.core.config import load_config, parse_config
    from pointcloudprocessing_tpu.train.profile import TrainProfile
    from pointcloudprocessing_tpu.train.callbacks import load_checkpoint

    config_path = make_config(tmp_path, epochs=1, stages=("final",))
    tp = TrainProfile(config_path, log_to_file=False)
    tp.train()

    ckpt_dir = "tiny/final/"
    payload = load_checkpoint(str(tmp_path / "models" / ckpt_dir))

    # second run continues from the first run's checkpoint
    config = json.load(open(config_path))
    config["info"]["name"] = "tiny2"
    config["info"]["continue_training_model"] = ckpt_dir
    config_path2 = str(tmp_path / "tiny2_config.json")
    json.dump(config, open(config_path2, "w"))

    tp2 = TrainProfile(config_path2, log_to_file=False)
    model2, state2, _, _ = tp2._build_state(tp2.config.stages[0])

    # the resumed state's params equal the checkpointed ones exactly
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(payload["params"]),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_continue_training_missing_path_rejected(tmp_path):
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    config_path = make_config(tmp_path, epochs=1, stages=("final",))
    config = json.load(open(config_path))
    config["info"]["continue_training_model"] = "does/not/exist"
    bad_path = str(tmp_path / "bad_config.json")
    json.dump(config, open(bad_path, "w"))
    with pytest.raises(FileNotFoundError):
        TrainProfile(bad_path, log_to_file=False)
