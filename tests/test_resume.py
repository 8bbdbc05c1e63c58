"""Mid-stage resume: a killed stage continues with identical history.

The reference restarts a killed stage from epoch 0 with a fresh optimizer
(pointnet_train.py has only stage-level chaining); here the full TrainState
(incl. Adam moments + step counter, hence the LR-schedule position) and the
epoch/history/early-stopping bookkeeping checkpoint every epoch, and the
loaders shuffle per-epoch deterministically — so kill+resume reproduces an
uninterrupted run exactly.
"""

import json
import os

import numpy as np
import pytest

from test_train_profile import make_config

pytestmark = pytest.mark.slow  # multi-minute e2e: opt out with -m "not slow"

EPOCHS = 6
KILL_AFTER = 3


class _Kill(Exception):
    pass


def _run(tmp_path, kill_after=None, config_path=None):
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    if config_path is None:
        config_path = make_config(tmp_path, epochs=EPOCHS,
                                  stages=("classification_pretrain",))
    tp = TrainProfile(config_path, log_to_file=False)
    if kill_after is not None:
        def bomb(stage, epoch, logs):
            if epoch + 1 >= kill_after:
                raise _Kill()
        tp.epoch_callbacks.append(bomb)
    try:
        histories = tp.train()
    except _Kill:
        return config_path, None
    return config_path, histories["classification_pretrain"]


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    # uninterrupted reference run
    _, full = _run(tmp_path / "a")

    # killed after 3 epochs, then resumed in a fresh TrainProfile
    config_path, _ = _run(tmp_path / "b", kill_after=KILL_AFTER)
    stage_dir = tmp_path / "b" / "models" / "tiny" / "classification_pretrain"
    assert (stage_dir / "resume" / "meta.json").is_file()

    _, resumed = _run(tmp_path / "b", config_path=config_path)

    assert len(resumed["loss"]) == EPOCHS
    for key in full:
        np.testing.assert_allclose(
            resumed[key], full[key], rtol=1e-5, atol=1e-6,
            err_msg=f"history key {key} diverged after resume",
        )

    # completed stage clears its resume state
    assert not (stage_dir / "resume").exists()


def test_completed_stage_does_not_resume(tmp_path):
    config_path, first = _run(tmp_path / "c")
    # rerun with the same config: starts from scratch (epoch count full)
    _, second = _run(tmp_path / "c", config_path=config_path)
    assert len(second["loss"]) == EPOCHS


def test_chunked_dispatch_matches_single_step(tmp_path):
    """steps_per_dispatch>1 (scanned multi-step) must reproduce the exact
    single-step history."""
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    config_path = make_config(tmp_path / "single", epochs=3,
                              stages=("classification_pretrain",))
    tp1 = TrainProfile(config_path, log_to_file=False)
    tp1.steps_per_dispatch = 1
    h1 = tp1.train()["classification_pretrain"]

    config_path2 = make_config(tmp_path / "chunked", epochs=3,
                               stages=("classification_pretrain",))
    tp2 = TrainProfile(config_path2, log_to_file=False)
    tp2.steps_per_dispatch = 2  # steps_per_epoch=3 -> one chunk + a tail step
    h2 = tp2.train()["classification_pretrain"]

    for key in h1:
        np.testing.assert_allclose(
            h2[key], h1[key], rtol=1e-5, atol=1e-6,
            err_msg=f"history key {key} diverged under chunked dispatch",
        )


def test_completed_stage_skipped_on_rerun(tmp_path):
    """Regression: rerunning a config whose stage already finished (history
    JSON + best checkpoint on disk, no resume dir) must reuse the artifacts
    instead of retraining from epoch 0."""
    config_path, first = _run(tmp_path)
    assert first is not None

    import time
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    t0 = time.perf_counter()
    tp = TrainProfile(config_path, log_to_file=False)
    calls = []
    tp.epoch_callbacks.append(lambda *a: calls.append(a))
    histories = tp.train()
    assert calls == []  # no epoch ever ran
    assert histories["classification_pretrain"]["loss"] == list(
        map(float, first["loss"])
    )
