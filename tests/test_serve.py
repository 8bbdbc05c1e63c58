"""Serving CLI: trained stage dir + collect frames -> JSONL predictions."""

import json
import os

import numpy as np
import pytest

from helpers import CLASS_LABELS, PART_LABELS, make_collect
from test_train_profile import make_config


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from pointcloudprocessing_tpu.train.profile import TrainProfile
    from pointcloudprocessing_tpu.serve import main as serve_main

    tmp_path = tmp_path_factory.mktemp("serve")
    config_path = make_config(tmp_path, epochs=1, stages=("classification_pretrain",))
    TrainProfile(config_path, log_to_file=False).train()

    model_dir = str(tmp_path / "models" / "tiny" / "classification_pretrain")
    collect = make_collect(
        str(tmp_path / "fresh"), num_frames=9, points_per_frame=40, seed=7
    )
    out_path = str(tmp_path / "pred.jsonl")
    rc = serve_main(
        ["--model", model_dir, "--input", collect, "--output", out_path,
         "--batch", "4"]
    )
    return rc, out_path, model_dir, collect, tmp_path


def test_serve_cls_only_heads(served):
    """--heads classification skips the seg head: records carry class but
    no part_counts, and the run still exits cleanly."""
    from pointcloudprocessing_tpu.serve import main as serve_main

    rc, _, model_dir, collect, tmp_path = served
    out_path = str(tmp_path / "pred_cls.jsonl")
    rc = serve_main(
        ["--model", model_dir, "--input", collect, "--output", out_path,
         "--batch", "4", "--heads", "classification"]
    )
    assert rc == 0
    records = [json.loads(l) for l in open(out_path)]
    assert len(records) == 9
    assert all("class" in r and "part_counts" not in r and "se3" not in r
               for r in records)


def test_serve_bad_head_rejected(served):
    from pointcloudprocessing_tpu.serve import main as serve_main

    rc, _, model_dir, collect, tmp_path = served
    assert serve_main(
        ["--model", model_dir, "--input", collect, "--output",
         str(tmp_path / "x.jsonl"), "--heads", "bogus"]
    ) == 2


def test_serve_exit_code(served):
    rc = served[0]
    assert rc == 0


def test_serve_output_records(served):
    out_path = served[1]
    records = [json.loads(line) for line in open(out_path)]
    assert len(records) == 9  # one per frame, padding never emitted
    assert [r["frame"] for r in records] == [f"frame_{i}.txt" for i in range(9)]
    for r in records:
        assert r["class"] in CLASS_LABELS
        assert set(r["part_counts"]) <= set(PART_LABELS)
        assert sum(r["part_counts"].values()) == 32  # model width points
        se3 = np.asarray(r["se3"])
        assert se3.shape == (3, 3)
        assert np.isfinite(se3).all()


def test_serve_missing_frames(tmp_path, served, capsys):
    from pointcloudprocessing_tpu.serve import main as serve_main

    os.makedirs(tmp_path / "empty")
    rc = serve_main(
        ["--model", "unused", "--input", str(tmp_path / "empty"), "--batch", "2"]
    )
    assert rc == 1
