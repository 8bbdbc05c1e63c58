"""Smoke tests for the examples/ scripts (bit-rot protection).

Each script-equivalent of a reference notebook/script gets driven with
tiny synthetic inputs — in-process where the script exposes functions,
via subprocess where it is argv-driven. Training examples run one epoch
and are in the slow lane; ``flagship_smoke.py`` is the hardware
validation script and is exercised on the TPU directly, not here.
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from helpers import make_collect

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def load_example(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", os.path.join(EXAMPLES, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_build_reference_point_cloud(tmp_path):
    path = tmp_path / "cloud.txt"
    path.write_text(
        "(1.0, 2.0, 3.0) kc-46 wing\n(4.0, 5.0, 6.0) kc-46 fuselage\n"
    )
    load_example("build_reference_point_cloud").main(str(path), "(1,2,3)")
    lines = path.read_text().strip().splitlines()
    first = lines[0]
    assert first.endswith("kc-46 wing")
    xyz = [float(v) for v in first.split(")")[0].strip("(").split(",")]
    np.testing.assert_allclose(xyz, [0.0, 0.0, 0.0], atol=1e-6)


def test_pose_computation(tmp_path, capsys):
    collect = make_collect(str(tmp_path), num_frames=4)
    log = next(
        os.path.join(collect, f)
        for f in os.listdir(collect)
        if f.startswith("_palindrome_state")
    )
    load_example("pose_computation").main(log)
    out = capsys.readouterr().out
    assert "frames: 4" in out


def test_data_exploration(tmp_path):
    csv = tmp_path / "returns.csv"
    csv.write_text(
        "range_m,azimuth_deg,elevation_deg,strength\n"
        "10.0,0.0,0.0,1.0\n12.5,45.0,10.0,0.5\n"
    )
    out = tmp_path / "frame_0.txt"
    load_example("data_exploration").main(str(csv), str(out))
    assert out.exists()
    assert len(out.read_text().strip().splitlines()) == 2


def test_evaluate_summarize(tmp_path, capsys):
    hist = {
        "loss": [1.0, 0.5, 0.7],
        "val_classification_output_accuracy": [0.3, 0.6, 0.5],
    }
    (tmp_path / "stage_history.json").write_text(json.dumps(hist))
    load_example("evaluate").summarize(str(tmp_path))
    out = capsys.readouterr().out
    assert "min 0.5000 @ epoch 2" in out
    assert "max 0.6000 @ epoch 2" in out


def test_make_class_test_configs(tmp_path):
    load_example("make_class_test_configs").main(str(tmp_path))
    configs = sorted(tmp_path.glob("bertha_*_config.json"))
    assert len(configs) == 10
    cfg = json.loads(configs[0].read_text())
    assert "training_profiles" in cfg["info"]


def test_build_from_aftr_script(tmp_path):
    # the script's label maps are the kc46 boom-operation set — the collect
    # must carry those labels or every frame is (correctly) rejected
    collect = make_collect(
        str(tmp_path / "in"), num_frames=6, class_name="kc46"
    )
    import re

    lidar = os.path.join(collect, "Lidar")
    for fname in os.listdir(lidar):
        p = os.path.join(lidar, fname)
        text = re.sub(r"\b(wing|fuselage|engine)\b", "left_wing", open(p).read())
        open(p, "w").write(text)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(EXAMPLES, "build_from_aftr.py"),
            collect,
            str(tmp_path / "out"),
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    name = os.path.basename(collect)
    assert os.path.exists(tmp_path / "out" / name / "pc_set.joblib"), res.stdout
    assert "Total count" in res.stdout or "count" in res.stdout.lower()


@pytest.mark.slow
def test_classifier_example_one_epoch(capsys):
    mod = load_example("classifier_example")
    mod.train_classifier(1)
    mod.pretrain_tnet(1)
    out = capsys.readouterr().out
    assert "accuracy" in out.lower() or "MSE" in out


@pytest.mark.slow
def test_modelnet_example_procedural_fallback():
    acc = load_example("modelnet_example").main(None, epochs=1)
    assert 0.0 <= float(acc) <= 1.0


@pytest.mark.slow
def test_hyperparameter_tuning_one_epoch(capsys):
    load_example("hyperparameter_tuning").main(1)
    out = capsys.readouterr().out
    assert "tabular" in out or "best" in out.lower()
