"""End-to-end dataset manager tests: collect ingest -> TFRecord splits ->
loader batches."""

import glob
import os

import numpy as np
import pytest

from pointcloudprocessing_tpu.data import PointCloudSet, load_from_file

from helpers import make_collect, CLASS_LABELS, PART_LABELS

WIDTH = 64


@pytest.fixture
def pc_set(tmp_path):
    collect = make_collect(str(tmp_path / "in"), num_frames=20, points_per_frame=50)
    pc = PointCloudSet(
        name="unit",
        class_labels=CLASS_LABELS,
        part_labels=PART_LABELS,
        network_input_width=WIDTH,
        batch_size=4,
        rand_seed=42,
        description="unit-test set",
        data_path=str(tmp_path / "data") + "/",
    )
    os.makedirs(str(tmp_path / "data"), exist_ok=True)
    pc.add_from_aftr_output(collect)
    return pc


def test_ingest_counts_and_splits(pc_set):
    sizes = {s: pc_set.split_count(s) for s in ("train", "val", "test")}
    assert sizes["test"] == 2    # ceil(20 * 0.10)
    assert sizes["val"] == 3     # ceil(20 * 0.15)
    assert sizes["train"] == 15
    files = glob.glob(f"{pc_set._set_dir}/*/*.tfrecord")
    assert len(files) == 3


def test_loaded_arrays_shapes(pc_set):
    arrays = pc_set.load_split_arrays("train")
    assert arrays["observations"].shape == (15, WIDTH, 3)
    assert arrays["part_labels"].shape == (15, WIDTH)
    assert arrays["se3"].shape == (15, 3, 3)
    assert (arrays["class_label"] == 0).all()  # kc-46
    assert np.isfinite(arrays["observations"]).all()
    # se3 rotation blocks orthogonal (they came from the pose log)
    for r in arrays["se3"]:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_loader_batches(pc_set):
    loader = pc_set.get_train_set()
    assert loader.steps_per_epoch == 3  # 15 // 4
    batches = list(loader.batches(num_steps=5))
    assert len(batches) == 5
    x, targets = batches[0]
    assert x.shape == (4, WIDTH, 3)
    assert targets["classification_output"].shape == (4,)
    assert targets["segmentation_output"].shape == (4, WIDTH)
    assert targets["se3"].shape == (4, 3, 3)


def test_joblib_persistence_roundtrip(pc_set):
    path = f"{pc_set._set_dir}/pc_set.joblib"
    assert os.path.exists(path)
    loaded = load_from_file(path)
    assert loaded.split_count("train") == pc_set.split_count("train")
    assert loaded.network_input_width == WIDTH
    arrays = loaded.load_split_arrays("val")
    assert arrays["observations"].shape[0] == 3


def test_get_info_census(pc_set):
    info = pc_set.get_info()
    assert "unit-test set" in info
    assert "Random seed: 42" in info
    assert "Total count: 15" in info
    assert "kc-46: 15" in info
    for part in PART_LABELS:
        assert part in info


def test_bad_frames_skipped(tmp_path):
    collect = make_collect(str(tmp_path / "in"), num_frames=5, points_per_frame=30)
    # corrupt one frame with an unknown label
    with open(os.path.join(collect, "Lidar", "frame_2.txt"), "a") as f:
        f.write("(0, 0, 0) who-knows wing\n")
    messages = []
    pc = PointCloudSet(
        name="bad",
        class_labels=CLASS_LABELS,
        part_labels=PART_LABELS,
        network_input_width=WIDTH,
        batch_size=2,
        rand_seed=1,
        print_func=messages.append,
        data_path=str(tmp_path / "data") + "/",
    )
    pc.add_from_aftr_output(collect)
    total = sum(pc.split_count(s) for s in ("train", "val", "test"))
    assert total == 4  # frame_2 dropped
    assert any("frame_2" in m for m in messages)


def test_reference_cloud_files_parse():
    """The repo's canonical template clouds (reference:
    examples/reference_point_clouds/*.txt) parse with our frame parser."""
    ref = "/root/reference/point_cloud_analysis/examples/reference_point_clouds/kc-46.txt"
    if not os.path.exists(ref):
        pytest.skip("reference tree unavailable")
    from pointcloudprocessing_tpu.data.frames import parse_frame_file

    class_map = {"kc-46": 0}
    part_map = {p: i for i, p in enumerate(
        ["wing", "fuselage", "engine", "hstab", "vstab", "landing_gear",
         "armament", "boom_wing", "boom_hull", "boom_hose", "dish", "probe"]
    )}
    pts, cls, parts = parse_frame_file(ref, class_map, part_map)
    assert pts.shape == (490, 3)
    assert cls == 0
    assert parts.min() >= 0


def test_unseeded_ingest(tmp_path):
    """Regression: rand_seed=None (the default) must not crash the
    threaded ingest's per-frame seed derivation."""
    collect = make_collect(str(tmp_path / "in"), num_frames=4, points_per_frame=20)
    pc = PointCloudSet(
        name="unseeded",
        class_labels=CLASS_LABELS,
        part_labels=PART_LABELS,
        network_input_width=32,
        batch_size=2,
        rand_seed=None,
        data_path=str(tmp_path / "out") + "/",
        print_func=lambda *a, **k: None,
    )
    assert pc.add_from_aftr_output(collect)
    assert "Total count" in pc.get_info() or "count" in pc.get_info().lower()


def test_missing_tfrecords_raise_not_silent(pc_set, tmp_path):
    """A set whose census says records exist but whose TFRecords are not at
    _set_dir (classic cause: relative data path + different cwd) must raise
    at loader construction — round 3 caught a run silently training
    zero-batch epochs with loss 0.0 in exactly this state."""
    import shutil

    shutil.rmtree(pc_set._set_dir)
    with pytest.raises(FileNotFoundError, match="census but no"):
        pc_set.get_train_set()
