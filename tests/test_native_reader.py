"""C++ TFRecord reader vs the Python codec (same files, same arrays)."""

import os

import numpy as np
import pytest

from pointcloudprocessing_tpu.data import tfrecord
from pointcloudprocessing_tpu.utils.native import (
    native_available,
    read_tfrecord_file_native,
)

WIDTH = 64

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def _write_file(path, num_records, rng):
    samples = []
    with tfrecord.TFRecordWriter(path) as w:
        for i in range(num_records):
            obs = rng.normal(size=(WIDTH, 3)).astype(np.float32)
            cls = int(rng.integers(0, 23))
            parts = rng.integers(0, 12, WIDTH).astype(np.int64)
            se3 = rng.normal(size=(3, 3)).astype(np.float32)
            w.write(tfrecord.encode_example(obs, cls, parts, se3))
            samples.append((obs, cls, parts, se3))
    return samples


def test_native_matches_python(tmp_path, rng):
    path = str(tmp_path / "a.tfrecord")
    samples = _write_file(path, 7, rng)
    out = read_tfrecord_file_native(path, WIDTH, 32)
    assert out is not None
    obs, cls, parts, se3 = out
    assert obs.shape == (7, WIDTH, 3)
    for i, (o, c, p, s) in enumerate(samples):
        np.testing.assert_array_equal(obs[i], o)
        assert cls[i] == c
        np.testing.assert_array_equal(parts[i], p)
        np.testing.assert_array_equal(se3[i], s)


def test_native_reads_tf_written_file(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tf.tfrecord")
    obs = rng.normal(size=(WIDTH, 3)).astype(np.float32)
    parts = rng.integers(0, 12, WIDTH)
    se3 = rng.normal(size=(3, 3)).astype(np.float32)
    feature = {
        "observations": tf.train.Feature(
            float_list=tf.train.FloatList(value=obs.ravel().tolist())
        ),
        "class_label": tf.train.Feature(int64_list=tf.train.Int64List(value=[5])),
        "part_labels": tf.train.Feature(
            int64_list=tf.train.Int64List(value=parts.tolist())
        ),
        "se3": tf.train.Feature(
            float_list=tf.train.FloatList(value=se3.ravel().tolist())
        ),
    }
    example = tf.train.Example(features=tf.train.Features(feature=feature))
    with tf.io.TFRecordWriter(path) as w:
        w.write(example.SerializeToString())

    out = read_tfrecord_file_native(path, WIDTH, 8)
    o, c, p, s = out
    np.testing.assert_array_equal(o[0], obs)
    assert c[0] == 5
    np.testing.assert_array_equal(p[0], parts)
    np.testing.assert_array_equal(s[0], se3)


def test_native_detects_corruption(tmp_path, rng):
    path = str(tmp_path / "bad.tfrecord")
    _write_file(path, 2, rng)
    raw = bytearray(open(path, "rb").read())
    raw[40] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt|malformed"):
        read_tfrecord_file_native(path, WIDTH, 8)


def test_native_wrong_width(tmp_path, rng):
    path = str(tmp_path / "w.tfrecord")
    _write_file(path, 1, rng)
    with pytest.raises(ValueError, match="width|length"):
        read_tfrecord_file_native(path, WIDTH * 2, 8)


# ---------------------------------------------------------------------------
# One-pass C++ ingest (parse -> resample -> encode -> TFRecord framing)
# ---------------------------------------------------------------------------


def test_numpy_uniform_golden():
    """The native SeedSequence+PCG64 chain must reproduce numpy's
    default_rng draws bit for bit — the seeded ingest resample depends on
    it for byte-reproducibility against the Python chain."""
    from pointcloudprocessing_tpu.utils.native import numpy_uniform_native

    cases = [
        ([1, 0], 0.0, 37.0, 257),
        ([0, 5], 0.0, 1.0, 64),
        ([(2**62) + 12345, 3], 0.0, 483.0, 100),  # multi-word entropy int
        ([987654321, (2**40) + 7], -2.5, 9.75, 33),
        ([0, 0], 0.0, 6.0, 1),
    ]
    for seed, low, high, n in cases:
        want = np.random.default_rng(list(seed)).uniform(low, high, n)
        got = numpy_uniform_native(seed, low, high, n)
        assert got is not None
        np.testing.assert_array_equal(got, want)


def test_ingest_frame_matches_python_chain(tmp_path, rng):
    """pcp_ingest_frame output == parse -> adjust_to_input_width_np ->
    encode_example -> frame_record, byte for byte, for both the resample
    (undersized) and truncation (oversized) branches."""
    from pointcloudprocessing_tpu.data.frames import parse_frame_text
    from pointcloudprocessing_tpu.ops.resample import adjust_to_input_width_np
    from pointcloudprocessing_tpu.utils.native import ingest_frame_native

    class_vocab = ["kc-46", "f-15_model"]
    part_vocab = ["wing", "fuselage", "engine"]
    class_map = {c: i for i, c in enumerate(class_vocab)}
    part_map = {p: i for i, p in enumerate(part_vocab)}
    se3 = rng.normal(size=(3, 3)).astype(np.float32)

    for width, n_pts in [(64, 40), (64, 64), (32, 50)]:
        pts = rng.uniform(-10, 10, (n_pts, 3))
        parts = rng.choice(part_vocab, n_pts)
        text = "".join(
            f"({p[0]:.4f}, {p[1]:.4f}, {p[2]:.4f}) kc-46 {q}\n"
            for p, q in zip(pts, parts)
        ).encode()

        obs, cls, part_ids = parse_frame_text(text.decode(), class_map, part_map)
        frame_rng = np.random.default_rng([99, 7])
        obs, part_ids = adjust_to_input_width_np(obs, part_ids, width, frame_rng)
        want = tfrecord.frame_record(
            tfrecord.encode_example(obs, int(cls), part_ids, se3)
        )

        res = ingest_frame_native(text, class_vocab, part_vocab, width, (99, 7), se3)
        assert res is not None
        status, record, cls_id, hist = res
        assert status == 0
        assert cls_id == 0
        assert record == want
        np.testing.assert_array_equal(
            hist, np.bincount(part_ids, minlength=len(part_vocab))
        )


def test_ingest_frame_status_codes():
    from pointcloudprocessing_tpu.utils.native import ingest_frame_native

    cv, pv = ["kc-46"], ["wing"]
    se3 = np.eye(3, dtype=np.float32)
    cases = [
        (b"(1, 2, 3) mystery wing\n", 1),     # unknown label
        (b"", 2),                              # empty frame
        (b"(nan, nan, nan) kc-46 wing\n", 3),  # no finite points
        (b"(1, 2) kc-46 wing\n", 4),           # malformed (2 coords)
    ]
    for text, want_status in cases:
        res = ingest_frame_native(text, cv, pv, 16, (1, 2), se3)
        assert res is not None
        assert res[0] == want_status


def test_native_collect_ingest_byte_identity(tmp_path, monkeypatch):
    """Whole-collect ingest through the chunked native pass produces
    byte-identical TFRecord split files and an equal census to the pure
    Python chain (the native path replays failed frames through Python for
    exact skip semantics — one corrupt frame included to exercise it)."""
    import glob

    from pointcloudprocessing_tpu.data import PointCloudSet
    from pointcloudprocessing_tpu.data import pointcloudset as pcs_mod

    from helpers import make_collect, CLASS_LABELS, PART_LABELS

    collect = make_collect(
        str(tmp_path / "in"), num_frames=24, points_per_frame=60
    )
    # one bad frame: exercises the native->Python replay path
    with open(f"{collect}/Lidar/frame_5.txt", "a") as f:
        f.write("(0, 0, 0) who-knows wing\n")

    def ingest(out_dir: str, use_native: bool):
        monkeypatch.setattr(
            pcs_mod.native, "native_available", lambda: use_native
        )
        messages = []
        pc = PointCloudSet(
            name="parity",
            class_labels=CLASS_LABELS,
            part_labels=PART_LABELS,
            network_input_width=64,
            batch_size=4,
            rand_seed=777,
            print_func=messages.append,
            data_path=str(tmp_path / out_dir) + "/",
        )
        pc.add_from_aftr_output(collect)
        return pc, messages

    pc_py, msg_py = ingest("py", False)
    pc_nat, msg_nat = ingest("nat", True)

    files_py = sorted(glob.glob(f"{pc_py._set_dir}/*/*.tfrecord"))
    files_nat = sorted(glob.glob(f"{pc_nat._set_dir}/*/*.tfrecord"))
    assert len(files_py) == len(files_nat) == 3
    for a, b in zip(files_py, files_nat):
        assert os.path.basename(a) == os.path.basename(b)
        assert open(a, "rb").read() == open(b, "rb").read()

    assert pc_py._data_size == pc_nat._data_size
    assert any("frame_5" in m for m in msg_nat)
    assert sum(pc_nat.split_count(s) for s in ("train", "val", "test")) == 23
