"""C++ TFRecord reader vs the Python codec (same files, same arrays)."""

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
