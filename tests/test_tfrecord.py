"""TFRecord/Example codec tests: self round-trip + byte-compat with TF."""

import numpy as np
import pytest

from pointcloudprocessing_tpu.data import tfrecord
from pointcloudprocessing_tpu.utils.native import crc32c, _crc32c_python, native_available


def test_crc32c_known_vectors():
    # RFC 3720 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_crc32c_python_fallback_matches():
    data = bytes(range(256)) * 7 + b"tail"
    assert _crc32c_python(b"123456789") == 0xE3069283
    if native_available():
        assert crc32c(data) == _crc32c_python(data)


def _sample(width=16, rng=None):
    rng = rng or np.random.default_rng(0)
    obs = rng.normal(size=(width, 3)).astype(np.float32)
    cls = 5
    parts = rng.integers(0, 12, width).astype(np.int64)
    se3 = rng.normal(size=(3, 3)).astype(np.float32)
    return obs, cls, parts, se3


def test_example_roundtrip(tmp_path):
    obs, cls, parts, se3 = _sample()
    record = tfrecord.encode_example(obs, cls, parts, se3)
    decoded = tfrecord.decode_example(record)
    np.testing.assert_array_equal(decoded["observations"].reshape(16, 3), obs)
    assert decoded["class_label"][0] == cls
    np.testing.assert_array_equal(decoded["part_labels"], parts)
    np.testing.assert_array_equal(decoded["se3"].reshape(3, 3), se3)


def test_tfrecord_file_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord")
    samples = [_sample(8, np.random.default_rng(i)) for i in range(5)]
    with tfrecord.TFRecordWriter(path) as w:
        for s in samples:
            w.write(tfrecord.encode_example(*s))
    records = list(tfrecord.read_tfrecord_file(path))
    assert len(records) == 5
    for rec, s in zip(records, samples):
        decoded = tfrecord.decode_example(rec)
        np.testing.assert_array_equal(decoded["observations"].reshape(8, 3), s[0])


def test_corrupt_crc_detected(tmp_path):
    path = str(tmp_path / "corrupt.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(tfrecord.encode_example(*_sample()))
    raw = bytearray(open(path, "rb").read())
    raw[-20] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt"):
        list(tfrecord.read_tfrecord_file(path))


# ---------------------------------------------------------------------------
# Byte-compat with TensorFlow (the reference's on-disk format)
# ---------------------------------------------------------------------------

tf = pytest.importorskip("tensorflow")

WIDTH = 16
FEATURES = {
    "observations": tf.io.FixedLenFeature([WIDTH * 3], tf.float32),
    "class_label": tf.io.FixedLenFeature([], tf.int64),
    "part_labels": tf.io.FixedLenFeature([WIDTH], tf.int64),
    "se3": tf.io.FixedLenFeature([9], tf.float32),
}


def test_tf_reads_our_records(tmp_path):
    """Files we write must parse with the reference's tf.data schema
    (PointCloudSet.py:100-105, 325-333)."""
    path = str(tmp_path / "ours.tfrecord")
    obs, cls, parts, se3 = _sample(WIDTH)
    with tfrecord.TFRecordWriter(path) as w:
        w.write(tfrecord.encode_example(obs, cls, parts, se3))

    ds = tf.data.TFRecordDataset([path])
    for raw in ds:
        ex = tf.io.parse_single_example(raw, FEATURES)
        np.testing.assert_array_equal(
            ex["observations"].numpy().reshape(WIDTH, 3), obs
        )
        assert int(ex["class_label"].numpy()) == cls
        np.testing.assert_array_equal(ex["part_labels"].numpy(), parts)
        np.testing.assert_array_equal(ex["se3"].numpy().reshape(3, 3), se3)


def test_we_read_tf_records(tmp_path):
    """Files written the reference way (tf.train.Example + TFRecordWriter,
    PointCloudSet.py:294-323) must decode with our reader."""
    path = str(tmp_path / "tf.tfrecord")
    obs, cls, parts, se3 = _sample(WIDTH)

    feature = {
        "observations": tf.train.Feature(
            float_list=tf.train.FloatList(value=obs.ravel().tolist())
        ),
        "class_label": tf.train.Feature(int64_list=tf.train.Int64List(value=[cls])),
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

    records = list(tfrecord.read_tfrecord_file(path))
    assert len(records) == 1
    decoded = tfrecord.decode_example(records[0])
    np.testing.assert_array_equal(decoded["observations"].reshape(WIDTH, 3), obs)
    assert decoded["class_label"][0] == cls
    np.testing.assert_array_equal(decoded["part_labels"], parts)
    np.testing.assert_array_equal(decoded["se3"].reshape(3, 3), se3)


def test_negative_int64_roundtrip():
    rec = tfrecord.encode_example(
        np.zeros((2, 3), np.float32), -3, np.array([-1, 5]), np.eye(3, dtype=np.float32)
    )
    decoded = tfrecord.decode_example(rec)
    assert decoded["class_label"][0] == -3
    np.testing.assert_array_equal(decoded["part_labels"], [-1, 5])


def test_native_encoder_byte_identical(rng):
    """The C++ example encoder must produce byte-identical output to the
    pure-Python contract (same map-entry order, packed int64 lists),
    including multi-byte varints and negative-free large labels."""
    from pointcloudprocessing_tpu.utils.native import (
        encode_example_native,
        native_available,
    )
    import pointcloudprocessing_tpu.data.tfrecord as tfr

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")

    obs = rng.normal(size=(37, 3)).astype(np.float32)
    parts = rng.integers(0, 300, 37).astype(np.int64)  # multi-byte varints
    se3 = rng.normal(size=(3, 3)).astype(np.float32)
    got = encode_example_native(obs, 200, parts, se3)

    features = b"".join(
        [
            tfr._map_entry(
                "observations", tfr._feature(tfr._float_list(obs.ravel()), 2)
            ),
            tfr._map_entry("class_label", tfr._feature(tfr._int64_list(200), 3)),
            tfr._map_entry(
                "part_labels", tfr._feature(tfr._int64_list(parts.ravel()), 3)
            ),
            tfr._map_entry("se3", tfr._feature(tfr._float_list(se3.ravel()), 2)),
        ]
    )
    want = tfr._len_delimited(1, features)
    assert got == want


def test_native_encoder_fast_path_tiny_parts(rng):
    """Regression (round-2 advisor): with very few part labels the Python
    buffer cap undercut the C++ bound check, so the fast path always
    returned None for those shapes — it must engage (non-None) and stay
    byte-identical to the Python codec."""
    from pointcloudprocessing_tpu.utils.native import (
        encode_example_native,
        native_available,
    )
    import pointcloudprocessing_tpu.data.tfrecord as tfr

    if not native_available():
        import pytest

        pytest.skip("native library unavailable")

    for n in (1, 2, 5):
        obs = rng.normal(size=(n, 3)).astype(np.float32)
        parts = rng.integers(0, 3, n).astype(np.int64)
        se3 = np.eye(3, dtype=np.float32)
        got = encode_example_native(obs, 0, parts, se3)
        assert got is not None, f"fast path defeated at n_parts={n}"
        # compare against the pure-Python contract body, not
        # encode_example (which would itself take the native path)
        features = b"".join(
            [
                tfr._map_entry(
                    "observations", tfr._feature(tfr._float_list(obs.ravel()), 2)
                ),
                tfr._map_entry("class_label", tfr._feature(tfr._int64_list(0), 3)),
                tfr._map_entry(
                    "part_labels", tfr._feature(tfr._int64_list(parts.ravel()), 3)
                ),
                tfr._map_entry("se3", tfr._feature(tfr._float_list(se3.ravel()), 2)),
            ]
        )
        assert got == tfr._len_delimited(1, features)
