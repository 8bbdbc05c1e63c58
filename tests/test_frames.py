"""Frame/pose-log parser tests (native C++ path and Python fallback)."""

import numpy as np
import pytest

from pointcloudprocessing_tpu.data import frames
from pointcloudprocessing_tpu.data.frames import FrameError
from pointcloudprocessing_tpu.utils import native_available

from helpers import make_collect, CLASS_LABELS, PART_LABELS

CLASS_MAP = {name: i for i, name in enumerate(CLASS_LABELS)}
PART_MAP = {name: i for i, name in enumerate(PART_LABELS)}


FRAME_TEXT = """(1.0, 2.0, 3.0) kc-46 wing
(4.5, -1.25, 0.0) kc-46 engine
(-2.0, 0.5, 9.75) kc-46 fuselage
"""


def test_parse_frame_basic():
    pts, cls, parts = frames.parse_frame_text(FRAME_TEXT, CLASS_MAP, PART_MAP)
    np.testing.assert_allclose(
        pts, [[1, 2, 3], [4.5, -1.25, 0], [-2, 0.5, 9.75]], atol=1e-6
    )
    assert cls == CLASS_MAP["kc-46"]
    np.testing.assert_array_equal(parts, [PART_MAP["wing"], PART_MAP["engine"], PART_MAP["fuselage"]])


def test_parse_frame_unknown_label_rejects_frame():
    text = FRAME_TEXT + "(0, 0, 0) unknown-class wing\n"
    with pytest.raises(FrameError):
        frames.parse_frame_text(text, CLASS_MAP, PART_MAP)
    with pytest.raises(FrameError):
        frames.parse_frame_text(
            FRAME_TEXT + "(0, 0, 0) kc-46 not-a-part\n", CLASS_MAP, PART_MAP
        )


def test_parse_frame_non_finite_dropped():
    text = FRAME_TEXT + "(nan, 0, 0) kc-46 wing\n(inf, 1, 1) kc-46 engine\n"
    pts, cls, parts = frames.parse_frame_text(text, CLASS_MAP, PART_MAP)
    assert pts.shape == (3, 3)
    assert np.isfinite(pts).all()


def test_parse_frame_python_fallback_agrees():
    got_native = frames.parse_frame_text(FRAME_TEXT, CLASS_MAP, PART_MAP)
    got_py = frames._parse_frame_text_python(FRAME_TEXT, CLASS_MAP, PART_MAP)
    np.testing.assert_allclose(got_native[0], got_py[0], atol=1e-6)
    assert got_native[1] == got_py[1]
    np.testing.assert_array_equal(got_native[2], got_py[2])


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_native_parser_loaded():
    assert native_available()


def test_state_info_parsing(tmp_path):
    collect = make_collect(str(tmp_path), num_frames=4)
    import glob, os

    log = glob.glob(os.path.join(collect, "_palindrome_state__*.log"))[0]
    info = frames.parse_state_info(log)
    assert set(info.keys()) == {0, 1, 2, 3}
    for i, entry in info.items():
        assert entry["Sensor Pose"].shape == (4, 4)
        assert entry["Tanker Pose"].shape == (4, 4)
        rel = entry["tanker_in_sensor_frame"]
        assert rel.shape == (4, 4)
        # sensor pose is identity in the fixture, so relative == tanker pose
        np.testing.assert_allclose(rel, entry["Tanker Pose"], atol=1e-12)
        # rotation block is orthogonal
        r = rel[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)


def test_state_info_column_major_decode(tmp_path):
    """SE3 blocks are stored column-major (PointCloudSet.py:497-501)."""
    log = tmp_path / "_palindrome_state__x.log"
    pose = np.arange(16, dtype=float).reshape(4, 4)
    row = ["t0", "0"] + [str(v) for v in pose.T.ravel()]
    log.write_text("Time   Frame   Sensor Pose\n" + " ".join(row) + "\n")
    info = frames.parse_state_info(str(log))
    np.testing.assert_array_equal(info[0]["Sensor Pose"], pose)


def test_write_aftr_frame_roundtrip(tmp_path):
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    labels = np.array([["kc-46", "wing"], ["kc-46", "engine"]])
    path = str(tmp_path / "frame_0.txt")
    frames.write_aftr_frame(path, pts, labels)
    back_pts, cls, parts = frames.parse_frame_file(path, CLASS_MAP, PART_MAP)
    np.testing.assert_allclose(back_pts, pts, atol=1e-6)
    assert cls == CLASS_MAP["kc-46"]
    np.testing.assert_array_equal(parts, [PART_MAP["wing"], PART_MAP["engine"]])


def test_write_aftr_frame_validation(tmp_path, capsys):
    frames.write_aftr_frame(str(tmp_path / "f.txt"), np.zeros((3, 2)))
    assert "must be shape (N, 3)" in capsys.readouterr().out
    frames.write_aftr_frame(
        str(tmp_path / "f.txt"), np.zeros((3, 3)), np.array(["a"])
    )
    assert "number of labels" in capsys.readouterr().out


def test_native_parser_leading_zeros():
    """Regression: zero-padded and deep-subnormal-looking decimals must
    not exhaust the fast parser's significant-digit budget (they parsed
    as 0.0 before the fix)."""
    from pointcloudprocessing_tpu.utils.native import (
        parse_aftr_frame_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    text = (
        "(00000000000000000005, 0.0000000000000000001234, "
        "000000000000000000000.5) kc-46 wing\n"
    ).encode()
    xyz, *_ = parse_aftr_frame_native(text, ["kc-46"], ["wing"], 4)
    np.testing.assert_array_equal(
        xyz[0], np.float32([5.0, 1.234e-19, 0.5])
    )


def test_native_parser_hex_floats():
    """Regression (round-2 advisor): hex-float tokens ("0x1p3") must route
    whole to the strtod fallback — the fast path previously consumed the
    leading '0' and rejected the line as malformed."""
    from pointcloudprocessing_tpu.utils.native import (
        parse_aftr_frame_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    text = "(0x1p3, -0X1.8p1, 0.5) kc-46 wing\n".encode()
    xyz, *_ = parse_aftr_frame_native(text, ["kc-46"], ["wing"], 4)
    np.testing.assert_array_equal(xyz[0], np.float32([8.0, -3.0, 0.5]))
