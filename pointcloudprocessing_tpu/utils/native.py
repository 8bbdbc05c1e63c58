"""Loader for the C++ runtime accelerators (native/pcp_native.cpp).

The shared library is compiled on demand with g++ (cached next to the
source); every entry point has a pure-Python fallback so the framework works
without a toolchain — just slower on the host-side ingest paths. ctypes is
used for bindings (no pybind11 in this environment).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "pcp_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "libpcp_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _try_load() -> "ctypes.CDLL | None":
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SRC):
            _build_failed = True
            return None
        needs_build = (not os.path.exists(_SO)) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if needs_build:
            flags = ["-O3", "-shared", "-fPIC", "-std=c++17"]
            if os.uname().machine in ("x86_64", "amd64"):
                flags.append("-msse4.2")
            try:
                subprocess.run(
                    ["g++", *flags, "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None

        lib.pcp_crc32c.restype = ctypes.c_uint32
        lib.pcp_crc32c.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint32,
        ]
        lib.pcp_parse_aftr_frame.restype = ctypes.c_int64
        lib.pcp_parse_aftr_frame.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pcp_encode_example.restype = ctypes.c_int64
        lib.pcp_encode_example.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.pcp_read_tfrecord_file.restype = ctypes.c_int64
        lib.pcp_read_tfrecord_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pcp_numpy_uniform.restype = ctypes.c_int64
        lib.pcp_numpy_uniform.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.pcp_ingest_frame.restype = ctypes.c_int64
        lib.pcp_ingest_frame.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pcp_ingest_frames.restype = ctypes.c_int64
        lib.pcp_ingest_frames.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_uint64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pcp_read_tfrecord_chunk.restype = ctypes.c_int64
        lib.pcp_read_tfrecord_chunk.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _try_load() is not None


# ---------------------------------------------------------------------------
# CRC32C
# ---------------------------------------------------------------------------

_py_table: np.ndarray | None = None


def _python_table() -> np.ndarray:
    global _py_table
    if _py_table is None:
        poly = 0x82F63B78
        table = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table[i] = crc
        _py_table = table
    return _py_table


def _crc32c_python(data: bytes, crc: int = 0) -> int:
    table = _python_table()
    crc = ~crc & 0xFFFFFFFF
    for b in data:
        crc = int(table[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return ~crc & 0xFFFFFFFF


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (Castagnoli) of ``data``, optionally continuing ``crc``."""
    lib = _try_load()
    if lib is not None:
        return lib.pcp_crc32c(data, len(data), crc)
    return _crc32c_python(data, crc)


# ---------------------------------------------------------------------------
# AftrBurner frame parsing
# ---------------------------------------------------------------------------


def parse_aftr_frame_native(
    text: bytes, class_vocab: list[str], part_vocab: list[str], max_points: int
):
    """C++ fast path for frame parsing; returns None if the native library is
    unavailable. See data.frames.parse_frame_text for the full contract."""
    lib = _try_load()
    if lib is None:
        return None

    xyz = np.empty((max_points, 3), dtype=np.float32)
    cls = np.empty(max_points, dtype=np.int32)
    part = np.empty(max_points, dtype=np.int32)
    valid = np.empty(max_points, dtype=np.uint8)
    had_unknown = ctypes.c_int32(0)
    non_finite = ctypes.c_int32(0)

    n = lib.pcp_parse_aftr_frame(
        text,
        len(text),
        "\n".join(class_vocab).encode(),
        "\n".join(part_vocab).encode(),
        max_points,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        part.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(had_unknown),
        ctypes.byref(non_finite),
    )
    if n < 0:
        raise ValueError("Malformed frame text")
    return (
        xyz[:n],
        cls[:n],
        part[:n],
        valid[:n].astype(bool),
        bool(had_unknown.value),
        int(non_finite.value),
    )


# ---------------------------------------------------------------------------
# TFRecord fast reader (schema-specific)
# ---------------------------------------------------------------------------

_TFRECORD_ERRORS = {
    -1: "I/O error",
    -2: "corrupt record CRC",
    -3: "malformed record",
    -4: "record count exceeds capacity",
    -5: "unexpected feature length (wrong network_input_width?)",
}


def read_tfrecord_file_native(path: str, width: int, max_records: int):
    """C++ fast path: decode a whole reference-schema TFRecord file into
    (obs (m, width, 3) f32, cls (m,) i64, parts (m, width) i64,
    se3 (m, 3, 3) f32). Returns None when the native library is unavailable;
    raises ValueError on corrupt files."""
    lib = _try_load()
    if lib is None:
        return None

    obs = np.empty((max_records, width, 3), dtype=np.float32)
    cls = np.empty(max_records, dtype=np.int64)
    parts = np.empty((max_records, width), dtype=np.int64)
    se3 = np.empty((max_records, 3, 3), dtype=np.float32)

    n = lib.pcp_read_tfrecord_file(
        path.encode(),
        width,
        max_records,
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        parts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        se3.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n < 0:
        raise ValueError(
            f"{path}: {_TFRECORD_ERRORS.get(int(n), f'error {n}')}"
        )
    return obs[:n], cls[:n], parts[:n], se3[:n]


def read_tfrecord_chunk_native(
    path: str, byte_offset: int, width: int, max_records: int
):
    """C++ chunked reader: decode up to ``max_records`` starting at
    ``byte_offset``. Returns (obs, cls, parts, se3, next_offset) where
    next_offset is -1 at EOF, or None when the native library is unavailable.
    Bounded-memory streaming (data.loader.StreamingLoader) builds on this."""
    lib = _try_load()
    if lib is None:
        return None

    obs = np.empty((max_records, width, 3), dtype=np.float32)
    cls = np.empty(max_records, dtype=np.int64)
    parts = np.empty((max_records, width), dtype=np.int64)
    se3 = np.empty((max_records, 3, 3), dtype=np.float32)
    next_offset = ctypes.c_int64(-1)

    n = lib.pcp_read_tfrecord_chunk(
        path.encode(),
        byte_offset,
        width,
        max_records,
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        parts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        se3.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(next_offset),
    )
    if n < 0:
        raise ValueError(
            f"{path}: {_TFRECORD_ERRORS.get(int(n), f'error {n}')}"
        )
    return obs[:n], cls[:n], parts[:n], se3[:n], int(next_offset.value)


def encode_example_native(
    observations: np.ndarray,
    class_label: int,
    part_labels: np.ndarray,
    se3: np.ndarray,
) -> "bytes | None":
    """C++ fast path for data/tfrecord.py::encode_example — byte-identical
    output (same feature order, packed int64 lists). None when the native
    library is unavailable."""
    lib = _try_load()
    if lib is None:
        return None
    obs = np.ascontiguousarray(observations, dtype="<f4").ravel()
    parts = np.ascontiguousarray(part_labels, dtype=np.int64).ravel()
    se = np.ascontiguousarray(se3, dtype="<f4").ravel()
    # mirror the C++ bound check exactly (pcp_native.cpp: bound =
    # n_obs*4 + 36 + parts_len + cls_len + 512 with parts_len <=
    # n_parts*10, cls_len <= 10) — a smaller cap made the fast path
    # permanently return -1 for tiny part counts (round-2 advisor)
    cap = obs.size * 4 + 36 + parts.size * 10 + 10 + 512
    out = np.empty(cap, np.uint8)
    n = lib.pcp_encode_example(
        obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        obs.size,
        int(class_label),
        parts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        parts.size,
        se.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


# ---------------------------------------------------------------------------
# One-pass frame ingest
# ---------------------------------------------------------------------------

# status codes from pcp_ingest_frame, mapped to the exact FrameError
# messages data/frames.py raises on the Python path
INGEST_STATUS_MESSAGES = {
    1: "Frame contains labels not in the label maps",
    2: "Empty frame",
    3: "Frame has no finite points",
    4: "Malformed frame text",
}


def seed_entropy_words(seed_ints) -> np.ndarray:
    """numpy SeedSequence entropy coercion: each int becomes its little-
    endian uint32 words (at least one word), concatenated in order — the
    exact word stream SeedSequence(list) pools."""
    words: list[int] = []
    for x in seed_ints:
        x = int(x)
        if x < 0:
            # numpy's SeedSequence raises here; a negative int would also
            # never reach 0 under >>= 32 (infinite loop)
            raise ValueError("expected non-negative seed integer")
        if x == 0:
            words.append(0)
            continue
        while x:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
    return np.asarray(words, dtype=np.uint32)


def numpy_uniform_native(seed_ints, low: float, high: float, n: int):
    """Golden-test surface: native uniforms matching
    ``np.random.default_rng(list(seed_ints)).uniform(low, high, n)`` bit for
    bit. None when the native library is unavailable."""
    lib = _try_load()
    if lib is None:
        return None
    entropy = seed_entropy_words(seed_ints)
    out = np.empty(n, np.float64)
    lib.pcp_numpy_uniform(
        entropy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(entropy),
        float(low),
        float(high),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
    )
    return out


def ingest_frame_native(
    text: bytes,
    class_vocab: list[str],
    part_vocab: list[str],
    width: int,
    seed_ints,
    se3: np.ndarray,
):
    """One-pass C++ ingest of a frame: parse -> finite filter -> seeded
    resample -> Example encode -> TFRecord framing.

    Returns ``(status, record, class_id, part_hist)`` where status 0 means
    record is the framed TFRecord bytes (identical to the Python chain) and
    statuses 1-4 map to FrameError messages (INGEST_STATUS_MESSAGES).
    Returns None when the native library is unavailable or the native call
    could not complete (caller falls back to the Python chain)."""
    lib = _try_load()
    if lib is None:
        return None

    entropy = seed_entropy_words(seed_ints)
    se = np.ascontiguousarray(se3, dtype="<f4").ravel()
    if se.size != 9:
        return None
    # framed record bound: obs f32 + parts as <=10-byte varints + proto
    # scaffolding + 16 bytes framing (mirrors the pcp_encode_example bound)
    cap = width * 12 + width * 10 + 10 + 36 + 512 + 16
    record = np.empty(cap, np.uint8)
    hist = np.zeros(max(len(part_vocab), 1), np.int64)
    class_id = ctypes.c_int32(-1)
    status = ctypes.c_int32(0)

    n = lib.pcp_ingest_frame(
        text,
        len(text),
        "\n".join(class_vocab).encode(),
        "\n".join(part_vocab).encode(),
        width,
        entropy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(entropy),
        se.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        record.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        ctypes.byref(class_id),
        hist.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(part_vocab),
        ctypes.byref(status),
    )
    st = int(status.value)
    if n < 0:
        if st in INGEST_STATUS_MESSAGES:
            return (st, None, None, None)
        return None  # capacity/alloc issue: fall back to the Python chain
    return (0, record[:n].tobytes(), int(class_id.value), hist)


def ingest_frames_native(
    paths: list[str],
    class_vocab: list[str],
    part_vocab: list[str],
    width: int,
    base_seed: int,
    idx0: int,
    pose_ok: np.ndarray,
    se3s: np.ndarray,
):
    """Chunked one-pass ingest: one native call reads, parses, resamples,
    encodes, and frames every file in ``paths`` into a shared arena.

    Returns ``(arena, offsets, class_ids, part_hists, statuses)`` — record k
    is ``arena[offsets[k]:offsets[k+1]]`` when ``statuses[k] == 0`` (the
    caller replays failed frames through the per-frame path for exact error
    semantics). None when the native library is unavailable or the call
    could not complete."""
    lib = _try_load()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return None

    joined = b"\0".join(p.encode() for p in paths) + b"\0"
    pose = np.ascontiguousarray(pose_ok, dtype=np.uint8)
    se = np.ascontiguousarray(se3s, dtype="<f4").reshape(n, 9)
    # per-frame bound: obs f32 + parts varints (ids < 512 -> <= 2 bytes) +
    # proto scaffolding + 16 bytes framing
    per_frame = width * 12 + width * 2 + 600 + 16
    arena = np.empty(n * per_frame, np.uint8)
    offsets = np.zeros(n + 1, np.int64)
    class_ids = np.full(n, -1, np.int32)
    hists = np.zeros((n, max(len(part_vocab), 1)), np.int64)
    statuses = np.zeros(n, np.int32)

    rc = lib.pcp_ingest_frames(
        joined,
        n,
        "\n".join(class_vocab).encode(),
        "\n".join(part_vocab).encode(),
        width,
        base_seed,
        idx0,
        pose.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        se.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arena.size,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        class_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hists.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(part_vocab),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc < 0:
        return None
    # record slices are views into the arena — the per-frame bound leaves
    # only ~7% slack over the bytes produced, so keeping the whole arena
    # alive is cheaper than a trim copy (27 MB/chunk measured)
    return arena, offsets, class_ids, hists, statuses
