"""Host->device data loading with background prefetch.

Replaces the reference's tf.data pipeline (interleave/shuffle/repeat/map/
batch/prefetch — PointCloudSet.py:347-363) with a TPU-first design:

- :class:`DeviceLoader`: the split lives in host numpy arrays (decoded once
  from TFRecords); batches are assembled with a per-epoch permutation
  (epoch-level shuffle — strictly stronger mixing than tf.data's 2048-record
  window).
- :class:`StreamingLoader`: out-of-core variant for splits larger than host
  RAM — interleaves chunked TFRecord reads (C++ resumable reader) through a
  fixed-size windowed shuffle buffer, reproducing the reference's
  interleave(cycle=2)/shuffle(2048)/repeat semantics with bounded RSS.
- Both stage batches onto the device from a background thread
  (``jax.device_put``) while the current step runs — double-buffered
  prefetch, so the accelerator never waits on the host.
- Jitter augmentation is NOT applied here: it runs inside the jitted train
  step (ops.augment.jitter) so augmentation + model compile into one XLA
  program per batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np
import jax


class DeviceLoader:
    """Infinite (repeating) shuffled batch iterator over a split.

    Yields ``(x, targets)`` like the reference pipeline: x (b, n, 3) float32
    and targets {classification_output (b,), segmentation_output (b, n),
    se3 (b, 3, 3)} (PointCloudSet._parse_function, :325-345).
    """

    #: device-resident auto-select budget: splits up to this many bytes
    #: live in HBM whole (16 GB on v5e; leave room for model + pipeline)
    RESIDENT_BUDGET_BYTES = 4 * 1024**3

    def __init__(
        self,
        arrays: dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int | None = None,
        drop_remainder: bool = True,
        device_resident: bool | None = None,
    ):
        self._arrays = arrays
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._drop_remainder = drop_remainder
        # device-resident mode: upload the whole split ONCE and assemble
        # every batch on device (per-epoch permutation gather — ~1 ms for
        # a GB-scale split vs re-uploading it every epoch). Two reasons:
        # (a) host->device bandwidth is the flagship epoch's ceiling on
        # remote-attached rigs (tunnel ~25 MB/s, docs/PERF.md); (b) the
        # axon tunnel client RETAINS every uploaded buffer (measured
        # ~0.8 MB RSS per 0.786 MB device_put, surviving gc) — a full
        # kc46 run re-uploading 944 MB/epoch was OOM-killed at 130 GB RSS.
        # None = auto: on for accelerator backends when the split fits the
        # budget. Batch composition is bit-identical to host staging (the
        # same _batch_indices drive a device-side gather).
        if device_resident is None:
            nbytes = sum(a.nbytes for a in arrays.values()) if arrays else 0
            device_resident = (
                jax.default_backend() in ("tpu", "axon", "gpu")
                and 0 < nbytes <= self.RESIDENT_BUDGET_BYTES
            )
        self._resident = bool(device_resident)
        self._dev_arrays = None
        # (mesh, dev_arrays, real_counts, jitted_local_gather)
        self._shard_cache: tuple | None = None

    def __len__(self) -> int:
        return len(self._arrays["class_label"])

    @property
    def steps_per_epoch(self) -> int:
        return max(len(self) // self._batch_size, 0)

    def _epoch_rng(self, epoch: int | None) -> np.random.Generator:
        """Per-epoch deterministic shuffling when seeded: epoch k's order
        depends only on (seed, k), so a resumed run replays the exact batch
        sequence of an uninterrupted one (mid-stage resume)."""
        if epoch is not None and self._seed is not None:
            return np.random.default_rng((self._seed, epoch))
        return self._rng

    def _batch_indices(self, epoch: int | None = None) -> Iterator[np.ndarray]:
        n = len(self)
        if n == 0:
            return
        current = epoch
        while True:
            rng = self._epoch_rng(current)
            order = rng.permutation(n) if self._shuffle else np.arange(n)
            end = n - (n % self._batch_size) if self._drop_remainder else n
            if end == 0:
                # fewer samples than one batch: sample with replacement
                yield rng.choice(n, self._batch_size)
            else:
                for start in range(0, end, self._batch_size):
                    yield order[start : start + self._batch_size]
            if current is not None:
                current += 1

    def _make_batch(self, idx: np.ndarray):
        x = self._arrays["observations"][idx]
        targets = {
            "classification_output": self._arrays["class_label"][idx],
            "segmentation_output": self._arrays["part_labels"][idx],
            "se3": self._arrays["se3"][idx],
        }
        return x, targets

    def batches(
        self,
        num_steps: int | None = None,
        device=None,
        prefetch: int = 2,
        epoch: int | None = None,
    ):
        """Iterate device-resident batches with background prefetch.

        Args:
          num_steps: stop after this many batches (None = infinite).
          device: jax device or Sharding for device_put (None = default).
          prefetch: queue depth for the staging thread.
          epoch: optional epoch index for deterministic per-epoch shuffling
            (requires a seeded loader); None keeps the stateful stream.
        """
        if len(self) == 0:
            return
        if self._resident and device is None:
            yield from self._resident_batches(num_steps, epoch)
            return
        host_batches = (self._make_batch(idx) for idx in self._batch_indices(epoch))
        yield from _prefetch_to_device(host_batches, num_steps, device, prefetch)

    # -- device-resident path -------------------------------------------------

    def _device_arrays(self):
        if self._dev_arrays is None:
            arrays = dict(self._arrays)
            shrunk = _shrunk_u8(arrays.get("part_labels"))
            if shrunk is not None:  # wire shrink paid ONCE (see _shrunk_u8)
                arrays["part_labels"] = shrunk
            self._dev_arrays = jax.device_put(arrays)
        return self._dev_arrays

    def chunks(self, chunk: int, num_steps: int | None = None,
               epoch: int | None = None, mesh=None):
        """Device-resident STACKED-chunk stream for the scanned train step:
        yields (xs (k, b, n, 3), targets {... (k, b, ...)}) with k == chunk
        except possibly the last. One device gather per chunk — no per-step
        slicing, no host staging, no re-stacking (each of those is a
        ~2-4 ms tunnel dispatch; at 900 steps/epoch the per-step form costs
        more than the training compute). Only available in device-resident
        mode (None otherwise — callers fall back to batches()).

        With ``mesh`` (a 1-D ``data`` Mesh), the split is uploaded ONCE
        sharded over the mesh's data axis and every chunk assembles via
        shard-LOCAL gathers (shard_map) — no cross-device traffic and no
        per-epoch re-upload (see :meth:`_sharded_chunk_iter` for the batch
        composition semantics). Requires a seeded SHUFFLING loader
        (shuffle=True), an epoch index at iteration time, batch_size
        divisible by the data-axis size, at least one full batch of records,
        and a mesh without an active points axis; returns None otherwise
        (callers fall back to host staging)."""
        if not (self._resident and len(self)):
            return None
        if mesh is None:
            return self._chunk_iter(chunk, num_steps, epoch)
        if (
            self._seed is None
            or epoch is None
            or not self._shuffle
            or "data" not in mesh.axis_names
            or any(
                mesh.shape[ax] > 1 for ax in mesh.axis_names if ax != "data"
            )
            or self._batch_size % mesh.shape["data"] != 0
            or len(self) < self._batch_size
        ):
            return None
        return self._sharded_chunk_iter(chunk, num_steps, epoch, mesh)

    # -- sharded (multi-device) resident path ----------------------------------

    def _sharded_device_arrays(self, mesh):
        """Upload the split ONCE sharded over the mesh's data axis.

        Rows are distributed ROUND-ROBIN (row r -> shard r % n_data) and each
        shard is padded to the common length m = ceil(N / n_data) by
        repeating its first row (pad slots are never indexed). Round-robin
        keeps shard sizes within one row of each other, which guarantees
        every shard can supply b_local rows for all N // batch_size steps of
        an epoch without replacement."""
        if self._shard_cache is not None and self._shard_cache[0] is mesh:
            return self._shard_cache[1:]
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        n = len(self)
        m = -(-n // n_data)
        layout = np.empty(n_data * m, np.int64)
        real = np.empty(n_data, np.int64)
        for s in range(n_data):
            rows = np.arange(s, n, n_data)
            real[s] = len(rows)
            layout[s * m : s * m + len(rows)] = rows
            layout[s * m + len(rows) : (s + 1) * m] = rows[0] if len(rows) else 0
        arrays = dict(self._arrays)
        shrunk = _shrunk_u8(arrays.get("part_labels"))
        if shrunk is not None:  # wire shrink paid ONCE (see _shrunk_u8)
            arrays["part_labels"] = shrunk
        sharding = NamedSharding(mesh, P("data"))
        dev = {k: jax.device_put(a[layout], sharding) for k, a in arrays.items()}

        def local_gather(arrs, idx):
            loc = idx[:, 0]  # (k, b_local) — this shard's slots
            return jax.tree_util.tree_map(lambda a: a[loc], arrs)

        gather = jax.jit(
            jax.shard_map(
                local_gather,
                mesh=mesh,
                in_specs=(P("data"), P(None, "data")),
                out_specs=P(None, "data"),
                check_vma=False,
            )
        )
        self._shard_cache = (mesh, dev, real, gather)
        return dev, real, gather

    def _sharded_chunk_iter(self, chunk, num_steps, epoch, mesh):
        """Stacked chunks assembled by shard-LOCAL gathers over the mesh.

        Batch composition: each of the mesh's n_data shards contributes
        b_local = batch // n_data rows drawn from a per-shard per-epoch
        permutation (rng = default_rng((seed, epoch, shard))) of the rows the
        round-robin layout assigned it. Every record appears exactly once per
        epoch (up to the standard drop-remainder tail) and the sequence is
        epoch-addressable for mid-stage resume — but the composition is NOT
        bit-identical to single-device host staging: this is standard
        per-shard data-parallel sharding (each replica owns a fixed 1/n of
        the data, reshuffled within its shard per epoch), chosen so batch
        assembly never crosses a shard boundary. A global permutation would
        force XLA to either all-gather the split or all-to-all every batch.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        dev, real, gather = self._sharded_device_arrays(mesh)
        n_data = mesh.shape["data"]
        b_local = self._batch_size // n_data
        steps = num_steps if num_steps is not None else len(self) // self._batch_size

        # per-shard epoch index streams: (steps, b_local) local slots each;
        # np.resize cycles if a caller asks for more steps than one epoch
        # holds (the trainer's N // batch never does — round-robin layout
        # guarantees real[s] >= steps * b_local there)
        per_shard = [
            np.resize(
                np.random.default_rng((self._seed, epoch, s)).permutation(real[s]),
                max(steps * b_local, 1),
            ).reshape(steps, b_local)
            for s in range(n_data)
        ]
        idx_all = np.stack(per_shard, axis=1).astype(np.int32)  # (steps, n_data, b_local)
        idx_sharding = NamedSharding(mesh, P(None, "data"))

        for start in range(0, steps, chunk):
            idx = jax.device_put(
                idx_all[start : start + chunk], idx_sharding
            )
            batch = gather(dev, idx)  # leaves (k, b, ...), b sharded on 'data'
            xs = batch["observations"]
            targets = {
                "classification_output": batch["class_label"],
                "segmentation_output": batch["part_labels"],
                "se3": batch["se3"],
            }
            yield xs, targets

    def _chunk_iter(self, chunk, num_steps, epoch):
        import jax.numpy as jnp

        dev = self._device_arrays()

        @jax.jit
        def gather(arrs, idx):
            return jax.tree_util.tree_map(lambda a: a[idx], arrs)

        produced = 0
        it = self._batch_indices(epoch)
        while num_steps is None or produced < num_steps:
            take = chunk if num_steps is None else min(chunk, num_steps - produced)
            idx_rows = []
            for _ in range(take):
                try:
                    idx_rows.append(next(it))
                except StopIteration:
                    break
            if not idx_rows:
                return
            idx = jnp.asarray(np.stack(idx_rows).astype(np.int32))
            batch = gather(dev, idx)  # leaves (k, b, ...)
            xs = batch["observations"]
            targets = {
                "classification_output": batch["class_label"],
                "segmentation_output": batch["part_labels"],
                "se3": batch["se3"],
            }
            yield xs, targets
            produced += len(idx_rows)

    def _resident_batches(self, num_steps, epoch):
        """Per-step batches assembled on device (chunked gathers + slices).
        Prefer :meth:`chunks` for the scanned trainer — per-step slicing
        costs a dispatch per leaf."""
        for xs, targets in self._chunk_iter(64, num_steps, epoch):
            for k in range(xs.shape[0]):
                yield xs[k], jax.tree_util.tree_map(lambda a, k=k: a[k], targets)


class _ProducerFailure:
    """Queue envelope carrying a producer-thread exception to the consumer
    (a dead producer must surface its error, not hang ``q.get()``)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _shrunk_u8(seg):
    """uint8 view of an integer part-label plane when the vocab fits, else
    None. The single source of truth for the wire-shrink predicate — used by
    per-batch staging (_shrink_for_wire) and both resident uploads
    (_device_arrays, _sharded_device_arrays), so all paths stage the same
    dtype. Part ids are tiny (12 classes in the flagship configs), so uint8
    cuts the per-cloud wire bytes ~18% at 8192 pts. This matters on
    remote-attached devices — the axon tunnel moves ~25 MB/s and the
    flagship training loop is UPLOAD-bound (docs/PERF.md round 3) — and
    costs nothing on local PCIe. Numerics are unchanged: the loss casts
    labels to int32 on device (train/losses.py) and metric compares promote
    integer dtypes."""
    if (
        seg is not None
        and seg.dtype in (np.int32, np.int64)
        and seg.size
        and 0 <= seg.min()
        and seg.max() < 256
    ):
        return seg.astype(np.uint8)
    return None


def _shrink_for_wire(batch):
    """Apply the part-label wire shrink (see _shrunk_u8) to one host batch
    before its host->device transfer."""
    x, targets = batch
    seg = targets.get("segmentation_output") if isinstance(targets, dict) else None
    shrunk = _shrunk_u8(seg)
    if shrunk is not None:
        return x, dict(targets, segmentation_output=shrunk)
    return batch


def _prefetch_to_device(
    host_batches, num_steps, device, prefetch: int = 2, pushback=None
):
    """Stage host batches onto the device from a background thread.

    ``pushback``: optional callable receiving batches that were pulled from
    ``host_batches`` but never delivered (consumer abandoned the generator)
    — lets a persistent stream (StreamingLoader) keep its no-record-dropped
    contract. Recovered batches may be re-delivered slightly out of order
    relative to each other, which is harmless downstream of a shuffle.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def _put(item) -> bool:
        """Put that never blocks forever: gives up when the consumer
        abandoned the generator (stop set)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        produced = 0
        it = iter(host_batches)
        # check the budget BEFORE pulling: a persistent stream (StreamingLoader)
        # must not have a batch consumed and discarded at the epoch boundary
        while not stop.is_set() and (num_steps is None or produced < num_steps):
            try:
                batch = next(it)
            except StopIteration:
                break
            except BaseException as e:  # forward, never die silently
                _put(_ProducerFailure(e))
                return
            try:
                batch = _shrink_for_wire(batch)
                if device is not None:
                    batch = jax.device_put(batch, device)
                else:
                    batch = jax.device_put(batch)
            except BaseException as e:
                _put(_ProducerFailure(e))
                return
            if not _put(batch):
                if pushback is not None:
                    pushback(batch)  # consumer left: keep the pulled batch
                return
            produced += 1
        _put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            if isinstance(batch, _ProducerFailure):
                raise batch.exc
            yield batch
    finally:
        stop.set()

        def _drain_once() -> bool:
            try:
                item = q.get_nowait()
            except queue.Empty:
                return False
            if item is not None and not isinstance(item, _ProducerFailure):
                if pushback is not None:
                    pushback(item)
            return True

        # drain so a blocked producer can observe stop and exit; staged
        # batches the consumer never saw go back via pushback
        while thread.is_alive():
            if not _drain_once():
                thread.join(timeout=0.2)
        thread.join(timeout=1.0)
        while _drain_once():
            pass


class StreamingLoader:
    """Out-of-core repeating batch iterator over TFRecord files.

    Reproduces the reference pipeline's streaming semantics
    (``list_files -> interleave(cycle_length=2) -> shuffle(2048) -> repeat``,
    PointCloudSet.py:347-363) without materializing the split: files are read
    in fixed-size record chunks (C++ resumable reader, Python fallback),
    interleaved round-robin, and mixed through a windowed shuffle buffer.
    Host memory is bounded by
    ``(shuffle_window + interleave * chunk_records + batch) * record_size``.

    The windowed shuffle swaps whole chunks against distinct random buffer
    slots (lossless; every record is emitted exactly once per epoch) rather
    than tf.data's per-record swap — same window locality, vectorized.

    Seeded loaders are epoch-addressable through ``batches(epoch=k)`` —
    bit-exact replay for mid-stage resume (see :meth:`batches`).
    """

    def __init__(
        self,
        files: list[str],
        width: int,
        batch_size: int,
        count: int,
        shuffle_window: int = 2048,
        seed: int | None = None,
        interleave: int = 2,
        chunk_records: int = 256,
        use_native: bool = True,
    ):
        self._files = list(files)
        self._width = width
        self._batch_size = batch_size
        self._count = count
        self._window = max(shuffle_window, 1)
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._interleave = max(interleave, 1)
        self._chunk_records = max(min(chunk_records, self._window), 1)
        self._use_native = use_native
        # ONE persistent repeat-stream across batches() calls (like tf.data's
        # repeat()): restarting per epoch would abandon the records sitting in
        # the shuffle buffer, silently skipping ~shuffle_window records/epoch
        self._stream = None
        # batches staged by prefetch but never delivered (consumer abandoned
        # a batches() call mid-epoch); re-delivered first on the next call
        self._pending: list = []

    def __len__(self) -> int:
        return self._count

    @property
    def steps_per_epoch(self) -> int:
        return max(self._count // self._batch_size, 0)

    # -- record streaming ---------------------------------------------------

    def _read_chunk(self, path: str, offset: int):
        """((obs, cls, parts, se3), next_offset) starting at byte offset.

        ``offset``/``next_offset`` are BYTE positions in both the native and
        Python paths, so chunked epochs cost one linear pass per file (a
        record-skipping fallback would re-read O(records^2) per epoch)."""
        if self._use_native:
            from pointcloudprocessing_tpu.utils.native import (
                read_tfrecord_chunk_native,
            )

            native = read_tfrecord_chunk_native(
                path, offset, self._width, self._chunk_records
            )
            if native is not None:
                obs, cls, parts, se3 = native[:4]
                return (obs, cls.astype(np.int32), parts.astype(np.int32), se3), native[4]

        import struct

        from pointcloudprocessing_tpu.data import tfrecord

        obs_l, cls_l, parts_l, se3_l = [], [], [], []
        next_offset = -1
        with open(path, "rb") as f:
            f.seek(offset)
            while len(cls_l) < self._chunk_records:
                header = f.read(8)
                if len(header) < 8:
                    break  # clean EOF
                (length,) = struct.unpack("<Q", header)
                (len_crc,) = struct.unpack("<I", f.read(4))
                if tfrecord.masked_crc32c(header) != len_crc:
                    raise ValueError(f"{path}: corrupt record length CRC")
                record = f.read(length)
                (data_crc,) = struct.unpack("<I", f.read(4))
                if tfrecord.masked_crc32c(record) != data_crc:
                    raise ValueError(f"{path}: corrupt record data CRC")
                ex = tfrecord.decode_example(record)
                obs_l.append(ex["observations"].reshape(self._width, 3))
                cls_l.append(np.int32(ex["class_label"][0]))
                parts_l.append(ex["part_labels"].astype(np.int32))
                se3_l.append(ex["se3"].reshape(3, 3))
            else:
                # capacity reached — resume here unless the file is exhausted
                pos = f.tell()
                if len(f.read(8)) == 8:
                    next_offset = pos
        if not obs_l:
            return None, -1
        return (
            (np.stack(obs_l), np.asarray(cls_l), np.stack(parts_l), np.stack(se3_l)),
            next_offset,
        )

    def _interleaved_chunks(self, rng, single_epoch: bool = False):
        """Chunk stream: per epoch, shuffle file order and round-robin
        ``interleave`` concurrently-open files. Infinite unless
        ``single_epoch`` (the epoch-addressable mode)."""
        while True:
            order = rng.permutation(len(self._files))
            pending = [self._files[i] for i in order]
            open_files: list[list] = []  # [path, offset]
            while pending or open_files:
                while pending and len(open_files) < self._interleave:
                    open_files.append([pending.pop(0), 0])
                advanced = []
                for entry in open_files:
                    chunk, nxt = self._read_chunk(entry[0], entry[1])
                    if chunk is not None:
                        yield chunk
                    if nxt >= 0:
                        entry[1] = nxt
                        advanced.append(entry)
                open_files = advanced
            yield None  # epoch boundary marker
            if single_epoch:
                return

    def _examples(self, rng, single_epoch: bool = False):
        """Windowed-shuffle example stream (obs, cls, part, se3 batches of
        irregular size; epoch boundaries flush the buffer)."""
        w, width = self._window, self._width
        buf_obs = np.zeros((w, width, 3), np.float32)
        buf_cls = np.zeros((w,), np.int32)
        buf_parts = np.zeros((w, width), np.int32)
        buf_se3 = np.zeros((w, 3, 3), np.float32)
        filled = 0

        for chunk in self._interleaved_chunks(rng, single_epoch):
            if chunk is None:
                # epoch boundary: flush the buffer in random order
                order = rng.permutation(filled)
                if filled:
                    yield (
                        buf_obs[order], buf_cls[order],
                        buf_parts[order], buf_se3[order],
                    )
                filled = 0
                continue
            obs, cls, parts, se3 = chunk
            m = len(cls)
            start = 0
            while start < m:
                if filled < w:
                    # top the buffer up before any swapping — unfilled slots
                    # must never be emitted
                    take = min(w - filled, m - start)
                    buf_obs[filled:filled + take] = obs[start:start + take]
                    buf_cls[filled:filled + take] = cls[start:start + take]
                    buf_parts[filled:filled + take] = parts[start:start + take]
                    buf_se3[filled:filled + take] = se3[start:start + take]
                    filled += take
                else:
                    # buffer full: swap against distinct random slots
                    take = min(m - start, w)
                    slots = rng.choice(w, size=take, replace=False)
                    # fancy indexing already copies — no extra .copy()
                    yield (
                        buf_obs[slots], buf_cls[slots],
                        buf_parts[slots], buf_se3[slots],
                    )
                    buf_obs[slots] = obs[start:start + take]
                    buf_cls[slots] = cls[start:start + take]
                    buf_parts[slots] = parts[start:start + take]
                    buf_se3[slots] = se3[start:start + take]
                start += take

    def _host_batches(self, rng, single_epoch: bool = False):
        """Assemble fixed-size batches from the example stream."""
        b, width = self._batch_size, self._width
        acc_obs = np.zeros((b, width, 3), np.float32)
        acc_cls = np.zeros((b,), np.int32)
        acc_parts = np.zeros((b, width), np.int32)
        acc_se3 = np.zeros((b, 3, 3), np.float32)
        n = 0
        for obs, cls, parts, se3 in self._examples(rng, single_epoch):
            start = 0
            while start < len(cls):
                room = b - n
                take = min(room, len(cls) - start)
                acc_obs[n:n + take] = obs[start:start + take]
                acc_cls[n:n + take] = cls[start:start + take]
                acc_parts[n:n + take] = parts[start:start + take]
                acc_se3[n:n + take] = se3[start:start + take]
                n += take
                start += take
                if n == b:
                    yield (
                        acc_obs.copy(),
                        {
                            "classification_output": acc_cls.copy(),
                            "segmentation_output": acc_parts.copy(),
                            "se3": acc_se3.copy(),
                        },
                    )
                    n = 0

    def batches(
        self,
        num_steps: int | None = None,
        device=None,
        prefetch: int = 2,
        epoch: int | None = None,
    ):
        """Iterate device-resident batches with background prefetch.

        With a seeded loader and an ``epoch`` index, the stream is
        EPOCH-ADDRESSABLE: epoch k's batch sequence depends only on
        (files, seed, k) — file order, windowed-shuffle swaps, and the
        boundary flush all draw from ``default_rng((seed, k))``, and the
        batch accumulator starts fresh — so a resumed run replays the exact
        batch order of an uninterrupted one (mid-stage resume, matching
        DeviceLoader). The tail ``count % batch_size`` records of each epoch
        are dropped in this mode (tf.data ``drop_remainder`` semantics).

        Unseeded (or ``epoch=None``) keeps the reference's persistent
        repeat-stream behavior: batches straddle epoch boundaries and no
        record is ever dropped.
        """
        if not self._files or self._count == 0:
            return
        if (
            epoch is not None
            and self._seed is not None
            and self._count >= self._batch_size
        ):
            rng = np.random.default_rng((self._seed, epoch))
            stream = self._host_batches(rng, single_epoch=True)
            yield from _prefetch_to_device(stream, num_steps, device, prefetch)
            return
        # a split smaller than one batch can never fill an epoch-addressable
        # (drop-remainder) epoch — fall back to the persistent repeat-stream
        # so a forced-streaming tiny split still trains on real batches (the
        # reference's tf.data repeat semantics) instead of silently yielding
        # nothing (round-2 advisor)
        if self._stream is None:
            self._stream = self._host_batches(self._rng)

        def stream_with_pending():
            # batches recovered from an abandoned batches() call (prefetch
            # staged them but the consumer left) are delivered first —
            # keeps the persistent stream's no-record-dropped contract.
            # NO `yield from self._stream`: closing this throwaway wrapper
            # (GC after each batches() call) would propagate GeneratorExit
            # through the delegation and permanently close the persistent
            # stream; explicit next() pulls leave it suspended instead.
            while self._pending:
                yield self._pending.pop(0)
            while True:
                try:
                    item = next(self._stream)
                except StopIteration:
                    return
                yield item

        yield from _prefetch_to_device(
            stream_with_pending(), num_steps, device, prefetch,
            pushback=self._pending.append,
        )
