"""Host->device data loading with background prefetch.

Replaces the reference's tf.data pipeline (interleave/shuffle/repeat/map/
batch/prefetch — PointCloudSet.py:347-363) with a TPU-first design:

- The split lives in pinned host numpy arrays (decoded once from TFRecords).
- Batches are assembled with a per-epoch permutation (epoch-level shuffle —
  strictly stronger mixing than tf.data's 2048-record window).
- A background thread stages the next batches onto the device
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

    def __init__(
        self,
        arrays: dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int | None = None,
        drop_remainder: bool = True,
    ):
        self._arrays = arrays
        self._batch_size = batch_size
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._drop_remainder = drop_remainder

    def __len__(self) -> int:
        return len(self._arrays["class_label"])

    @property
    def steps_per_epoch(self) -> int:
        return max(len(self) // self._batch_size, 0)

    def _batch_indices(self) -> Iterator[np.ndarray]:
        n = len(self)
        if n == 0:
            return
        while True:
            order = self._rng.permutation(n) if self._shuffle else np.arange(n)
            end = n - (n % self._batch_size) if self._drop_remainder else n
            if end == 0:
                # fewer samples than one batch: sample with replacement
                yield self._rng.choice(n, self._batch_size)
                continue
            for start in range(0, end, self._batch_size):
                yield order[start : start + self._batch_size]

    def _make_batch(self, idx: np.ndarray):
        x = self._arrays["observations"][idx]
        targets = {
            "classification_output": self._arrays["class_label"][idx],
            "segmentation_output": self._arrays["part_labels"][idx],
            "se3": self._arrays["se3"][idx],
        }
        return x, targets

    def batches(self, num_steps: int | None = None, device=None, prefetch: int = 2):
        """Iterate device-resident batches with background prefetch.

        Args:
          num_steps: stop after this many batches (None = infinite).
          device: jax device or Sharding for device_put (None = default).
          prefetch: queue depth for the staging thread.
        """
        if len(self) == 0:
            return

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
            for idx in self._batch_indices():
                if stop.is_set() or (num_steps is not None and produced >= num_steps):
                    break
                batch = self._make_batch(idx)
                if device is not None:
                    batch = jax.device_put(batch, device)
                else:
                    batch = jax.device_put(batch)
                if not _put(batch):
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
                yield batch
        finally:
            stop.set()
            # drain so a blocked producer can observe stop and exit
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    thread.join(timeout=0.2)
            thread.join(timeout=1.0)
