"""Training callbacks: early stopping, best-checkpointing, Ctrl-C handling,
mid-stage resume.

Parity targets in pointnet_train.py:
- EarlyStopping(monitor, mode='min', patience, restore_best_weights=True)
  (:199-205).
- ModelCheckpoint(save_best_only=True, monitor, mode='min', per epoch)
  (:207-214) — here an Orbax checkpoint directory instead of a .keras file.
- CtrlC_InterruptHandler (:42-61): first SIGINT requests a stop after the
  current epoch; the second hard-exits.

Beyond the reference (which restarts a killed stage from epoch 0 with a
fresh optimizer): :class:`ResumeCheckpoint` periodically persists the FULL
TrainState (params, batch_stats, optimizer state, step counter) plus the
epoch index, history-so-far, and early-stopping counters, so a killed stage
continues exactly where it stopped — same LR schedule position, same rng
stream, same monitor bookkeeping.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import sys
from typing import Any, Callable

import jax
import orbax.checkpoint as ocp


class EarlyStopping:
    def __init__(self, patience: int, print_func: Callable[[str], None] = print):
        self.patience = patience
        self.best = float("inf")
        self.best_epoch = -1
        self.best_state = None
        self.wait = 0
        self._print = print_func

    def update(self, epoch: int, monitor_value: float, state) -> bool:
        """Record this epoch; returns True when training should stop."""
        if monitor_value < self.best:
            self.best = monitor_value
            self.best_epoch = epoch
            # keep a host copy so the best weights survive device donation
            self.best_state = jax.device_get(state)
            self.wait = 0
            return False
        self.wait += 1
        if self.wait >= self.patience:
            self._print(
                f"Early stopping at epoch {epoch + 1}; best epoch was "
                f"{self.best_epoch + 1} (monitor {self.best:.6f})."
            )
            return True
        return False


class BestCheckpoint:
    """Save-best-only Orbax checkpointing of {params, batch_stats}."""

    def __init__(self, directory: str, print_func: Callable[[str], None] = print):
        self.directory = os.path.abspath(directory)
        self.best = float("inf")
        self._print = print_func
        self._ckptr = ocp.StandardCheckpointer()

    def update(self, epoch: int, monitor_value: float, state) -> None:
        if monitor_value >= self.best:
            return
        self.best = monitor_value
        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        path = os.path.join(self.directory, "best")
        self._ckptr.save(path, payload, force=True)
        self._print(
            f"Epoch {epoch + 1}: monitor improved to {monitor_value:.6f}, "
            f"saving model to {path}"
        )

    def wait_until_finished(self):
        self._ckptr.wait_until_finished()


def load_checkpoint(directory: str) -> dict:
    """Load a BestCheckpoint payload ({params, batch_stats})."""
    path = os.path.join(os.path.abspath(directory), "best")
    return ocp.StandardCheckpointer().restore(path)


class ResumeCheckpoint:
    """Periodic full-TrainState checkpointing for mid-stage resume.

    Layout under ``<stage_dir>/resume/``: ``state/`` (Orbax: the whole
    TrainState pytree incl. optimizer state) and ``meta.json`` (next epoch,
    history lists, early-stopping counters). Written every ``period`` epochs
    and removed by :meth:`clear` when the stage completes, so finished stages
    never resume stale state.
    """

    def __init__(self, directory: str, period: int = 1,
                 print_func: Callable[[str], None] = print):
        self.directory = os.path.join(os.path.abspath(directory), "resume")
        self.period = max(period, 1)
        self._print = print_func
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, epoch: int, state, history: dict, early: "EarlyStopping") -> None:
        if (epoch + 1) % self.period:
            return
        # epoch-versioned state dir + atomic meta replace: a crash at ANY
        # point leaves meta referencing a fully written state (either the
        # previous pair or the new one) — writing into a fixed "state/"
        # had a window where a new state sat under a stale meta, silently
        # replaying epochs on already-advanced weights
        state_dir = f"state_{epoch + 1}"
        self._ckptr.save(
            os.path.join(self.directory, state_dir),
            jax.device_get(state),
            force=True,
        )
        self._ckptr.wait_until_finished()
        meta = {
            "next_epoch": epoch + 1,
            "state_dir": state_dir,
            "history": {k: list(map(float, v)) for k, v in history.items()},
            "early": {
                "best": early.best,
                "best_epoch": early.best_epoch,
                "wait": early.wait,
            },
        }
        tmp = os.path.join(self.directory, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.directory, "meta.json"))
        # drop superseded state dirs now that meta points at the new one
        for name in os.listdir(self.directory):
            if name.startswith("state") and name != state_dir:
                shutil.rmtree(
                    os.path.join(self.directory, name), ignore_errors=True
                )

    def clear(self) -> None:
        shutil.rmtree(self.directory, ignore_errors=True)

    @staticmethod
    def exists(stage_dir: str) -> bool:
        return os.path.isfile(
            os.path.join(os.path.abspath(stage_dir), "resume", "meta.json")
        )

    @staticmethod
    def load(stage_dir: str, state_template):
        """Restore (state, meta) from a stage directory; ``state_template``
        supplies the pytree structure/dtypes (a freshly initialized state)."""
        base = os.path.join(os.path.abspath(stage_dir), "resume")
        with open(os.path.join(base, "meta.json")) as f:
            meta = json.load(f)
        # "state" is the pre-versioning layout (older resume dirs)
        state_dir = meta.get("state_dir", "state")
        state = ocp.StandardCheckpointer().restore(
            os.path.join(base, state_dir), jax.device_get(state_template)
        )
        return state, meta


class CtrlCInterruptHandler:
    """Two-stage SIGINT: graceful stop after the epoch, then hard exit."""

    def __init__(self, print_func: Callable[[str], None] = print):
        self.stop_requested = False
        self._print = print_func
        self._previous: Any = None

    def install(self) -> None:
        self._previous = signal.signal(signal.SIGINT, self._on_signal)

    def uninstall(self) -> None:
        if self._previous is not None:
            signal.signal(signal.SIGINT, self._previous)
            self._previous = None

    def _on_signal(self, sig, frame):
        if not self.stop_requested:
            self.stop_requested = True
            self._print(
                ">>> TRAINING INTERRUPT INITIATED BY USER <<<\n"
                "Training will stop after the current epoch.\n"
                "Press Ctrl+C again to force quit."
            )
        else:
            self._print(">>> FORCE QUIT INITIATED BY USER <<<")
            sys.exit(0)
