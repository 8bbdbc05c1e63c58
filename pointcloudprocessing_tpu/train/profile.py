"""TrainProfile: JSON-config staged/curriculum training driver.

Behavioral parity with the reference driver (pointnet_train.py:63-362):

- Consumes the same ``*_config.json`` schema (core.config).
- Per stage: build-or-load a PointCloudSet named ``{name}_{stage}`` (joblib
  cache), ingest any missing collects, train with per-stage freeze/thaw +
  loss weights, EarlyStopping(min monitor, restore best) + save-best
  checkpointing, dump a history JSON with the exact Keras metric key names,
  then chain: each stage's best weights seed the next stage
  (pointnet_train.py:257).
- ``continue_training_model`` resumes from a previous stage directory's
  checkpoint (pointnet_train.py:280-295).
- Artifacts per stage directory: checkpoint (Orbax; replaces .keras),
  ``{name}_{stage}_history.json``, a copy of the config, and a StableHLO
  export when available (replaces tf2onnx, pointnet_train.py:237-248).

TPU-first differences: the epoch loop drives a single jitted step program
(augment+forward+backward+Adam fused); with multiple devices the batch is
sharded over a 1-D ``data`` mesh and XLA all-reduces gradients over ICI.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import shutil
import time
from collections import defaultdict
from typing import Callable

import jax
import numpy as np

from pointcloudprocessing_tpu.core.config import TrainConfig, StageConfig, load_config
from pointcloudprocessing_tpu.data.frames import get_dir_contents
from pointcloudprocessing_tpu.data.pointcloudset import PointCloudSet, load_from_file
from pointcloudprocessing_tpu.models.pointnet import (
    freeze_flags_from_trainable,
    layer_trainability,
)
from pointcloudprocessing_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    replicated_sharding,
)
from pointcloudprocessing_tpu.train import steps as steps_lib
from pointcloudprocessing_tpu.train.callbacks import (
    BestCheckpoint,
    CtrlCInterruptHandler,
    EarlyStopping,
    ResumeCheckpoint,
    load_checkpoint,
)

HISTORY_KEYS = [
    "classification_output_loss",
    "classification_output_sparse_categorical_accuracy",
    "loss",
    "se3_loss",
    "se3_root_mean_squared_error",
    "segmentation_output_loss",
    "segmentation_output_sparse_categorical_accuracy",
]


def _resident_chunk_iter(loader, chunk, num_steps, epoch, batch_device, mesh):
    """Device-resident stacked-chunk fast path for the scanned steps, or
    None (callers fall back to host staging via ``loader.batches``). The
    single selection point for BOTH the train and val loops so they can
    never silently take different data paths in the same run.

    Single-device residents keep the global seeded permutation (identical
    batches to host staging); on a mesh the loader switches to per-shard DP
    composition via shard-local gathers (see
    ``DeviceLoader._sharded_chunk_iter`` for the semantics and why a global
    permutation would force cross-device traffic)."""
    maker = getattr(loader, "chunks", None)
    if maker is None:
        return None
    if batch_device is None:
        return maker(chunk, num_steps=num_steps, epoch=epoch)
    if mesh is not None:
        return maker(chunk, num_steps=num_steps, epoch=epoch, mesh=mesh)
    return None


def _epoch_metrics(batch_logs: list[dict]) -> dict[str, float]:
    """Reduce per-batch logs to Keras-named streaming epoch metrics.

    Accepts both per-step logs (scalar leaves) and the scanned step's
    STACKED logs (leaves (k,) — one entry per scanned step); keeping the
    stacks whole avoids ~10 device-slice dispatches per step."""
    sums: dict[str, float] = defaultdict(float)
    n = 0
    for logs in batch_logs:
        counted = False
        for k, v in logs.items():
            arr = np.asarray(v, dtype=np.float64)
            sums[k] += float(arr.sum())
            if not counted:
                n += max(arr.size, 1)
                counted = True
    n = max(n, 1)
    return {
        "loss": sums["loss"] / n,
        "classification_output_loss": sums["classification_output_loss"] / n,
        "segmentation_output_loss": sums["segmentation_output_loss"] / n,
        "se3_loss": sums["se3_loss"] / n,
        "classification_output_sparse_categorical_accuracy": (
            sums["classification_correct"] / max(sums["classification_total"], 1.0)
        ),
        "segmentation_output_sparse_categorical_accuracy": (
            sums["segmentation_correct"] / max(sums["segmentation_total"], 1.0)
        ),
        "se3_root_mean_squared_error": float(
            np.sqrt(sums["se3_sq_sum"] / max(sums["se3_count"], 1.0))
        ),
    }


class TrainProfile:
    def __init__(self, config_file: str | TrainConfig, log_to_file: bool = True):
        if isinstance(config_file, TrainConfig):
            self.config = config_file
            self._config_file = None
        else:
            self._config_file = config_file
            self.config = load_config(config_file)
        cfg = self.config

        # -- path validation (pointnet_train.py:115-122) -------------------
        for path, what in [
            (cfg.model_path, "model_path"),
            (cfg.input_path, "input_path"),
            (cfg.data_path, "data_path"),
        ]:
            if path and not os.path.isdir(path):
                raise FileNotFoundError(f"{what} {path} does not exist")
        for stage in cfg.stages:
            for ds in stage.datasets:
                if not os.path.isdir(f"{cfg.input_path}{ds}"):
                    raise FileNotFoundError(f"{cfg.input_path}{ds} does not exist")
        if cfg.continue_training_model:
            ckpt = f"{cfg.model_path}{cfg.continue_training_model}"
            if not os.path.isdir(ckpt):
                raise FileNotFoundError(f"{ckpt} does not exist")

        self._specific_model_path = f"{cfg.name}/"
        os.makedirs(f"{cfg.model_path}{self._specific_model_path}", exist_ok=True)

        # -- logger (pointnet_train.py:130-141; sane ts format, the
        #    reference's '%H:%M%S' produces fullwidth-colon filenames) ------
        self._log = logging.getLogger(f"train.{cfg.name}")
        self._log.setLevel(logging.DEBUG)
        self._log.propagate = False
        if not self._log.handlers:
            console = logging.StreamHandler()
            console.setFormatter(
                logging.Formatter("%(name)s - %(levelname)s - %(message)s")
            )
            self._log.addHandler(console)
            if log_to_file:
                ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
                fh = logging.FileHandler(
                    f"{cfg.model_path}{self._specific_model_path}log_{ts}.log"
                )
                fh.setFormatter(
                    logging.Formatter(
                        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
                    )
                )
                self._log.addHandler(fh)

        # -- per-stage datasets (pointnet_train.py:144-172) ----------------
        self._pc_sets: dict[str, PointCloudSet] = {}
        self._stage_paths: dict[str, str] = {}
        for stage in cfg.stages:
            set_name = f"{cfg.name}_{stage.name}"
            set_dir = f"{cfg.data_path}{set_name}"
            if os.path.isdir(set_dir) and os.path.exists(f"{set_dir}/pc_set.joblib"):
                self._log.info(
                    f"Training profile {set_name} already exists. Using existing profile..."
                )
                pc = load_from_file(f"{set_dir}/pc_set.joblib")
                pc._print = self._log.info
            else:
                pc = PointCloudSet(
                    name=set_name,
                    class_labels=list(cfg.class_labels),
                    part_labels=list(cfg.part_labels),
                    network_input_width=cfg.input_width,
                    jitter_stdev_m=np.array(stage.noise.as_tuple()),
                    batch_size=cfg.batch_size,
                    rand_seed=42,
                    description=stage.name,
                    print_func=self._log.info,
                    data_path=cfg.data_path,
                )
            self._pc_sets[stage.name] = pc
            self._profile_datasets(stage, pc)

            stage_path = f"{self._specific_model_path}{stage.name}/"
            os.makedirs(f"{cfg.model_path}{stage_path}", exist_ok=True)
            self._stage_paths[stage.name] = stage_path

        self._pretrained_model = cfg.continue_training_model
        # epoch-end hooks for testing/observability: fn(stage, epoch, logs)
        self.epoch_callbacks: list[Callable] = []
        # set to a directory to capture a jax.profiler trace of each stage's
        # second epoch (first epoch is compile-dominated)
        self.profile_dir: str | None = None
        # mid-stage resume: pick up a killed stage from its last resume
        # checkpoint (full TrainState + epoch + history + early-stop state)
        self.resume: bool = True
        self.resume_every: int = 1  # epochs between resume checkpoints
        # train steps per device dispatch (lax.scan over stacked batches —
        # numerically identical to sequential steps, amortizes the per-call
        # host overhead; ~2x at batch 32 through the remote tunnel, still
        # improving at 64 steps/dispatch: scan-32 21.0k, scan-64 22.0k
        # clouds/s bf16 — 64 balances the win against the stacked-batch
        # tail waste on short epochs)
        self.steps_per_dispatch: int = 64
        # multi-device strategy: "gspmd" (jit with NamedShardings — exact
        # global-batch BN statistics, jnp pooled chains) or "shard_map"
        # (per-shard programs — keeps the Pallas training kernels,
        # standard non-sync-BN DP; pure data meshes only)
        self.parallel_mode: str = "gspmd"

    # ------------------------------------------------------------------

    def _profile_datasets(self, stage: StageConfig, pc: PointCloudSet) -> None:
        """Ingest any collects not already in the stage's dataset
        (pointnet_train.py:259-274)."""
        cfg = self.config
        existing = get_dir_contents(f"{cfg.data_path}{cfg.name}_{stage.name}", self._log.info)
        for i, set_name in enumerate(stage.datasets):
            if set_name not in existing:
                self._log.info(
                    f"Adding data set {i + 1} of {len(stage.datasets)}"
                )
                pc.add_from_aftr_output(
                    dir_path=f"{cfg.input_path}{set_name}", shuffle_points=True
                )
        self._log.info("\nDatasets added successfully:\n")
        self._log.info(pc.get_info())

    # ------------------------------------------------------------------

    def _build_state(self, stage: StageConfig):
        """Model + TrainState for a stage, loading pretrained weights when
        chaining (pointnet_train.py:276-332)."""
        cfg = self.config
        from pointcloudprocessing_tpu.models.factory import (
            _compute_dtype,
            _moment_dtype,
            model_from_config,
        )

        _, use_mesh, use_shardmap = self._parallel_plan()
        # multi-device GSPMD jit cannot partition the Pallas custom calls
        # (pooled chains / FPS); shard_map (per-shard programs) and
        # single-device stages keep them. An explicit model flag read at
        # trace time — not a process-global — so lazy jit tracing cannot
        # capture a stale mode.
        model = model_from_config(
            cfg,
            dtype=_compute_dtype(cfg),
            allow_pallas=not use_mesh or use_shardmap,
            training=True,
        )
        freeze = freeze_flags_from_trainable(stage.trainable)

        init_variables = None
        if self._pretrained_model:
            ckpt_dir = f"{cfg.model_path}{self._pretrained_model}"
            self._log.info(f"Continuing training on model {self._pretrained_model}")
            payload = load_checkpoint(ckpt_dir)
            init_variables = {
                "params": payload["params"],
                "batch_stats": payload["batch_stats"],
            }

        state, optimizer = steps_lib.init_train_state(
            model,
            jax.random.key(cfg.random_seed),
            cfg.input_width,
            cfg.learning,
            freeze,
            init_variables=init_variables,
            moment_dtype=_moment_dtype(cfg),
        )
        return model, state, optimizer, freeze

    def train(self) -> dict[str, dict]:
        """Run every stage; returns {stage: history} (pointnet_train.py:174-257)."""
        cfg = self.config
        histories: dict[str, dict] = {}

        if cfg.debugging:
            jax.config.update("jax_debug_nans", True)

        for stage in cfg.stages:
            model, state, optimizer, freeze = self._build_state(stage)

            if cfg.model == "pointnet2":
                from pointcloudprocessing_tpu.models.pointnet2 import (
                    layer_trainability_pointnet2,
                )

                self._log.info("PointNet2 Build")
                report = layer_trainability_pointnet2(freeze)
            elif cfg.model == "dgcnn":
                from pointcloudprocessing_tpu.models.dgcnn import (
                    layer_trainability_dgcnn,
                )

                self._log.info("DGCNN Build")
                report = layer_trainability_dgcnn(freeze)
            else:
                self._log.info("PointNet Build")
                report = layer_trainability(freeze, cfg.vanilla)
            self._log.info("\tTrainable Layers")
            for layer, trainable in report.items():
                self._log.info(f"\t\t-> {layer}: {trainable}")

            histories[stage.name] = self._train_stage(stage, model, state, optimizer, freeze)

            # chain: this stage's best checkpoint seeds the next stage
            self._pretrained_model = self._stage_paths[stage.name]

        if cfg.debugging:
            jax.config.update("jax_debug_nans", False)
        return histories

    @staticmethod
    def _run_chunk(multi_step, state, pending, rng, batch_logs):
        """Dispatch a stacked chunk of batches through the scanned step and
        unstack its per-step logs (numerically identical to sequential
        single steps — see steps.make_train_multi_step)."""
        import jax.numpy as jnp

        xs = jnp.stack([x for x, _ in pending])
        targets = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *[t for _, t in pending]
        )
        state, stacked = multi_step(state, xs, targets, rng)
        for k in range(len(pending)):
            batch_logs.append(
                jax.tree_util.tree_map(lambda a, k=k: a[k], stacked)
            )
        return state, batch_logs

    def _parallel_plan(self) -> tuple[int, bool, bool]:
        """(points_axis, use_mesh, use_shardmap) from config + visible
        devices — deterministic, so _build_state can set the model's
        allow_pallas flag consistently with the mesh _train_stage builds.
        Pure batch DP when the batch divides the device count; otherwise a
        2-D data x points mesh soaks up the remainder. shard_map mode
        (per-shard programs — keeps the Pallas training kernels) applies
        only to pure data meshes."""
        cfg = self.config
        n_dev = len(jax.devices())
        if n_dev <= 1:
            return 1, False, False
        points_axis = 1
        if cfg.batch_size % n_dev != 0:
            for pa in (2, 4, 8):
                data_axis = n_dev // pa
                if (
                    n_dev % pa == 0
                    and data_axis > 0
                    and cfg.batch_size % data_axis == 0
                    and cfg.input_width % pa == 0
                ):
                    points_axis = pa
                    break
        use_mesh = cfg.batch_size % (n_dev // points_axis) == 0
        use_shardmap = (
            use_mesh and self.parallel_mode == "shard_map" and points_axis == 1
        )
        return points_axis, use_mesh, use_shardmap

    def _train_stage(self, stage, model, state, optimizer, freeze) -> dict:
        cfg = self.config
        pc = self._pc_sets[stage.name]
        stage_dir = f"{cfg.model_path}{self._stage_paths[stage.name]}"

        # completed-stage skip: a rerun after a mid-run kill must not
        # retrain finished stages (their resume dir is cleared on
        # completion, so ResumeCheckpoint alone cannot tell). A stage with
        # its history JSON and best checkpoint on disk and no resume dir is
        # done — reuse its artifacts and let chaining proceed. Delete the
        # stage directory to force a retrain.
        history_path = f"{stage_dir}{cfg.name}_{stage.name}_history.json"
        if (
            self.resume
            and not ResumeCheckpoint.exists(stage_dir)
            and os.path.isfile(history_path)
            and os.path.isdir(os.path.join(stage_dir, "best"))
        ):
            self._log.info(
                f"Stage '{stage.name}' already completed "
                f"(artifacts in {stage_dir}) — skipping; delete the stage "
                "directory to retrain."
            )
            with open(history_path) as f:
                return json.load(f)

        if pc.split_count("train") == 0 or pc.split_count("val") == 0:
            raise RuntimeError(
                f"Stage '{stage.name}' has no data (train="
                f"{pc.split_count('train')}, val={pc.split_count('val')}). "
                f"Ingest collects into the '{cfg.name}_{stage.name}' dataset or "
                "list them under training_profiles.<stage>.datasets."
            )

        weights = (
            stage.loss_weights.classification,
            stage.loss_weights.segmentation,
            stage.loss_weights.rotation,
        )
        jitter_stdev = stage.noise.as_tuple()
        train_step = steps_lib.make_train_step(model, optimizer, weights, freeze, jitter_stdev)
        eval_step = steps_lib.make_eval_step(model, weights, jitter_stdev)
        chunk = max(int(self.steps_per_dispatch), 1)
        multi_step = (
            steps_lib.make_train_multi_step(model, optimizer, weights, freeze, jitter_stdev)
            if chunk > 1
            else None
        )
        eval_multi = (
            steps_lib.make_eval_multi_step(model, weights, jitter_stdev)
            if chunk > 1
            else None
        )

        train_loader = pc.get_train_set()
        val_loader = pc.get_val_set()
        steps_per_epoch = max(pc.split_count("train") // cfg.batch_size, 1)
        validation_steps = max(pc.split_count("val") // cfg.batch_size, 1)

        # multi-device parallelism: pure batch DP when the batch divides
        # evenly; otherwise a 2-D data x points mesh (the SP analogue —
        # pointwise MLPs shard over N, the global max-pool all-reduces)
        # soaks up the remaining devices for awkward batch sizes
        points_axis, use_mesh, use_shardmap = self._parallel_plan()
        mesh = None
        if use_mesh:
            devices = jax.devices()
            mesh = data_parallel_mesh(devices, points_axis=points_axis)
            state = jax.device_put(state, replicated_sharding(mesh))
            self._log.info(
                "Parallel mesh "
                f"{dict(zip(mesh.axis_names, mesh.devices.shape))} over "
                f"{len(devices)} devices"
            )
        if self.parallel_mode == "shard_map" and use_mesh and not use_shardmap:
            self._log.info(
                "parallel_mode='shard_map' needs a pure data mesh; the "
                "points axis is in play — falling back to GSPMD."
            )
        if use_shardmap:
            # per-shard programs: the Pallas training kernels stay active
            # (each device runs the whole step on its slice; grads and
            # running-stat updates pmean). Non-sync-BN DP semantics — the
            # GSPMD mode below keeps exact global-batch statistics.
            sm_multi = steps_lib.make_shardmap_train_multi_step(
                model, optimizer, weights, freeze, jitter_stdev, mesh
            )
            multi_step = sm_multi
            chunk = max(chunk, 2)  # the scan wrapper is the only step form

            def train_step(state, x, targets, rng, _sm=sm_multi):
                # epoch-tail single step: a K=1 scan through the same
                # shard_map program (a GSPMD-jitted single step would trace
                # the custom calls under partitioning)
                stacked = jax.tree_util.tree_map(lambda a: a[None], targets)
                state, logs = _sm(state, x[None], stacked, rng)
                return state, jax.tree_util.tree_map(lambda a: a[0], logs)

        from pointcloudprocessing_tpu.parallel.mesh import NamedSharding, P

        if mesh is None:
            batch_device = None
        else:
            # per-leaf shardings: clouds and per-point labels shard on the
            # points axis when it exists; rank-1 labels and the 3x3 SE(3)
            # targets are data-sharded only
            data_only = NamedSharding(mesh, P("data"))
            batch_device = (
                batch_sharding(mesh),
                {
                    "classification_output": data_only,
                    "segmentation_output": batch_sharding(mesh),
                    "se3": data_only,
                },
            )

        early = EarlyStopping(cfg.patience, self._log.info)
        ckpt = BestCheckpoint(stage_dir, self._log.info)
        resume_ckpt = ResumeCheckpoint(stage_dir, self.resume_every, self._log.info)
        interrupt = CtrlCInterruptHandler(self._log.info)
        interrupt.install()

        rng = jax.random.key(cfg.random_seed)
        history: dict[str, list] = defaultdict(list)
        start_epoch = 0

        if self.resume and ResumeCheckpoint.exists(stage_dir):
            state, meta = ResumeCheckpoint.load(stage_dir, state)
            start_epoch = meta["next_epoch"]
            history = defaultdict(list, {k: list(v) for k, v in meta["history"].items()})
            early.best = meta["early"]["best"]
            early.best_epoch = meta["early"]["best_epoch"]
            early.wait = meta["early"]["wait"]
            try:  # the restore-best-at-end contract needs the best weights
                payload = load_checkpoint(stage_dir)
                early.best_state = state.replace(
                    params=payload["params"], batch_stats=payload["batch_stats"]
                )
                ckpt.best = early.best
            except Exception:
                # best/ may not have finished writing before the crash that
                # triggered this resume: leave ckpt.best at +inf so the
                # next epoch REWRITES best/ (otherwise a stage whose best
                # epoch never recurs would finish with no best checkpoint
                # and the next stage's load would die)
                self._log.info(
                    "Best checkpoint unreadable on resume; it will be "
                    "rewritten at the next epoch."
                )
            if mesh is not None:
                state = jax.device_put(state, replicated_sharding(mesh))
            self._log.info(
                f"Resuming stage '{stage.name}' from epoch {start_epoch + 1} "
                f"(best {early.best:.6f} @ epoch {early.best_epoch + 1})"
            )

        try:
            for epoch in range(start_epoch, cfg.epochs):
                profiling = self.profile_dir is not None and epoch == 1
                if profiling:
                    jax.profiler.start_trace(
                        f"{self.profile_dir}/{stage.name}"
                    )
                t0 = time.perf_counter()
                batch_logs = []
                chunk_iter = None
                if multi_step is not None:
                    chunk_iter = _resident_chunk_iter(
                        train_loader, chunk, steps_per_epoch, epoch,
                        batch_device, mesh,
                    )
                    if (
                        chunk_iter is not None
                        and mesh is not None
                        and not getattr(self, "_logged_sharded_resident", False)
                    ):
                        self._logged_sharded_resident = True
                        self._log.info(
                            "Device-resident sharded mode: the split is "
                            "uploaded once sharded over the data axis and "
                            "each batch composes per-shard (every shard "
                            "contributes batch/n_data rows from its own "
                            "per-epoch shuffle) — standard DP composition, "
                            "not the single-device global permutation."
                        )
                if chunk_iter is not None:
                    # device-resident fast path: stacked chunks feed the
                    # scanned step directly — no host staging, no per-step
                    # slicing/re-stacking, stacked logs kept whole (each
                    # avoided device op is a ~2-4 ms tunnel dispatch)
                    for xs, ts in chunk_iter:
                        if xs.shape[0] == chunk:
                            state, stacked = multi_step(state, xs, ts, rng)
                            batch_logs.append(stacked)
                        else:  # epoch tail smaller than a chunk
                            for k in range(xs.shape[0]):
                                state, logs = train_step(
                                    state,
                                    xs[k],
                                    jax.tree_util.tree_map(
                                        lambda a, k=k: a[k], ts
                                    ),
                                    rng,
                                )
                                batch_logs.append(logs)
                else:
                    pending: list = []
                    for x, targets in train_loader.batches(
                        num_steps=steps_per_epoch, device=batch_device, epoch=epoch
                    ):
                        if multi_step is None:
                            state, logs = train_step(state, x, targets, rng)
                            batch_logs.append(logs)
                            continue
                        pending.append((x, targets))
                        if len(pending) == chunk:
                            state, batch_logs = self._run_chunk(
                                multi_step, state, pending, rng, batch_logs
                            )
                            pending = []
                    for x, targets in pending:  # epoch tail
                        state, logs = train_step(state, x, targets, rng)
                        batch_logs.append(logs)
                if profiling:
                    # a HOST READ, not block_until_ready: the axon tunnel
                    # is async and block_until_ready returns before remote
                    # execution finishes (CLAUDE.md), truncating the trace
                    jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
                    jax.profiler.stop_trace()
                if not batch_logs:
                    # zero batches means the loader found nothing — surface
                    # it instead of logging loss 0.0 epochs (stale data
                    # paths, empty splits)
                    raise RuntimeError(
                        f"Stage '{stage.name}' epoch {epoch + 1} produced "
                        "zero training batches — the train loader is empty "
                        "(check data_path / split contents)."
                    )
                train_metrics = _epoch_metrics(jax.device_get(batch_logs))

                val_logs = []
                val_chunk_iter = None
                if eval_multi is not None:
                    val_chunk_iter = _resident_chunk_iter(
                        val_loader, chunk, validation_steps, epoch,
                        batch_device, mesh,
                    )
                if val_chunk_iter is not None:
                    # device-resident fast path, mirroring the train loop:
                    # K eval batches per dispatch via the scanned eval step.
                    # Per-batch jitter rng folds (epoch * steps + i) inside
                    # the scan — numerically identical to the per-batch loop.
                    done = 0
                    for xs, ts in val_chunk_iter:
                        if xs.shape[0] == chunk:
                            val_logs.append(
                                eval_multi(
                                    state, xs, ts, rng,
                                    epoch * validation_steps + done,
                                )
                            )
                            done += chunk
                        else:  # epoch tail smaller than a chunk
                            for k in range(xs.shape[0]):
                                batch_rng = jax.random.fold_in(
                                    rng, epoch * validation_steps + done
                                )
                                val_logs.append(
                                    eval_step(
                                        state,
                                        xs[k],
                                        jax.tree_util.tree_map(
                                            lambda a, k=k: a[k], ts
                                        ),
                                        batch_rng,
                                    )
                                )
                                done += 1
                else:
                    for i, (x, targets) in enumerate(
                        val_loader.batches(
                            num_steps=validation_steps, device=batch_device, epoch=epoch
                        )
                    ):
                        # fresh jitter noise per validation batch/epoch
                        batch_rng = jax.random.fold_in(rng, epoch * validation_steps + i)
                        val_logs.append(eval_step(state, x, targets, batch_rng))
                val_metrics = {
                    f"val_{k}": v
                    for k, v in _epoch_metrics(jax.device_get(val_logs)).items()
                }

                epoch_metrics = {**train_metrics, **val_metrics}
                for key in HISTORY_KEYS:
                    history[key].append(epoch_metrics[key])
                    history[f"val_{key}"].append(epoch_metrics[f"val_{key}"])

                dt = time.perf_counter() - t0
                monitor_value = epoch_metrics[stage.monitor]
                self._log.info(
                    f"Epoch {epoch + 1}/{cfg.epochs} [{stage.name}] {dt:.1f}s - "
                    f"loss: {epoch_metrics['loss']:.4f} - "
                    f"val_loss: {epoch_metrics['val_loss']:.4f} - "
                    f"{stage.monitor}: {monitor_value:.4f}"
                )
                for hook in self.epoch_callbacks:
                    hook(stage.name, epoch, epoch_metrics)

                ckpt.update(epoch, monitor_value, state)
                stop = early.update(epoch, monitor_value, state)
                resume_ckpt.save(epoch, state, history, early)
                if stop:
                    break
                if interrupt.stop_requested:
                    self._log.info("User stop received.")
                    break
        finally:
            interrupt.uninstall()

        # EarlyStopping(restore_best_weights=True) semantics
        if early.best_state is not None:
            state = early.best_state
        ckpt.wait_until_finished()

        # history JSON (pointnet_train.py:234-235)
        history = dict(history)
        with open(f"{stage_dir}{cfg.name}_{stage.name}_history.json", "w") as f:
            json.dump(history, f)

        # the stage finished (early-stop, epoch budget, or user stop) — a
        # later rerun should start fresh, not resume stale state
        resume_ckpt.clear()

        # config copy for provenance (pointnet_train.py:251)
        if self._config_file and os.path.isfile(self._config_file):
            shutil.copy(self._config_file, stage_dir)

        # export (replaces tf2onnx; gated on availability)
        try:
            from pointcloudprocessing_tpu.export.stablehlo import export_pointnet

            # multi-platform export (cpu/tpu/cuda) cannot serialize Pallas
            # custom calls — use the pure-XLA formulation of the same model
            # (identical params; PointNet's inference path never dispatches
            # Pallas anyway, PointNet2's FPS does)
            export_model = (
                model.clone(allow_pallas=False)
                if getattr(model, "allow_pallas", False) else model
            )
            export_pointnet(
                export_model,
                {"params": state.params, "batch_stats": state.batch_stats},
                cfg.input_width,
                f"{stage_dir}{cfg.name}_{stage.name}",
            )
        except Exception as e:  # export must never kill a finished run
            self._log.info(f"StableHLO export skipped: {type(e).__name__}: {e}")
        try:
            from pointcloudprocessing_tpu.export.onnx_bridge import export_onnx

            # opset-13 ONNX like the reference (pointnet_train.py:237-248);
            # advisory-only when the optional toolchain is absent
            export_onnx(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                cfg.input_width,
                f"{stage_dir}{cfg.name}_{stage.name}.onnx",
                print_func=self._log.info,
            )
        except Exception as e:
            self._log.info(f"ONNX export skipped: {type(e).__name__}: {e}")

        return history


def train_pointnet(argv: list[str]) -> bool:
    """CLI entry (reference: pointnet_train.py:364-402)."""
    configs = [a for a in argv if a.endswith(".json")]
    if not configs:
        print_help()
        return False

    devices = jax.devices()
    print(f"Devices available: {devices}")

    for cf in configs:
        tp = TrainProfile(cf)
        tp.train()
    return True


def print_help() -> None:
    print(
        "PointNet training module (TPU-native).\n"
        "Usage: python -m pointcloudprocessing_tpu.train.cli <name>_config.json\n"
        "The config follows the reference schema (see core/config.py):\n"
        "  info{name, class_labels, part_labels, training_profiles{...},\n"
        "       continue_training_model}\n"
        "  params{input_width, epochs, patience, batch_size, learning{...},\n"
        "         random_seed, debugging, vanilla, regularize_*_transform}\n"
        "  file_system{model_path, input_path, data_path}"
    )
