"""jit-compiled train/eval steps with freeze-masked optimization.

TPU-first equivalents of Keras model.fit internals the reference relies on
(pointnet_train.py:221-228, 310-351):

- One XLA program per step: jitter augmentation + forward + loss + backward +
  Adam update all fuse under a single ``jax.jit``.
- Optimizer: Adam (Keras epsilon 1e-7) on an exponential-decay schedule
  (non-staircase), reference pointnet_train.py:310-319.
- Freeze/thaw: the per-stage ``trainable`` switches become an optax
  multi_transform — frozen subtrees get ``set_to_zero`` updates; frozen
  BatchNorms already use running stats inside the model (FreezeFlags).
- Metrics: per-batch correct-counts/sums so the host can reproduce Keras's
  streaming epoch metrics exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pointcloudprocessing_tpu.core.config import LearningConfig
from pointcloudprocessing_tpu.models.pointnet import FreezeFlags, PointNet
from pointcloudprocessing_tpu.ops.augment import jitter
from pointcloudprocessing_tpu.train.losses import multi_head_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def freeze_label_tree(params: Any, freeze: FreezeFlags) -> Any:
    """Label each top-level param subtree 'train' or 'freeze' per the stage's
    switches (application order matches pointnet_train.py:322-332)."""

    def label_for(name: str) -> str:
        if name == "input_transform":
            frozen = freeze.input_transform
        elif name == "feature_transform":
            frozen = freeze.shared_network
        elif name.startswith("mlp_cls"):
            frozen = freeze.classification_head
        elif name.startswith("mlp_seg"):
            frozen = freeze.segmentation_head
        else:  # mlp_1_*, mlp_2_* — the shared trunk
            frozen = freeze.shared_network
        return "freeze" if frozen else "train"

    return {
        name: jax.tree_util.tree_map(lambda _: label_for(name), subtree)
        for name, subtree in params.items()
    }


def scale_by_adam_moments(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
    moment_dtype: Any | None = None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moments stored in ``moment_dtype``.

    The b32 train-step timeline (docs/exp/trainstep_gap_trace.py) shows the
    residual ~0.17 ms/step of in-loop idle is DMA-completion waits at the
    optimizer boundary — the f32 moment tensors (2x params = 28 MB
    read+written every step for the 3.5 M-param PointNet) are the byte bill.
    bf16 moments halve it. Math stays in the gradient dtype (f32): moments
    are upcast for the EMA update and the bias-corrected step, and only
    STORED rounded — the formula is bit-identical to optax.scale_by_adam
    when ``moment_dtype`` is None. optax's own ``mu_dtype`` covers mu only;
    nu is the same size, hence this transform.
    """

    def init_fn(params):
        cast = (lambda p: jnp.zeros_like(p, dtype=moment_dtype or p.dtype))
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(cast, params),
            nu=jax.tree_util.tree_map(cast, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(g.dtype) + (1.0 - b1) * g,
            updates, state.mu,
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(g.dtype) + (1.0 - b2) * jnp.square(g),
            updates, state.nu,
        )
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )
        store = (lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(moment_dtype), t) if moment_dtype else t)
        return out, optax.ScaleByAdamState(
            count=count, mu=store(mu), nu=store(nu)
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning: LearningConfig,
    params: Any,
    freeze: FreezeFlags = FreezeFlags(),
    moment_dtype: Any | None = None,
) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=learning.rate,
        transition_steps=learning.decay_steps,
        decay_rate=learning.decay_rate,
        staircase=False,
    )
    if moment_dtype is None:
        adam = optax.adam(schedule, eps=1e-7)  # Keras Adam epsilon
    else:
        adam = optax.chain(
            scale_by_adam_moments(eps=1e-7, moment_dtype=moment_dtype),
            optax.scale_by_learning_rate(schedule),
        )
    labels = freeze_label_tree(params, freeze)
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()}, labels
    )


def init_train_state(
    model: PointNet,
    rng: jax.Array,
    input_width: int,
    learning: LearningConfig,
    freeze: FreezeFlags = FreezeFlags(),
    init_variables: Any | None = None,
    batch_size: int = 1,
    moment_dtype: Any | None = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialize (or re-wrap pretrained variables into) a TrainState."""
    if init_variables is None:
        dummy = jnp.zeros((batch_size, input_width, 3), jnp.float32)
        # jitted init: eager tracing dispatches every op individually, which
        # is pathological for models with device loops (PointNet2's FPS runs
        # num_centroids masked-argmax iterations — ~50 s eager vs ~1 s jit)
        variables = jax.jit(partial(model.init, train=False))(rng, dummy)
    else:
        variables = init_variables
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    optimizer = make_optimizer(learning, params, freeze,
                               moment_dtype=moment_dtype)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=optimizer.init(params),
        ),
        optimizer,
    )


def _metric_sums(outputs, targets):
    """Per-batch sufficient statistics for Keras streaming metrics."""
    cls_pred = jnp.argmax(outputs["classification_output"], axis=-1)
    seg_pred = jnp.argmax(outputs["segmentation_output"], axis=-1)
    se3_err = outputs["se3"] - targets["se3"]
    return {
        "classification_correct": jnp.sum(
            (cls_pred == targets["classification_output"]).astype(jnp.float32)
        ),
        "classification_total": jnp.asarray(
            cls_pred.shape[0], jnp.float32
        ),
        "segmentation_correct": jnp.sum(
            (seg_pred == targets["segmentation_output"]).astype(jnp.float32)
        ),
        "segmentation_total": jnp.asarray(
            seg_pred.shape[0] * seg_pred.shape[1], jnp.float32
        ),
        "se3_sq_sum": jnp.sum(jnp.square(se3_err)),
        "se3_count": jnp.asarray(se3_err.size, jnp.float32),
    }


def _train_step_impl(
    model: PointNet,
    optimizer: optax.GradientTransformation,
    loss_weights: tuple[float, float, float],
    freeze: FreezeFlags,
    jitter_stdev: tuple[float, float, float],
    state: TrainState,
    x,
    targets,
    rng,
    axis_name: str | None = None,
):
    """One un-jitted train step (shared by the single- and multi-step forms).

    ``axis_name`` runs the step as ONE REPLICA of a shard_map
    data-parallel program (make_shardmap_train_multi_step): gradients and
    running-stat updates ``pmean`` across the axis so the replicated state
    stays bit-identical, metric sums ``psum`` to global counts, and each
    replica draws distinct jitter noise. BatchNorm BATCH statistics stay
    per-shard (the standard non-sync-BN DP mode — DDP default); exact
    global-batch statistics remain available via the GSPMD path
    (train/profile.py), which shards the jnp formulation through XLA."""
    jitter_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))
    if axis_name is not None:
        # distinct noise AND dropout masks per replica — correlated dropout
        # across shards would cut effective mask diversity by the axis size
        idx = jax.lax.axis_index(axis_name)
        jitter_rng = jax.random.fold_in(jitter_rng, idx)
        dropout_rng = jax.random.fold_in(dropout_rng, idx)
    x = jitter(x, jitter_rng, jitter_stdev)

    def loss_fn(params):
        outputs, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x,
            train=True,
            freeze=freeze,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats", "reg_losses"],
        )
        reg_sum = sum(
            jnp.sum(v)
            for v in jax.tree_util.tree_leaves(updates.get("reg_losses", {}))
        )
        total, head_losses = multi_head_loss(
            outputs, targets, loss_weights, reg_sum
        )
        return total, (outputs, updates["batch_stats"], head_losses)

    (total, (outputs, new_batch_stats, head_losses)), grads = (
        jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    )
    if axis_name is not None:
        # replica agreement: averaged grads -> identical Adam updates; the
        # running-stat EMA is linear, so pmean of the updated stats equals
        # updating with the pmean'd batch statistics
        grads = jax.lax.pmean(grads, axis_name)
        new_batch_stats = jax.lax.pmean(new_batch_stats, axis_name)
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    logs = {"loss": total, **head_losses, **_metric_sums(outputs, targets)}
    if axis_name is not None:
        mean_keys = {"loss", *head_losses}
        logs = {
            k: (
                jax.lax.pmean(v, axis_name)
                if k in mean_keys
                else jax.lax.psum(v, axis_name)
            )
            for k, v in logs.items()
        }
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_batch_stats,
        opt_state=new_opt_state,
    )
    return new_state, logs


def make_train_step(
    model: PointNet,
    optimizer: optax.GradientTransformation,
    loss_weights: tuple[float, float, float],
    freeze: FreezeFlags,
    jitter_stdev: tuple[float, float, float],
) -> Callable:
    """Build the jitted train step: (state, x, targets, rng) -> (state, logs)."""
    step = partial(
        _train_step_impl, model, optimizer, loss_weights, freeze, jitter_stdev
    )
    # argnums index the partial's call signature: (state, x, targets, rng)
    return jax.jit(step, donate_argnums=(0,))


def make_train_multi_step(
    model: PointNet,
    optimizer: optax.GradientTransformation,
    loss_weights: tuple[float, float, float],
    freeze: FreezeFlags,
    jitter_stdev: tuple[float, float, float],
    unroll: int = 1,
) -> Callable:
    """K train steps per dispatch: (state, xs (K,b,n,3), targets (K,...), rng)
    -> (state, logs with leading K).

    A device-side ``lax.scan`` over stacked batches — numerically identical
    to K sequential single steps (the per-step rng folds in ``state.step``),
    but one dispatch instead of K. Per-dispatch host overhead (PJRT argument
    parsing of the ~150-leaf TrainState + transport) measures ~1-2 ms through
    the remote tunnel, which at ~3-5 ms/step is the dominant single cost —
    scanning 8 steps per call lifts b32 bf16 training from ~8.6k to ~14k
    clouds/s on v5e.

    ``unroll`` is passed to ``lax.scan`` (same numerics, different codegen):
    unroll=4 shaves ~4% off the b32/1024pt while-loop wall (1.471 ->
    1.415 ms/step measured) at ~25% extra compile time; unroll=8 is
    compile-prohibitive (>10 min remote Mosaic compile). Default 1 — the
    flagship loop is data-feed-bound and epoch compiles already run minutes
    (docs/PERF.md "scan unroll").
    """
    inner = partial(
        _train_step_impl, model, optimizer, loss_weights, freeze, jitter_stdev
    )

    def multi(state: TrainState, xs, targets, rng):
        def body(carry, inp):
            x_k, t_k = inp
            new_state, logs = inner(carry, x_k, t_k, rng)
            return new_state, logs

        return jax.lax.scan(body, state, (xs, targets), unroll=unroll)

    return jax.jit(multi, donate_argnums=(0,))


def make_shardmap_train_multi_step(
    model: PointNet,
    optimizer: optax.GradientTransformation,
    loss_weights: tuple[float, float, float],
    freeze: FreezeFlags,
    jitter_stdev: tuple[float, float, float],
    mesh,
    axis: str = "data",
) -> Callable:
    """Data-parallel scanned train step via ``shard_map`` (per-shard
    programs + explicit pmean), NOT GSPMD partitioning.

    Why it exists: GSPMD cannot partition ``pallas_call`` custom calls, so
    the jit-with-shardings multi-device path (train/profile.py) must trace
    the jnp pooled-chain formulation. Under shard_map each device runs the
    WHOLE per-shard step — Pallas training kernels included — and only the
    gradient/stat pmeans cross the ICI. Semantics: standard non-sync-BN
    data parallelism (per-shard batch statistics; replicated state stays
    bit-identical via pmean'd grads and stat updates). Each replica draws
    DISTINCT jitter noise and dropout masks (axis_index folds into both
    rngs) — so with identical per-shard data and dropout_rate 0 this is
    the single-device step exactly (pinned in test_train_steps.py), while
    with dropout active the masks intentionally diverge per replica.

    Call: (state replicated, xs (K, b_global, n, 3), targets (K, ...),
    rng) -> (state, logs (K, ...)) with b_global % mesh.shape[axis] == 0.
    """
    from jax.sharding import PartitionSpec as P

    inner = partial(
        _train_step_impl, model, optimizer, loss_weights, freeze,
        jitter_stdev, axis_name=axis,
    )

    def multi(state: TrainState, xs, targets, rng):
        def body(carry, inp):
            x_k, t_k = inp
            return inner(carry, x_k, t_k, rng)

        return jax.lax.scan(body, state, (xs, targets))

    batch_spec = P(None, axis)  # (K, b, ...) shards the per-step batch dim
    sharded = jax.shard_map(
        multi,
        mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def _eval_step_impl(
    model, loss_weights, jitter_stdev, apply_jitter, state, x, targets, rng
):
    """Shared eval-step body for make_eval_step / make_eval_multi_step —
    one source of truth so the 'K scanned batches == K sequential calls'
    contract can't drift (mirrors _train_step_impl on the train side)."""
    if apply_jitter:
        x = jitter(x, rng, jitter_stdev)
    outputs, updates = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x,
        train=False,
        mutable=["reg_losses"],
    )
    reg_sum = sum(
        jnp.sum(v)
        for v in jax.tree_util.tree_leaves(updates.get("reg_losses", {}))
    )
    total, head_losses = multi_head_loss(outputs, targets, loss_weights, reg_sum)
    return {"loss": total, **head_losses, **_metric_sums(outputs, targets)}


def make_eval_step(
    model: PointNet,
    loss_weights: tuple[float, float, float],
    jitter_stdev: tuple[float, float, float] = (0.0, 0.0, 0.0),
    apply_jitter: bool = True,
) -> Callable:
    """Build the jitted eval step: (state, x, targets, rng) -> logs.

    Notes for val-loss parity with the reference:
    - jitter augmentation applies to the validation pipeline too (the same
      _parse_function backs all three splits, PointCloudSet.py:325-391);
      callers must pass a FRESH rng per batch (the driver folds in the
      global step) so validation averages over noise like tf.random did.
      Pass apply_jitter=False for clean evaluation.
    - T-Net orthogonality regularizers are included in the total, matching
      Keras adding model.losses in test_step as well.
    """
    return jax.jit(
        partial(_eval_step_impl, model, loss_weights, jitter_stdev, apply_jitter)
    )


def make_eval_multi_step(
    model: PointNet,
    loss_weights: tuple[float, float, float],
    jitter_stdev: tuple[float, float, float] = (0.0, 0.0, 0.0),
    apply_jitter: bool = True,
) -> Callable:
    """K eval batches per dispatch: (state, xs (K,b,n,3), targets (K,...),
    rng, start) -> logs with leading K.

    Numerically identical to K sequential ``make_eval_step`` calls where
    batch i uses ``fold_in(rng, start + i)`` — the per-batch jitter rng the
    driver derives from the global validation-step index folds inside the
    scan, so a resumed run and a chunked run draw the same noise. One
    dispatch instead of K (each dispatch costs ~2-4 ms of host/tunnel
    overhead; at flagship scale the per-batch val loop was ~1.5 s/epoch of
    pure dispatch)."""

    one = partial(
        _eval_step_impl, model, loss_weights, jitter_stdev, apply_jitter
    )

    def multi(state: TrainState, xs, targets, rng, start):
        ks = jnp.arange(xs.shape[0]) + start

        def body(_, inp):
            x_k, t_k, k = inp
            return None, one(state, x_k, t_k, jax.random.fold_in(rng, k))

        _, logs = jax.lax.scan(body, None, (xs, targets, ks))
        return logs

    return jax.jit(multi)


def make_predict_fn(model: PointNet) -> Callable:
    """Inference entry: (variables, x) -> outputs dict (jitted)."""

    @jax.jit
    def predict(variables, x):
        return model.apply(variables, x, train=False)

    return predict
