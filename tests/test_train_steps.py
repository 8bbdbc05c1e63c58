"""Train-step tests: Keras loss parity, learning, freeze masks, DP mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudprocessing_tpu.core.config import LearningConfig
from pointcloudprocessing_tpu.models import PointNet, FreezeFlags
from pointcloudprocessing_tpu.train import losses as losses_lib
from pointcloudprocessing_tpu.train import steps as steps_lib

B, N, C, P = 8, 32, 4, 3


def test_scce_matches_keras():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 5)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.integers(0, 5, 6)

    keras_loss = tf.keras.losses.SparseCategoricalCrossentropy()(labels, probs).numpy()
    ours = float(
        jnp.mean(losses_lib.sparse_categorical_crossentropy(jnp.asarray(probs), jnp.asarray(labels)))
    )
    assert ours == pytest.approx(float(keras_loss), abs=1e-6)


def test_mse_matches_keras():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(6, 3, 3)).astype(np.float32)
    target = rng.normal(size=(6, 3, 3)).astype(np.float32)
    keras_loss = tf.keras.losses.MeanSquaredError()(target, pred).numpy()
    ours = float(jnp.mean(losses_lib.mean_squared_error(jnp.asarray(pred), jnp.asarray(target))))
    assert ours == pytest.approx(float(keras_loss), abs=1e-6)


def _toy_problem(rng_seed=0):
    """Clouds whose class/parts are recoverable from geometry."""
    rng = np.random.default_rng(rng_seed)
    x = rng.normal(size=(B, N, 3)).astype(np.float32)
    cls = rng.integers(0, C, B).astype(np.int32)
    x[:, :, 0] += cls[:, None] * 4.0  # class signal
    parts = (x[:, :, 2] > 0).astype(np.int32)  # part signal
    se3 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    targets = {
        "classification_output": jnp.asarray(cls),
        "segmentation_output": jnp.asarray(parts),
        "se3": jnp.asarray(se3),
    }
    return jnp.asarray(x), targets


@pytest.fixture  # function-scoped: the train step donates its input state
def trained_bits():
    model = PointNet(num_classes=C, num_parts=P)
    learning = LearningConfig(rate=1e-3, decay_steps=1000, decay_rate=0.9)
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, learning, freeze
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )
    return model, state, optimizer, step


def test_loss_decreases(trained_bits):
    model, state, optimizer, step = trained_bits
    x, targets = _toy_problem()
    rng = jax.random.key(42)
    first = None
    for i in range(30):
        state, logs = step(state, x, targets, rng)
        if first is None:
            first = float(logs["loss"])
    assert float(logs["loss"]) < first * 0.7
    assert np.isfinite(float(logs["loss"]))


def test_freeze_mask_keeps_params_fixed():
    model = PointNet(num_classes=C, num_parts=P)
    learning = LearningConfig(rate=1e-2)
    freeze = FreezeFlags(
        input_transform=True, shared_network=True,
        classification_head=False, segmentation_head=True,
    )
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, learning, freeze
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 0.0, 0.0), freeze, (0.0, 0.0, 0.0)
    )
    x, targets = _toy_problem()
    before = jax.device_get(state.params)
    for _ in range(3):
        state, _ = step(state, x, targets, jax.random.key(1))
    after = jax.device_get(state.params)

    frozen_names = [k for k in before if not k.startswith("mlp_cls")]
    for name in frozen_names:
        for b, a in zip(
            jax.tree_util.tree_leaves(before[name]),
            jax.tree_util.tree_leaves(after[name]),
        ):
            np.testing.assert_array_equal(b, a)
    # classification head did move
    moved = any(
        not np.array_equal(b, a)
        for k in before if k.startswith("mlp_cls")
        for b, a in zip(
            jax.tree_util.tree_leaves(before[k]),
            jax.tree_util.tree_leaves(after[k]),
        )
    )
    assert moved


def test_eval_step_no_mutation(trained_bits):
    model, state, optimizer, _ = trained_bits
    eval_step = steps_lib.make_eval_step(model, (1.0, 1.0, 0.0), (0.0, 0.0, 0.0))
    x, targets = _toy_problem()
    stats_before = jax.device_get(state.batch_stats)
    logs = eval_step(state, x, targets, jax.random.key(0))
    assert np.isfinite(float(logs["loss"]))
    stats_after = jax.device_get(state.batch_stats)
    for b, a in zip(
        jax.tree_util.tree_leaves(stats_before), jax.tree_util.tree_leaves(stats_after)
    ):
        np.testing.assert_array_equal(b, a)


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): covered by faster kin + slow lane
def test_data_parallel_step_over_mesh():
    """The same train step runs with the batch sharded over all 8 virtual
    devices and params replicated — gradients all-reduced by XLA."""
    from pointcloudprocessing_tpu.parallel.mesh import (
        batch_sharding,
        data_parallel_mesh,
        replicated_sharding,
    )

    assert len(jax.devices()) == 8
    model = PointNet(num_classes=C, num_parts=P)
    learning = LearningConfig(rate=1e-3)
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, learning, freeze
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )

    mesh = data_parallel_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))
    x, targets = _toy_problem()
    x = jax.device_put(x, batch_sharding(mesh))
    targets = jax.device_put(targets, batch_sharding(mesh))

    state, logs = step(state, x, targets, jax.random.key(7))
    assert np.isfinite(float(logs["loss"]))

    # single-device reference step must agree on the loss value
    state2, _ = steps_lib.init_train_state(model, jax.random.key(0), N, learning, freeze)
    step2 = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )
    x2, targets2 = _toy_problem()
    _, logs2 = step2(state2, x2, targets2, jax.random.key(7))
    assert float(logs["loss"]) == pytest.approx(float(logs2["loss"]), rel=1e-4)


def test_multi_step_matches_sequential(rng):
    """make_train_multi_step must be numerically identical to K sequential
    single steps (same per-step rng fold, same BN/Adam updates)."""
    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.models import FreezeFlags, PointNet
    from pointcloudprocessing_tpu.train import steps as steps_lib

    model = PointNet(num_classes=3, num_parts=2, vanilla=True)
    freeze = FreezeFlags()
    K, B, W = 3, 4, 16

    def fresh_state():
        state, opt = steps_lib.init_train_state(
            model, jax.random.key(0), W, LearningConfig(rate=1e-3), freeze,
            batch_size=1,
        )
        return state, opt

    xs = jnp.asarray(rng.normal(size=(K, B, W, 3)).astype(np.float32))
    targets = {
        "classification_output": jnp.asarray(rng.integers(0, 3, (K, B)).astype(np.int32)),
        "segmentation_output": jnp.asarray(rng.integers(0, 2, (K, B, W)).astype(np.int32)),
        "se3": jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (K, B, 3, 3)).copy()),
    }
    key = jax.random.key(7)

    state_a, opt = fresh_state()
    single = steps_lib.make_train_step(model, opt, (1.0, 1.0, 0.1), freeze, (0.01, 0, 0))
    seq_losses = []
    for k in range(K):
        tk = jax.tree_util.tree_map(lambda a, k=k: a[k], targets)
        state_a, logs = single(state_a, xs[k], tk, key)
        seq_losses.append(float(logs["loss"]))

    state_b, opt_b = fresh_state()
    multi = steps_lib.make_train_multi_step(model, opt_b, (1.0, 1.0, 0.1), freeze, (0.01, 0, 0))
    state_b, stacked = multi(state_b, xs, targets, key)

    np.testing.assert_allclose(np.asarray(stacked["loss"]), seq_losses, rtol=1e-5)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5, atol=1e-7)
    for sa, sb in zip(
        jax.tree_util.tree_leaves(state_a.batch_stats),
        jax.tree_util.tree_leaves(state_b.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-5, atol=1e-7)


def test_eval_multi_step_matches_sequential(rng):
    """make_eval_multi_step must reproduce K sequential make_eval_step calls
    bit-for-bit, including the per-batch rng fold the driver uses
    (fold_in(rng, start + i))."""
    model = PointNet(num_classes=3, num_parts=2, vanilla=True)
    freeze = FreezeFlags()
    K, B_, W = 3, 4, 16
    state, _ = steps_lib.init_train_state(
        model, jax.random.key(0), W, LearningConfig(rate=1e-3), freeze,
        batch_size=1,
    )
    xs = jnp.asarray(rng.normal(size=(K, B_, W, 3)).astype(np.float32))
    targets = {
        "classification_output": jnp.asarray(rng.integers(0, 3, (K, B_)).astype(np.int32)),
        "segmentation_output": jnp.asarray(rng.integers(0, 2, (K, B_, W)).astype(np.int32)),
        "se3": jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (K, B_, 3, 3)).copy()),
    }
    key = jax.random.key(11)
    start = 37  # like epoch * validation_steps mid-run

    single = steps_lib.make_eval_step(model, (1.0, 1.0, 0.1), (0.01, 0.0, 0.0))
    seq = []
    for k in range(K):
        tk = jax.tree_util.tree_map(lambda a, k=k: a[k], targets)
        seq.append(single(state, xs[k], tk, jax.random.fold_in(key, start + k)))

    multi = steps_lib.make_eval_multi_step(model, (1.0, 1.0, 0.1), (0.01, 0.0, 0.0))
    stacked = jax.device_get(multi(state, xs, targets, key, start))
    for k in range(K):
        for name, val in seq[k].items():
            np.testing.assert_allclose(
                np.asarray(stacked[name])[k], np.asarray(val), rtol=1e-6, atol=0
            )


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): covered by faster kin + slow lane
def test_shardmap_step_matches_single_device_on_tiled_batch(rng):
    """make_shardmap_train_multi_step with every shard holding IDENTICAL
    data must reproduce the single-device scanned step exactly: per-shard
    batch stats equal the global stats, grads pmean to themselves, and the
    replicated state update is the same Adam step. (Zero jitter: the
    shard_map path draws per-replica noise by design.)"""
    from pointcloudprocessing_tpu.parallel.mesh import (
        data_parallel_mesh,
        replicated_sharding,
    )

    assert len(jax.devices()) == 8
    n_dev = 8
    K = 2
    # dropout_rate=0: the shard_map path draws PER-REPLICA dropout masks
    # (like its per-replica jitter), which is the one intended divergence
    # from the single-device step this equality test must exclude
    model = PointNet(num_classes=C, num_parts=P, dropout_rate=0.0)
    learning = LearningConfig(rate=1e-3)
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, learning, freeze
    )
    mesh = data_parallel_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))

    x, targets = _toy_problem()
    xs = jnp.stack([x, x * 1.01])  # (K, B, N, 3)
    ts = jax.tree_util.tree_map(lambda a: jnp.stack([a, a]), targets)
    # tile every per-step batch 8x so each shard sees the same B rows
    xs_t = jnp.tile(xs, (1, n_dev, 1, 1))
    ts_t = jax.tree_util.tree_map(
        lambda a: jnp.tile(a, (1, n_dev) + (1,) * (a.ndim - 2)), ts
    )

    sm = steps_lib.make_shardmap_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0), mesh
    )
    state_sm, logs_sm = sm(state, xs_t, ts_t, jax.random.key(7))

    state1, _ = steps_lib.init_train_state(
        model, jax.random.key(0), N, learning, freeze
    )
    single = steps_lib.make_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )
    state_1, logs_1 = single(state1, xs, ts, jax.random.key(7))

    # Adam normalizes each coordinate by rsqrt(v): where a gradient is
    # ~0, f32 reduction-order noise flips its SIGN and the whole +-lr
    # update flips with it — so per-coordinate agreement is bounded by
    # ~2*lr (2e-3), not by float precision. Structure (shapes, pmean
    # plumbing, BN-stat equality, loss equality) is what this pins.
    for a, b in zip(
        jax.tree_util.tree_leaves(state_sm.params),
        jax.tree_util.tree_leaves(state_1.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)
    # batch stats carry no rsqrt amplification: near-exact at step 1,
    # step-2 drift bounded by the +-lr param noise entering the forward
    for a, b in zip(
        jax.tree_util.tree_leaves(state_sm.batch_stats),
        jax.tree_util.tree_leaves(state_1.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    # step-1 losses were computed at IDENTICAL params: tight agreement;
    # metric sums psum to 8x the single-device counts
    np.testing.assert_allclose(
        float(logs_sm["loss"][0]), float(logs_1["loss"][0]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logs_sm["classification_total"]),
        np.asarray(logs_1["classification_total"]) * n_dev,
    )


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): covered by faster kin + slow lane
def test_shardmap_step_distinct_shards_stays_replicated(rng):
    """With distinct per-shard data the shard_map step must still produce a
    consistent replicated state (pmean'd grads/stats) and finite global
    metrics; a second step must consume the donated state cleanly."""
    from pointcloudprocessing_tpu.parallel.mesh import (
        data_parallel_mesh,
        replicated_sharding,
    )

    n_dev = 8
    # dropout_rate=0: the shard_map path draws per-replica dropout masks
    # (fold_in(axis_index)) that single-device reference runs cannot see
    model = PointNet(num_classes=C, num_parts=P, dropout_rate=0.0)
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), N, LearningConfig(rate=1e-3), freeze
    )
    mesh = data_parallel_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))
    sm = steps_lib.make_shardmap_train_multi_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0), mesh
    )
    rng_np = np.random.default_rng(3)
    xs = jnp.asarray(rng_np.normal(size=(2, B * n_dev, N, 3)).astype(np.float32))
    ts = {
        "classification_output": jnp.asarray(
            rng_np.integers(0, C, (2, B * n_dev)).astype(np.int32)),
        "segmentation_output": jnp.asarray(
            rng_np.integers(0, P, (2, B * n_dev, N)).astype(np.int32)),
        "se3": jnp.asarray(np.broadcast_to(
            np.eye(3, dtype=np.float32), (2, B * n_dev, 3, 3)).copy()),
    }

    # pmean correctness with DISTINCT shard data: the reported global
    # first-step loss must equal the mean of single-device losses computed
    # per shard slice at the same initial params (zero jitter, so the
    # per-replica noise fold is inert)
    single = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )
    shard_losses = []
    for s in range(n_dev):
        st, _ = steps_lib.init_train_state(
            model, jax.random.key(0), N, LearningConfig(rate=1e-3), freeze
        )
        sl = slice(s * B, (s + 1) * B)
        _, lg = single(
            st, xs[0, sl],
            jax.tree_util.tree_map(lambda a, sl=sl: a[0, sl], ts),
            jax.random.key(1),
        )
        shard_losses.append(float(lg["loss"]))

    state, logs = sm(state, xs, ts, jax.random.key(1))
    assert np.isfinite(np.asarray(logs["loss"])).all()
    assert float(logs["loss"][0]) == pytest.approx(
        float(np.mean(shard_losses)), rel=1e-5
    )
    assert float(logs["segmentation_total"][0]) == 8 * B * N  # psum'd count
    state, logs = sm(state, xs, ts, jax.random.key(2))
    assert np.isfinite(np.asarray(logs["loss"])).all()


# ---------------------------------------------------------------------------
# optimizer_moment_dtype (round 5): bf16 Adam moments
# ---------------------------------------------------------------------------


def _tiny_tree(rng):
    return {
        "a": {"kernel": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
              "bias": jnp.asarray(rng.normal(size=(8,)).astype(np.float32))},
        "b": {"kernel": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))},
    }


def test_scale_by_adam_moments_matches_optax_in_f32():
    """moment_dtype=None must be bit-equivalent to optax.scale_by_adam —
    the custom transform exists only to round moment STORAGE."""
    import optax

    rng = np.random.default_rng(0)
    params = _tiny_tree(rng)
    ours = steps_lib.scale_by_adam_moments(eps=1e-7, moment_dtype=None)
    ref = optax.scale_by_adam(eps=1e-7)
    s_o, s_r = ours.init(params), ref.init(params)
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32) * 1e-2),
            params,
        )
        u_o, s_o = ours.update(grads, s_o)
        u_r, s_r = ref.update(grads, s_r)
        for l_o, l_r in zip(jax.tree_util.tree_leaves(u_o),
                            jax.tree_util.tree_leaves(u_r)):
            np.testing.assert_allclose(np.asarray(l_o), np.asarray(l_r),
                                       rtol=1e-6, atol=1e-9)


def test_scale_by_adam_moments_bf16_storage_and_accuracy():
    """bf16 moments: state leaves are stored bf16, and the update direction
    stays within bf16 rounding of the f32-state reference."""
    rng = np.random.default_rng(1)
    params = _tiny_tree(rng)
    bf = steps_lib.scale_by_adam_moments(
        eps=1e-7, moment_dtype=jnp.bfloat16)
    f32 = steps_lib.scale_by_adam_moments(eps=1e-7, moment_dtype=None)
    s_b, s_f = bf.init(params), f32.init(params)
    for leaf in jax.tree_util.tree_leaves((s_b.mu, s_b.nu)):
        assert leaf.dtype == jnp.bfloat16
    for i in range(10):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32) * 1e-2),
            params,
        )
        u_b, s_b = bf.update(grads, s_b)
        u_f, s_f = f32.update(grads, s_f)
    for leaf in jax.tree_util.tree_leaves((s_b.mu, s_b.nu)):
        assert leaf.dtype == jnp.bfloat16
    for l_b, l_f in zip(jax.tree_util.tree_leaves(u_b),
                        jax.tree_util.tree_leaves(u_f)):
        # updates are O(1) after Adam normalization; bf16 moment rounding
        # perturbs the direction by at most a few bf16 ulps
        np.testing.assert_allclose(np.asarray(l_b), np.asarray(l_f),
                                   rtol=0.05, atol=0.05)


def test_train_step_with_bf16_moments_decreases_loss():
    model = PointNet(num_classes=3, num_parts=2, dtype=jnp.bfloat16)
    freeze = FreezeFlags()
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), 64, LearningConfig(rate=1e-3), freeze,
        moment_dtype=jnp.bfloat16,
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 1.0, 0.1), freeze, (0.0, 0.0, 0.0)
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64, 3)).astype(np.float32))
    targets = {
        "classification_output": jnp.asarray(
            rng.integers(0, 3, 4).astype(np.int32)),
        "segmentation_output": jnp.asarray(
            rng.integers(0, 2, (4, 64)).astype(np.int32)),
        "se3": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))),
    }
    losses = []
    for i in range(8):
        state, logs = step(state, x, targets, jax.random.key(i))
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # opt_state moments stayed bf16 through the jitted update
    mu_leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x, state.opt_state),
    )
    assert any(l.dtype == jnp.bfloat16 for l in mu_leaves
               if hasattr(l, "dtype"))
