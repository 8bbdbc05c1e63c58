"""The fused dense+BN+relu+max custom VJP must match autodiff exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessing_tpu.core.constants import KERAS_BN_EPSILON
from pointcloudprocessing_tpu.models.fused_pool import dense_bn_relu_max

B, N, CIN, C = 4, 24, 8, 16


def naive(x, kernel, scale, bias, mean_r, var_r, use_running):
    pre = x @ kernel
    if use_running:
        mean, var = mean_r, var_r
    else:
        mean = jnp.mean(pre, axis=(0, 1))
        var = jnp.mean(jnp.square(pre), axis=(0, 1)) - jnp.square(mean)
    xhat = (pre - mean) * jax.lax.rsqrt(var + KERAS_BN_EPSILON)
    y = xhat * scale + bias
    return jnp.max(jnp.maximum(y, 0.0), axis=1), mean, var


@pytest.fixture
def args(rng):
    x = jnp.asarray(rng.normal(size=(B, N, CIN)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(CIN, C)).astype(np.float32) * 0.4)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.2)
    mean_r = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    var_r = jnp.asarray(rng.uniform(0.5, 2.0, C).astype(np.float32))
    return x, kernel, scale, bias, mean_r, var_r


@pytest.mark.parametrize("use_running", [False, True])
def test_forward_matches_naive(args, use_running):
    cfg = (use_running, 0.99, KERAS_BN_EPSILON, None)
    got = dense_bn_relu_max(cfg, *args)
    want = naive(*args, use_running)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("use_running", [False, True])
def test_gradients_match_autodiff(args, use_running):
    cfg = (use_running, 0.99, KERAS_BN_EPSILON, None)
    x, kernel, scale, bias, mean_r, var_r = args

    def loss_fused(x, kernel, scale, bias):
        out, _, _ = dense_bn_relu_max(cfg, x, kernel, scale, bias, mean_r, var_r)
        return jnp.sum(jnp.sin(out) * out)

    def loss_naive(x, kernel, scale, bias):
        out, _, _ = naive(x, kernel, scale, bias, mean_r, var_r, use_running)
        return jnp.sum(jnp.sin(out) * out)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, kernel, scale, bias)
    want = jax.grad(loss_naive, argnums=(0, 1, 2, 3))(x, kernel, scale, bias)
    for name, g, w in zip(("dx", "dkernel", "dscale", "dbias"), got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_gradients_match_under_jit_and_batchsizes(rng):
    """Bigger shape + jit, train mode (the hot path)."""
    cfg = (False, 0.99, KERAS_BN_EPSILON, None)
    x = jnp.asarray(rng.normal(size=(8, 96, 16)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32) * 0.3)
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    mean_r, var_r = jnp.zeros(32), jnp.ones(32)

    def loss_fused(x, kernel):
        out, _, _ = dense_bn_relu_max(cfg, x, kernel, scale, bias, mean_r, var_r)
        return jnp.sum(out * out)

    def loss_naive(x, kernel):
        out, _, _ = naive(x, kernel, scale, bias, mean_r, var_r, False)
        return jnp.sum(out * out)

    got = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, kernel)
    want = jax.jit(jax.grad(loss_naive, argnums=(0, 1)))(x, kernel)
    for name, g, w in zip(("dx", "dkernel"), got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5, err_msg=name
        )


def test_pooled_block_variable_tree_matches_pointwise(rng):
    """PooledPointwiseBlock must expose the exact variable tree of
    PointwiseBlock (+ max) so checkpoints and weight transfer still work."""
    from pointcloudprocessing_tpu.models.layers import (
        PointwiseBlock,
        PooledPointwiseBlock,
    )

    x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    fused = PooledPointwiseBlock(16)
    plain = PointwiseBlock(16)
    v_fused = fused.init(jax.random.key(0), x, train=False)
    v_plain = plain.init(jax.random.key(0), x, train=False)

    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: a.shape, tree)

    assert shapes(v_fused) == shapes(v_plain)

    # same weights -> same output as plain block + max, train and eval
    out_f = fused.apply(v_plain, x, train=False)
    out_p = jnp.max(plain.apply(v_plain, x, train=False), axis=1)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), rtol=1e-6, atol=1e-6)

    out_f, vars_f = fused.apply(
        v_plain, x, train=True, mutable=["batch_stats"]
    )
    out_p, vars_p = plain.apply(v_plain, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(jnp.max(out_p, axis=1)), rtol=1e-5, atol=1e-6
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(vars_f["batch_stats"]["bn"][k]),
            np.asarray(vars_p["batch_stats"]["bn"][k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
