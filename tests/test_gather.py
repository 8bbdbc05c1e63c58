"""ops/gather: one-hot-matmul row gathers vs native take_along_axis."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessing_tpu.ops.gather import gather_rows, gather_rows_matmul


def _case(c, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(3, 50, c)).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(rng.integers(0, 50, (3, 7, 4)).astype(np.int32))
    return x, idx


def _expected(x, idx):
    b = x.shape[0]
    flat = jnp.take_along_axis(x, idx.reshape(b, -1)[..., None], axis=1)
    return flat.reshape(*idx.shape, x.shape[-1])


def test_bf16_exact():
    """Selecting bf16 values through the bf16 one-hot matmul is bit-exact:
    the contraction has exactly one nonzero product per output element."""
    x, idx = _case(5, jnp.bfloat16)
    got = jax.jit(gather_rows_matmul)(x, idx)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(_expected(x, idx), np.float32)
    )


def test_f32_hilo_precision():
    """f32 goes through the hi/lo double-bf16 split: ~2^-17 relative."""
    x, idx = _case(3, jnp.float32, seed=1)
    x = x * 37.5  # exercise magnitudes beyond bf16's 8-bit mantissa
    got = jax.jit(gather_rows_matmul)(x, idx)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_expected(x, idx)), rtol=1e-4, atol=1e-5
    )


def test_rank2_indices():
    x, idx3 = _case(4, jnp.float32, seed=2)
    idx = idx3[:, :, 0]  # (b, m)
    got = jax.jit(gather_rows_matmul)(x, idx)
    assert got.shape == (3, 7, 4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_expected(x, idx)), rtol=1e-4, atol=1e-6
    )


def test_int_sources_fall_back_exact():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 11, (2, 20, 6)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 20, (2, 5)).astype(np.int32))
    got = jax.jit(gather_rows_matmul)(x, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_expected(x, idx)))


def test_dispatch_matches_on_cpu():
    x, idx = _case(4, jnp.float32, seed=4)
    np.testing.assert_array_equal(
        np.asarray(gather_rows(x, idx)), np.asarray(_expected(x, idx))
    )
