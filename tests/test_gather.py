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


def test_f32_hilo_survives_xla_simplifier():
    """The hi half must be rounded with lax.reduce_precision, NOT an
    f32->bf16->f32 convert pair: XLA's excess-precision simplification
    (xla_allow_excess_precision, default on) folds the convert pair to
    identity, zeroing lo — on TPU the gather silently degrades to
    single-bf16 accuracy (2.6e-3 rel, caught on hardware by
    tools/tpu_acceptance.py::check_onehot_gather, round 4). The fold does
    not fire on the CPU backend, so this asserts the unfoldable op is
    present in the optimized program instead."""
    x, idx = _case(3, jnp.float32, seed=1)
    hlo = jax.jit(gather_rows_matmul).lower(x, idx).compile().as_text()
    assert "reduce-precision" in hlo


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


class TestGatherMaxMin:
    """ops/pallas/gather_maxmin: VMEM lane kernel (interpret mode on CPU)
    and the dispatch fallbacks, all exact vs the native gather."""

    def _want(self, q, idx):
        b = q.shape[0]
        g = jnp.take_along_axis(
            q.astype(jnp.float32), idx.reshape(b, -1)[..., None], axis=1
        ).reshape(*idx.shape, q.shape[-1])
        return jnp.max(g, axis=2), jnp.min(g, axis=2)

    def test_lane_kernel_interpret_exact(self):
        from pointcloudprocessing_tpu.ops.pallas.gather_maxmin import (
            gather_maxmin,
        )

        rng = np.random.default_rng(3)
        idx = jnp.asarray(rng.integers(0, 256, (2, 256, 5)).astype(np.int32))
        for dtype in (jnp.bfloat16, jnp.float32):
            q = jnp.asarray(
                rng.normal(size=(2, 256, 64)).astype(np.float32) * 9.0
            ).astype(dtype)
            got_mx, got_mn = gather_maxmin(q, idx, interpret=True)
            want_mx, want_mn = self._want(q, idx)
            assert got_mx.dtype == dtype
            np.testing.assert_array_equal(
                np.asarray(got_mx, np.float32), np.asarray(want_mx)
            )
            np.testing.assert_array_equal(
                np.asarray(got_mn, np.float32), np.asarray(want_mn)
            )

    def test_dispatch_fallback_wide(self):
        """w above the kernel's crossover routes through gather_rows."""
        from pointcloudprocessing_tpu.ops.pallas.gather_maxmin import (
            gather_maxmin,
            lane_kernel_applicable,
        )

        assert not lane_kernel_applicable(256, 128, jnp.bfloat16)
        assert not lane_kernel_applicable(250, 64, jnp.bfloat16)  # n % 128
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 64, (2, 64, 4)).astype(np.int32))
        got_mx, got_mn = gather_maxmin(q, idx)
        want_mx, want_mn = self._want(q, idx)
        np.testing.assert_allclose(np.asarray(got_mx), np.asarray(want_mx))
        np.testing.assert_allclose(np.asarray(got_mn), np.asarray(want_mn))
