"""Tests for normalization, fixed-width resampling, and jitter ops."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudprocessing_tpu.ops.normalize import normalize_unit_sphere
from pointcloudprocessing_tpu.ops.resample import (
    adjust_to_input_width_np,
    adjust_batch_to_input_width,
)
from pointcloudprocessing_tpu.ops.augment import jitter, random_so3_rotation


def test_normalize_unit_sphere(rng):
    pts = rng.uniform(-50, 50, (4, 128, 3)).astype(np.float32) + np.array(
        [100.0, -40.0, 7.0], dtype=np.float32
    )
    normalized, (centroid, scale) = normalize_unit_sphere(jnp.asarray(pts))
    normalized = np.asarray(normalized)

    # Centered on centroid...
    np.testing.assert_allclose(normalized.mean(axis=1), 0.0, atol=1e-5)
    # ...max distance exactly 1 (non-degenerate clouds)
    dists = np.linalg.norm(normalized, axis=-1)
    np.testing.assert_allclose(dists.max(axis=1), 1.0, atol=1e-5)
    # Reconstruction: normalized * scale + centroid == input
    np.testing.assert_allclose(
        normalized * np.asarray(scale) + np.asarray(centroid), pts, atol=1e-3
    )


def test_normalize_degenerate_cloud():
    # All identical points: scale floor (1e-7) must prevent NaN.
    pts = jnp.ones((1, 16, 3))
    normalized, _ = normalize_unit_sphere(pts)
    assert np.isfinite(np.asarray(normalized)).all()


def test_adjust_np_truncates(rng):
    obs = rng.normal(size=(100, 3))
    labels = rng.integers(0, 5, 100)
    out_obs, out_lbl = adjust_to_input_width_np(obs, labels, 64, rng)
    assert out_obs.shape == (64, 3)
    np.testing.assert_array_equal(out_obs, obs[:64])
    np.testing.assert_array_equal(out_lbl, labels[:64])


def test_adjust_np_pads_with_aligned_labels(rng):
    obs = rng.normal(size=(10, 3))
    labels = np.arange(10)
    out_obs, out_lbl = adjust_to_input_width_np(obs, labels, 32, rng)
    assert out_obs.shape == (32, 3)
    assert out_lbl.shape == (32,)
    # Original points preserved at the front.
    np.testing.assert_array_equal(out_obs[:10], obs)
    # Every padded point is a duplicate of an original, with matching label.
    for i in range(10, 32):
        src = out_lbl[i]
        np.testing.assert_array_equal(out_obs[i], obs[src])


def test_adjust_batch_device(rng):
    max_n, width = 40, 24
    pts = rng.normal(size=(3, max_n, 3)).astype(np.float32)
    lbl = rng.integers(0, 7, (3, max_n)).astype(np.int32)
    counts = jnp.array([10, 24, 40])  # pad, exact, truncate

    out_p, out_l = adjust_batch_to_input_width(
        jnp.asarray(pts), jnp.asarray(lbl), counts, width, jax.random.key(0)
    )
    assert out_p.shape == (3, width, 3)
    assert out_l.shape == (3, width)

    # Frame 0: first 10 rows are the valid prefix; pad rows come from it.
    np.testing.assert_array_equal(np.asarray(out_p[0][:10]), pts[0][:10])
    pad_rows = np.asarray(out_p[0][10:])
    for row, label in zip(pad_rows, np.asarray(out_l[0][10:])):
        matches = np.where((pts[0][:10] == row).all(axis=1))[0]
        assert len(matches) >= 1
        assert label in lbl[0][:10][matches]

    # Frame 2: pure truncation.
    np.testing.assert_array_equal(np.asarray(out_p[2]), pts[2][:width])
    np.testing.assert_array_equal(np.asarray(out_l[2]), lbl[2][:width])


def test_jitter_statistics():
    pts = jnp.zeros((2, 4096, 3))
    out = jitter(pts, jax.random.key(1), (0.1, 0.2, 0.0))
    out = np.asarray(out)
    np.testing.assert_allclose(out[..., 0].std(), 0.1, rtol=0.1)
    np.testing.assert_allclose(out[..., 1].std(), 0.2, rtol=0.1)
    np.testing.assert_array_equal(out[..., 2], 0.0)


def test_random_so3_is_rotation():
    r = np.asarray(random_so3_rotation(jax.random.key(2), (8,)))
    for m in r:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) > 0.99
