"""Tests for the preprocessing ops: voxel, FPS, kNN, normals, HPR."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudprocessing_tpu.ops import (
    voxel_downsample,
    voxel_downsample_batch,
    farthest_point_sample,
    knn,
    knn_batch,
    group_points,
    estimate_normals,
    estimate_normals_batch,
    hidden_point_removal,
)
from pointcloudprocessing_tpu.ops.normals import smallest_eigenvector_sym3x3


# -- voxel ------------------------------------------------------------------

def test_voxel_centroids_known_grid():
    # two clusters in distinct voxels
    pts = jnp.array(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.1, 5.1, 5.1], [5.3, 5.2, 5.1]]
    )
    out, mask = voxel_downsample(pts, voxel_size=1.0)
    assert int(mask.sum()) == 2
    got = np.asarray(out)[np.asarray(mask)]
    want = np.array([[0.15, 0.15, 0.15], [5.2, 5.15, 5.1]])
    # order is by voxel key (ascending) — cluster at origin first
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_voxel_first_mode():
    pts = jnp.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [9.0, 9.0, 9.0]])
    out, mask = voxel_downsample(pts, 1.0, reduction="first")
    got = np.asarray(out)[np.asarray(mask)]
    np.testing.assert_allclose(got, [[0.1, 0.1, 0.1], [9.0, 9.0, 9.0]], atol=1e-6)


def test_voxel_respects_valid_mask():
    pts = jnp.array([[0.1, 0.1, 0.1], [100.0, 100.0, 100.0]])
    mask = jnp.array([True, False])
    out, out_mask = voxel_downsample(pts, 1.0, mask)
    assert int(out_mask.sum()) == 1
    np.testing.assert_allclose(np.asarray(out)[0], [0.1, 0.1, 0.1], atol=1e-6)


def test_voxel_negative_coords_and_jit(rng):
    pts = jnp.asarray(rng.uniform(-20, 20, (256, 3)).astype(np.float32))
    f = jax.jit(lambda p: voxel_downsample(p, 2.0))
    out, mask = f(pts)
    k = int(mask.sum())
    assert 0 < k <= 256
    got = np.asarray(out)[:k]
    # each centroid must lie inside its own voxel (true for centroid of
    # points sharing one voxel)
    voxels = np.floor(np.asarray(pts) / 2.0)
    cent_voxels = np.floor(got / 2.0)
    unique_in = {tuple(v) for v in voxels.tolist()}
    assert {tuple(v) for v in cent_voxels.tolist()} <= unique_in
    assert len({tuple(v) for v in cent_voxels.tolist()}) == k


def test_voxel_batch(rng):
    pts = jnp.asarray(rng.uniform(-5, 5, (3, 64, 3)).astype(np.float32))
    out, mask = voxel_downsample_batch(pts, 1.0)
    assert out.shape == (3, 64, 3)
    assert mask.shape == (3, 64)


# -- FPS --------------------------------------------------------------------

def test_fps_picks_extremes():
    pts = jnp.array([[0.0, 0, 0], [0.1, 0, 0], [10.0, 0, 0], [5.0, 0, 0]])
    idx = np.asarray(farthest_point_sample(pts, 3))
    assert idx[0] == 0
    assert idx[1] == 2   # farthest from 0
    assert idx[2] == 3   # then the midpoint


def test_fps_unique_until_exhausted(rng):
    pts = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    idx = np.asarray(farthest_point_sample(pts, 64))
    assert len(np.unique(idx)) == 64


def test_fps_valid_mask(rng):
    pts = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    mask = jnp.arange(32) < 10
    idx = np.asarray(farthest_point_sample(pts, 8, mask))
    assert (idx < 10).all()


def test_fps_invalid_seed_never_selected(rng):
    """Regression: row 0 marked invalid must not be selected or seed the
    min-dist scoring."""
    pts = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    mask = jnp.concatenate([jnp.zeros(1, bool), jnp.ones(15, bool)])
    idx = np.asarray(farthest_point_sample(pts, 6, mask))
    assert (idx != 0).all()
    assert len(np.unique(idx)) == 6


def test_fps_methods_agree(rng):
    """The Pallas kernel (interpret mode on CPU) computes the same exact
    squared differences as 'stream' — selections must be identical. 'distmat'
    expands |x|^2+|y|^2-2xy (different rounding near ties), so it is held to
    the FPS properties rather than bitwise selection equality."""
    from pointcloudprocessing_tpu.ops.fps import farthest_point_sample_batch

    pts = jnp.asarray(rng.normal(size=(4, 64, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(4, 64)) > 0.2)
    mask = mask.at[:, 0].set(True)
    ref = np.asarray(farthest_point_sample_batch(pts, 16, mask, method="stream"))
    got = np.asarray(farthest_point_sample_batch(pts, 16, mask, method="pallas"))
    np.testing.assert_array_equal(got, ref, err_msg="pallas vs stream")

    dist = np.asarray(farthest_point_sample_batch(pts, 16, mask, method="distmat"))
    maskn = np.asarray(mask)
    for b in range(4):
        assert maskn[b][dist[b]].all()  # only valid points selected
        assert len(np.unique(dist[b])) == 16


def test_normals_fewer_valid_than_k(rng):
    """Regression: with < k valid points, normals of valid points must not
    be built from garbage padding rows."""
    pts = np.zeros((32, 3), np.float32)
    # 3 valid points on the z=0 plane; padding rows are garbage far away
    pts[:3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    pts[3:] = rng.uniform(500, 600, (29, 3))
    mask = jnp.arange(32) < 3
    normals = np.asarray(
        estimate_normals(jnp.asarray(pts), k=16, valid_mask=mask,
                         viewpoint=jnp.array([0.0, 0.0, 5.0]))
    )
    # valid points lie in the z=0 plane -> normal ~ +z
    np.testing.assert_allclose(np.abs(normals[:3, 2]), 1.0, atol=1e-3)


def test_fps_better_coverage_than_random(rng):
    """FPS minimum pairwise distance should beat random sampling."""
    pts = jnp.asarray(rng.uniform(-1, 1, (512, 3)).astype(np.float32))
    idx = np.asarray(farthest_point_sample(pts, 32))
    sel = np.asarray(pts)[idx]

    def min_pairwise(x):
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    rand_sel = np.asarray(pts)[rng.choice(512, 32, replace=False)]
    assert min_pairwise(sel) > min_pairwise(rand_sel)


# -- kNN --------------------------------------------------------------------

def test_knn_exact_vs_numpy(rng):
    q = rng.normal(size=(20, 3)).astype(np.float32)
    p = rng.normal(size=(50, 3)).astype(np.float32)
    idx, d2 = knn(jnp.asarray(q), jnp.asarray(p), 5)
    full = ((q[:, None] - p[None]) ** 2).sum(-1)
    want_idx = np.argsort(full, axis=1)[:, :5]
    want_d = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(d2), want_d, atol=1e-4)
    # indices may permute within distance ties; compare via distances
    got_d = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_d, want_d, atol=1e-4)


def test_knn_self_query_includes_self(rng):
    p = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    idx, d2 = knn(p, p, 1)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(30))
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)


def test_knn_batch_and_group(rng):
    p = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
    idx, _ = knn_batch(p, p, 4)
    assert idx.shape == (2, 40, 4)
    groups = jax.vmap(group_points)(p, idx)
    assert groups.shape == (2, 40, 4, 3)


# -- normals ----------------------------------------------------------------

def test_smallest_eigenvector_known():
    a = jnp.diag(jnp.array([5.0, 2.0, 9.0]))
    v = np.asarray(smallest_eigenvector_sym3x3(a))
    np.testing.assert_allclose(np.abs(v), [0, 1, 0], atol=1e-5)


def test_smallest_eigenvector_vs_numpy(rng):
    mats = rng.normal(size=(64, 3, 3)).astype(np.float32)
    sym = mats @ mats.transpose(0, 2, 1)
    v = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(sym)))
    w, vecs = np.linalg.eigh(sym)
    want = vecs[:, :, 0]
    dots = np.abs(np.sum(v * want, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_normals_on_plane(rng):
    xy = rng.uniform(-1, 1, (256, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((256, 1), np.float32)], axis=1)
    pts += rng.normal(0, 1e-4, pts.shape).astype(np.float32)
    normals = np.asarray(
        estimate_normals(jnp.asarray(pts), k=12, viewpoint=jnp.array([0.0, 0.0, 10.0]))
    )
    np.testing.assert_allclose(normals[:, 2], 1.0, atol=1e-2)


def test_normals_on_sphere(rng):
    v = rng.normal(size=(512, 3)).astype(np.float32)
    pts = v / np.linalg.norm(v, axis=1, keepdims=True)
    normals = np.asarray(estimate_normals(jnp.asarray(pts), k=8))
    dots = np.abs(np.sum(normals * pts, axis=-1))
    assert np.quantile(dots, 0.1) > 0.95  # normals align with radial direction


# -- hidden point removal ---------------------------------------------------

def test_hpr_sphere_front_visible(rng):
    v = rng.normal(size=(2000, 3))
    pts = v / np.linalg.norm(v, axis=1, keepdims=True)
    camera = np.array([10.0, 0.0, 0.0])
    visible = hidden_point_removal(pts, camera)
    assert 0 < len(visible) < 2000
    front = pts[:, 0] > 0.3
    back = pts[:, 0] < -0.3
    vis_mask = np.zeros(2000, bool)
    vis_mask[visible] = True
    # most clearly-front points visible, most clearly-back points hidden
    assert vis_mask[front].mean() > 0.9
    assert vis_mask[back].mean() < 0.01  # no back-face leakage


def test_segment_reduce_pallas_matches_einsum(rng):
    """The Pallas segment reduce must match the XLA one-hot einsum to the
    two-pass-bf16 contract: the kernel contracts a hi/lo-split bf16 data
    operand (the TPU MXU's single default pass truncates f32 coordinates
    to bf16 — measured 6 cm voxel-centroid error at 30 m scenes — while
    hi+lo leaves only the lo term's own bf16 rounding, ~2^-16 relative of
    the data magnitude). 30x-magnitude data pins the bound at scene
    scale."""
    from pointcloudprocessing_tpu.ops.pallas.voxel_reduce import segment_reduce_pallas

    b, n, d = 3, 64, 4
    data = jnp.asarray((rng.normal(size=(b, n, d)) * 30).astype(np.float32))
    rank = jnp.asarray(rng.integers(0, n, (b, n)).astype(np.int32))
    got = np.asarray(segment_reduce_pallas(data, rank, k_tile=16))
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (b, n, n), 2) == rank[..., None])
    want = np.asarray(jnp.einsum("bnk,bnd->bkd", onehot.astype(jnp.float32), data))
    # 2^-16 relative of the ~30-magnitude inputs, times segment size
    np.testing.assert_allclose(got, want, rtol=0, atol=30 * 2.0**-16 * 8)


def test_fps_and_gather_matches_indexing(rng):
    """The fused sample+gather output must equal indexing points by the
    returned indices (both the Pallas kernel and the fallback path)."""
    from pointcloudprocessing_tpu.ops.fps import farthest_point_sample_and_gather
    from pointcloudprocessing_tpu.ops.pallas.fps import fps_pallas_with_points
    from pointcloudprocessing_tpu.ops.fps import _seed_indices

    pts = jnp.asarray(rng.normal(size=(4, 64, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(4, 64)) > 0.2)
    mask = mask.at[:, 0].set(True)

    idx, sampled = farthest_point_sample_and_gather(pts, 16, mask)
    want = np.take_along_axis(np.asarray(pts), np.asarray(idx)[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(sampled), want)

    # Pallas kernel directly (interpret mode on CPU)
    start = _seed_indices(mask, 0)
    idx2, sampled2 = fps_pallas_with_points(pts, 16, mask, start)
    want2 = np.take_along_axis(np.asarray(pts), np.asarray(idx2)[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(sampled2), want2)


def test_fps_auto_handles_awkward_batch_sizes(rng):
    """Batches with no valid Pallas cloud block (e.g. 1000 at large n under
    the VMEM budget rules) must fall back to an XLA method, not raise."""
    from pointcloudprocessing_tpu.ops.fps import _pallas_block_ok, farthest_point_sample_batch

    assert not _pallas_block_ok(1000, 2048, 1024)
    assert _pallas_block_ok(256, 2048, 1024)
    # small case still runs end to end under auto
    pts = jnp.asarray(rng.normal(size=(5, 48, 3)).astype(np.float32))
    idx = farthest_point_sample_batch(pts, 8)
    assert idx.shape == (5, 8)


def test_normals_far_from_origin(rng):
    """Regression (round-2 review): the covariance must be computed in
    centered form — E[x^2]-E[x]^2 cancels catastrophically in f32 for a
    2 cm-spread patch 100 m from the origin."""
    pts = np.zeros((128, 3), np.float32)
    pts[:, :2] = rng.uniform(-0.01, 0.01, (128, 2))
    pts += np.array([100.0, 100.0, 100.0], np.float32)
    normals = np.asarray(
        estimate_normals(jnp.asarray(pts), k=8, exact=True,
                         viewpoint=jnp.array([100.0, 100.0, 200.0]))
    )
    np.testing.assert_allclose(normals[:, 2], 1.0, atol=1e-3)


# -- morton keys + windowed normals ------------------------------------------

def test_morton_keys_match_numpy_reference(rng):
    """(hi, lo) two-key order must equal the interleaved-bit Z-order
    computed the slow way in python ints."""
    from pointcloudprocessing_tpu.ops.morton import morton_keys_3d

    coords = rng.integers(0, 32768, (256, 3)).astype(np.int32)
    hi, lo = morton_keys_3d(
        jnp.asarray(coords[:, 0]), jnp.asarray(coords[:, 1]), jnp.asarray(coords[:, 2])
    )
    keys = np.asarray(hi).astype(np.int64) * (1 << 30) + np.asarray(lo)

    def slow_morton(x, y, z):
        out = 0
        for i in range(15):
            out |= ((x >> i) & 1) << (3 * i + 2)
            out |= ((y >> i) & 1) << (3 * i + 1)
            out |= ((z >> i) & 1) << (3 * i)
        return out

    want = np.array([slow_morton(*c) for c in coords.tolist()], np.int64)
    np.testing.assert_array_equal(np.argsort(keys, kind="stable"),
                                  np.argsort(want, kind="stable"))
    # equal coords -> equal keys (voxel grouping requirement)
    hi2, lo2 = morton_keys_3d(
        jnp.asarray(coords[:1].repeat(4, 0)[:, 0]),
        jnp.asarray(coords[:1].repeat(4, 0)[:, 1]),
        jnp.asarray(coords[:1].repeat(4, 0)[:, 2]),
    )
    assert len(set(np.asarray(hi2).tolist())) == 1
    assert len(set(np.asarray(lo2).tolist())) == 1


def test_voxel_output_is_morton_ordered(rng):
    """Voxel output order must follow the Z-curve: consecutive rows should
    be spatially close (the windowed-normals contract)."""
    from pointcloudprocessing_tpu.ops.morton import morton_keys_3d

    pts = jnp.asarray(rng.uniform(-20, 20, (1, 2048, 3)).astype(np.float32))
    out, mask = voxel_downsample_batch(pts, 1.0)
    k = int(mask.sum())
    got = np.asarray(out[0, :k])
    coords = np.floor(got / 1.0).astype(np.int64)
    rel = coords - coords.min(axis=0)
    hi, lo = morton_keys_3d(
        jnp.asarray(rel[:, 0]), jnp.asarray(rel[:, 1]), jnp.asarray(rel[:, 2])
    )
    keys = np.asarray(hi).astype(np.int64) * (1 << 30) + np.asarray(lo)
    assert (np.diff(keys) > 0).all()  # strictly ascending (one row per voxel)


def test_normals_window_matches_exact_on_surface(rng):
    """The Pallas windowed path must agree with the exact brute-force path
    on Morton-ordered surface data (the intended producer: voxel output)."""
    from pointcloudprocessing_tpu.ops import estimate_normals_batch

    xy = rng.uniform(-10, 10, (2, 2048, 2)).astype(np.float32)
    z = 0.05 * (xy[..., 0] ** 2 + xy[..., 1] ** 2)
    pts = np.concatenate([xy, z[..., None]], axis=-1).astype(np.float32)
    pts += np.array([50.0, -30.0, 5.0], np.float32)  # f32 cancellation stress
    vox, mask = voxel_downsample_batch(jnp.asarray(pts), 0.5)
    vp = jnp.asarray(np.array([[50.0, -30.0, 500.0]] * 2, np.float32))

    ne = np.asarray(estimate_normals_batch(vox, k=16, valid_mask=mask,
                                           viewpoint=vp, method="exact"))
    nw = np.asarray(estimate_normals_batch(vox, k=16, valid_mask=mask,
                                           viewpoint=vp, method="window"))
    m = np.asarray(mask)
    ang = np.degrees(np.arccos(np.clip(np.abs(np.sum(ne * nw, -1)), 0, 1)[m]))
    assert np.median(ang) < 1.0
    assert np.percentile(ang, 95) < 5.0


def test_normals_window_edge_cases(rng):
    from pointcloudprocessing_tpu.ops import estimate_normals_batch

    # fewer valid points than k: finite output, no garbage from padding
    pts = np.zeros((1, 256, 3), np.float32)
    pts[0, :5, :2] = rng.uniform(-1, 1, (5, 2))
    pts[0, 5:] = 1e6  # garbage padding rows
    mask = jnp.zeros((1, 256), bool).at[:, :5].set(True)
    out = np.asarray(
        estimate_normals_batch(jnp.asarray(pts), k=16, valid_mask=mask,
                               method="window")
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.abs(out[0, :5, 2]), 1.0, atol=1e-3)

    # non-128-multiple n pads internally and crops back
    odd = jnp.asarray(rng.normal(size=(1, 490, 3)).astype(np.float32))
    out2 = estimate_normals_batch(odd, k=8, method="window")
    assert out2.shape == (1, 490, 3)
    assert np.isfinite(np.asarray(out2)).all()

    # single-cloud entry point
    single = estimate_normals(jnp.asarray(pts[0]), k=4, method="window")
    assert single.shape == (256, 3)


# -- on-device hidden point removal ------------------------------------------

def test_hpr_mask_sphere(rng):
    """Front hemisphere visible, back hemisphere occluded — matching the
    host hull version's quality bars, but fixed-shape and jit-safe."""
    from pointcloudprocessing_tpu.ops import hidden_point_removal_mask

    v = rng.normal(size=(2000, 3))
    pts = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    camera = jnp.asarray(np.array([10.0, 0.0, 0.0], np.float32))
    vis = np.asarray(
        jax.jit(lambda p, c: hidden_point_removal_mask(p, c))(
            jnp.asarray(pts), camera
        )
    )
    front = pts[:, 0] > 0.3
    back = pts[:, 0] < -0.3
    assert vis[front].mean() > 0.9
    assert vis[back].mean() < 0.01

    # agreement with the Katz hull formulation
    hull_vis = np.zeros(len(pts), bool)
    hull_vis[hidden_point_removal(pts, np.asarray(camera))] = True
    assert (vis == hull_vis).mean() > 0.85


def test_hpr_mask_batched_and_valid(rng):
    from pointcloudprocessing_tpu.ops import hidden_point_removal_mask

    v = rng.normal(size=(2, 512, 3))
    pts = (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)
    pts[:, 500:] = 1e6  # garbage padding rows
    valid = jnp.ones((2, 512), bool).at[:, 500:].set(False)
    cams = jnp.asarray(np.array([[10.0, 0, 0], [0, 10.0, 0]], np.float32))
    vis = np.asarray(hidden_point_removal_mask(jnp.asarray(pts), cams, valid))
    assert vis.shape == (2, 512)
    assert not vis[:, 500:].any()  # invalid rows never visible
    # occlusion direction tracks each cloud's own camera
    assert vis[0][pts[0, :, 0] > 0.3].mean() > 0.9
    assert vis[1][pts[1, :, 1] > 0.3].mean() > 0.9


# -- blocked FPS --------------------------------------------------------------

def _covering_radius(points, selected):
    """FPS objective: max over points of distance to the nearest selection."""
    d = np.linalg.norm(points[:, None, :] - selected[None, :, :], axis=-1)
    return d.min(axis=1).max()


def test_blocked_fps_quality_and_mapping(rng):
    from pointcloudprocessing_tpu.ops.fps import farthest_point_sample_and_gather
    from pointcloudprocessing_tpu.ops import voxel_downsample_batch

    raw = jnp.asarray(rng.uniform(-10, 10, (2, 1024, 3)).astype(np.float32))
    pts, mask = voxel_downsample_batch(raw, 0.5)  # Morton order, padded tail
    idx_e, sel_e = farthest_point_sample_and_gather(pts, 64, mask)
    idx_b, sel_b = farthest_point_sample_and_gather(pts, 64, mask, chains=4)

    idx_b2, sel_b2 = farthest_point_sample_and_gather(pts, 64, mask, chains=2)

    p, m = np.asarray(pts), np.asarray(mask)
    ib, sb = np.asarray(idx_b), np.asarray(sel_b)
    for c in range(2):
        # indices map back to the original rows and stay on valid points
        np.testing.assert_allclose(p[c][ib[c]], sb[c], atol=0)
        assert m[c][ib[c]].all()
        # spread (covering radius = the FPS objective), on worst-case
        # VOLUME data: more chains -> more independent subsets -> looser
        # spread. Measured ~1.15x (chains=2) / ~1.6x (chains=4); the bounds
        # document the contract users opt into.
        r_exact = _covering_radius(p[c][m[c]], np.asarray(sel_e)[c])
        assert _covering_radius(p[c][m[c]], sb[c]) <= 2.0 * r_exact
        assert _covering_radius(
            p[c][m[c]], np.asarray(sel_b2)[c]
        ) <= 1.5 * r_exact


def test_blocked_fps_divisibility_error(rng):
    from pointcloudprocessing_tpu.ops.fps import farthest_point_sample_and_gather

    pts = jnp.asarray(rng.normal(size=(1, 100, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="chains"):
        farthest_point_sample_and_gather(pts, 10, chains=3)


def test_sorted_segment_reduce_banded_matches_dense(rng):
    """The banded kernel (monotone rank) must agree with the dense kernel
    and the exact einsum to the shared two-pass-bf16 contract, including
    empty segments, segments straddling chunk boundaries, and a
    larger-than-one-chunk segment."""
    from pointcloudprocessing_tpu.ops.pallas.voxel_reduce import (
        segment_reduce_pallas,
        sorted_segment_reduce_pallas,
    )

    b, n, d = 2, 512, 4
    data = jnp.asarray((rng.normal(size=(b, n, d)) * 30).astype(np.float32))
    # monotone rank with chunky segments: sorted draws from a skewed range
    raw = np.sort(rng.integers(0, n // 3, (b, n)), axis=1)
    raw[1, : n // 2] = 0  # one segment spanning multiple 128-chunks
    rank = jnp.asarray(raw.astype(np.int32))
    got = np.asarray(
        sorted_segment_reduce_pallas(data, rank, k_tile=64, chunk=128)
    )
    dense = np.asarray(segment_reduce_pallas(data, rank))
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n, n), 2) == rank[..., None]
    )
    want = np.asarray(
        jnp.einsum("bnk,bnd->bkd", onehot.astype(jnp.float32), data)
    )
    atol = 30 * 2.0**-16 * (n // 2)
    np.testing.assert_allclose(got, dense, atol=atol)
    np.testing.assert_allclose(got, want, atol=atol)


def test_stride_sample_quality_and_mapping(rng):
    """O(n) stratified sampling on Morton-ordered voxel output: indices
    map to real valid rows, picks are unique and ordered, and the covering
    radius stays within 2x of exact FPS on worst-case volume data."""
    from pointcloudprocessing_tpu.ops.fps import (
        farthest_point_sample_and_gather,
        stride_sample_and_gather,
    )
    from pointcloudprocessing_tpu.ops import voxel_downsample_batch

    raw = jnp.asarray(rng.uniform(-10, 10, (2, 1024, 3)).astype(np.float32))
    pts, mask = voxel_downsample_batch(raw, 0.5)
    k = 64
    idx_s, sel_s = stride_sample_and_gather(pts, k, mask)
    _, sel_e = farthest_point_sample_and_gather(pts, k, mask)

    p, m = np.asarray(pts), np.asarray(mask)
    i_s, s_s = np.asarray(idx_s), np.asarray(sel_s)
    for c in range(2):
        assert m[c].sum() >= k  # precondition: enough valid rows
        np.testing.assert_allclose(p[c][i_s[c]], s_s[c], atol=1e-5)
        assert m[c][i_s[c]].all()
        assert len(np.unique(i_s[c])) == k  # one pick per bucket
        assert (np.diff(i_s[c]) > 0).all()  # strictly ordered along Morton
        r_exact = _covering_radius(p[c][m[c]], np.asarray(sel_e)[c])
        assert _covering_radius(p[c][m[c]], s_s[c]) <= 2.0 * r_exact


def test_stride_sample_underfilled(rng):
    """Regression (round-2 advisor): with fewer valid rows than samples the
    bucket map skips output slots; those must be forward-filled by
    repeating valid picks (FPS-path semantics), never phantom zeros."""
    from pointcloudprocessing_tpu.ops.fps import stride_sample_and_gather

    b, n, k, nv = 2, 256, 64, 13
    pts = np.zeros((b, n, 3), np.float32)
    pts[:, :nv] = rng.uniform(1.0, 10.0, (b, nv, 3))  # valid rows packed first
    mask = np.zeros((b, n), bool)
    mask[:, :nv] = True
    idx, sel = stride_sample_and_gather(jnp.asarray(pts), k, jnp.asarray(mask))
    i, s = np.asarray(idx), np.asarray(sel)
    for c in range(b):
        assert (i[c] < nv).all() and (i[c] >= 0).all()  # only valid sources
        np.testing.assert_allclose(pts[c][i[c]], s[c], atol=1e-6)
        assert (np.abs(s[c]).sum(axis=-1) > 0).all()  # no all-zero rows
        assert len(np.unique(i[c])) == nv  # every valid row still picked


def test_window_normals_single_valid_point(rng):
    """Regression: a query whose window holds no valid nonzero-distance
    candidate (m = inf) must not select padding rows via inf <= inf —
    the valid point's neighborhood count stays 1."""
    from pointcloudprocessing_tpu.ops.pallas.window_normals import (
        windowed_moment_sums,
    )

    pts = jnp.asarray(rng.normal(size=(1, 512, 3)).astype(np.float32) * 50)
    mask = jnp.zeros((1, 512), bool).at[0, 0].set(True)
    cnt = windowed_moment_sums(pts, mask, k=16, window=128, q_block=128)[0]
    assert float(cnt[0, 0]) == 1.0


def test_voxel_and_normals_plane_layout_match(rng):
    """layout='bcn' (plane-major SoA, the copy-free TPU pipeline layout)
    must agree with the default 'bnc' path through voxel downsample and
    windowed normals; masks must be identical."""
    pts = jnp.asarray(rng.uniform(-10, 10, (4, 1024, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(4, 1024)) > 0.1)

    o1, m1 = voxel_downsample_batch(pts, 0.5, mask)
    o2, m2 = voxel_downsample_batch(pts, 0.5, mask, layout="bcn")
    assert o2.shape == (4, 3, 1024)
    assert bool(jnp.all(m1 == m2))
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(o2), 1, 2), np.asarray(o1), atol=1e-5
    )

    n1 = estimate_normals_batch(o1, k=8, valid_mask=m1, method="window")
    n2 = estimate_normals_batch(
        o2, k=8, valid_mask=m2, method="window", layout="bcn"
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(n2), 1, 2), np.asarray(n1), atol=2e-5
    )

    with pytest.raises(ValueError):
        estimate_normals_batch(o2, k=8, valid_mask=m2, layout="bcn")  # exact
    with pytest.raises(ValueError):
        voxel_downsample_batch(pts, 0.5, mask, layout="nope")


def test_window_normals_search_impls_agree(rng):
    """The v2 integer-bit threshold search (measured slower on TPU, kept as
    a numerical cross-check — docs/PERF.md) must match v1 on a curved
    surface: both implement count-threshold selection over the same level
    family, so normals should agree to near-tie tolerance."""
    from pointcloudprocessing_tpu.ops.pallas import window_normals as wn

    n = 2048
    u = rng.uniform(0, 2 * np.pi, (1, n))
    v = np.arccos(rng.uniform(-1, 1, (1, n)))
    sph = np.stack(
        [8 * np.sin(v) * np.cos(u), 8 * np.sin(v) * np.sin(u), 8 * np.cos(v)],
        -1,
    ).astype(np.float32)
    x = jnp.asarray(sph)
    vox, mask = voxel_downsample_batch(x, 0.35)
    old = wn._SEARCH_IMPL
    try:
        wn._SEARCH_IMPL = "v1"
        n1 = estimate_normals_batch(vox, k=16, valid_mask=mask, method="window")
        wn._SEARCH_IMPL = "v2"
        n2 = estimate_normals_batch(vox, k=16, valid_mask=mask, method="window")
    finally:
        wn._SEARCH_IMPL = old
    dot = np.abs(np.sum(np.asarray(n1) * np.asarray(n2), axis=-1)).clip(0, 1)
    ang = np.degrees(np.arccos(dot))[np.asarray(mask)]
    assert np.median(ang) < 1.0 and np.percentile(ang, 95) < 5.0


def test_fps_and_stride_plane_layout_match(rng):
    """FPS and stride sampling with layout='bcn' (plane-major input) must
    select identical indices and coordinates as the 'bnc' path."""
    from pointcloudprocessing_tpu.ops.fps import (
        farthest_point_sample_and_gather,
        stride_sample_and_gather,
    )

    pts = jnp.asarray(rng.uniform(-5, 5, (4, 256, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(4, 256)) > 0.2)
    mask = mask.at[:, 0].set(True)
    ptsT = jnp.swapaxes(pts, 1, 2)

    i1, s1 = farthest_point_sample_and_gather(pts, 64, mask)
    i2, s2 = farthest_point_sample_and_gather(ptsT, 64, mask, layout="bcn")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)

    j1, t1 = stride_sample_and_gather(pts, 64, mask)
    j2, t2 = stride_sample_and_gather(ptsT, 64, mask, layout="bcn")
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)
