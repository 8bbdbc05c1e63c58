"""Mesh loading / sampling / MeshSampler tests."""

import os

import numpy as np
import pytest

from pointcloudprocessing_tpu.synthesis import (
    Mesh,
    load_obj,
    sample_points_uniformly,
    MeshSampler,
    pad_observation,
)

CUBE_OBJ = """
v -1 -1 -1
v  1 -1 -1
v  1  1 -1
v -1  1 -1
v -1 -1  1
v  1 -1  1
v  1  1  1
v -1  1  1
f 1 4 3 2
f 5 6 7 8
f 1 2 6 5
f 2 3 7 6
f 3 4 8 7
f 4 1 5 8
"""


@pytest.fixture
def cube_path(tmp_path):
    path = tmp_path / "cube.obj"
    path.write_text(CUBE_OBJ)
    return str(path)


def test_load_obj_quads_triangulated(cube_path):
    mesh = load_obj(cube_path)
    assert mesh.vertices.shape == (8, 3)
    assert mesh.triangles.shape == (12, 3)  # 6 quads -> 12 triangles
    # cube surface area = 6 * 2x2 = 24
    assert mesh.triangle_areas().sum() == pytest.approx(24.0)


def test_load_obj_slash_indices(tmp_path):
    path = tmp_path / "m.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/1/1 2/2/2 3/3/3\n")
    mesh = load_obj(str(path))
    assert mesh.triangles.tolist() == [[0, 1, 2]]


def test_uniform_sampling_on_surface(cube_path, rng):
    mesh = load_obj(cube_path)
    pts = sample_points_uniformly(mesh, 5000, rng)
    assert pts.shape == (5000, 3)
    # every sample on the cube surface: max |coord| == 1
    maxc = np.max(np.abs(pts), axis=1)
    np.testing.assert_allclose(maxc, 1.0, atol=1e-9)
    # roughly 1/6 of the mass per face
    on_top = np.isclose(pts[:, 2], 1.0).mean()
    assert 0.10 < on_top < 0.23


def test_mesh_transform_ops(cube_path):
    mesh = load_obj(cube_path)
    mesh.scale(2.0)
    assert mesh.vertices.max() == pytest.approx(2.0)
    rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    v0 = mesh.vertices.copy()
    mesh.rotate(rot)
    np.testing.assert_allclose(mesh.vertices, v0 @ rot.T, atol=1e-12)


def test_vertex_normals_cube(cube_path):
    mesh = load_obj(cube_path)
    vn = mesh.vertex_normals()
    # corner normals point diagonally outward
    dots = np.sum(vn * mesh.vertices / np.linalg.norm(mesh.vertices, axis=1, keepdims=True), axis=1)
    assert (dots > 0.9).all()


def test_pad_observation():
    obs = [1, 2, 3]
    assert pad_observation(2, obs) == [1, 2]
    assert pad_observation(5, obs) == [1, 2, 3, 1, 2]


def test_meshsampler_viewpoint_observations(cube_path):
    sampler = MeshSampler(cube_path, "cube", random_seed=3)
    obs, labels, pos, dcms = sampler.create_viewpoint_observations(
        n=3, p=1500, pad=256, dist_range=(6.0, 8.0)
    )
    assert obs.shape == (3, 256, 3)
    assert list(labels) == ["cube"] * 3
    assert pos.shape == (3, 3)
    assert dcms.shape == (3, 3, 3)
    for i in range(3):
        # camera looks at origin
        np.testing.assert_allclose(
            dcms[i] @ dcms[i].T, np.eye(3), atol=1e-6
        )
        # occlusion: visible points biased toward the camera side
        vp = pos[i] / np.linalg.norm(pos[i])
        side = obs[i] @ vp
        assert side.mean() > -0.2


def test_meshsampler_full_sample(cube_path):
    sampler = MeshSampler(cube_path, "cube", random_seed=3)
    obs, labels, pos, dcms = sampler.create_full_sample_observations(
        n=2, p=500, pad=500
    )
    assert obs.shape == (2, 500, 3)
    # no occlusion: both sides present
    assert (obs[0][:, 0] > 0.99).any() and (obs[0][:, 0] < -0.99).any()


def test_meshsampler_reproject(cube_path):
    sampler = MeshSampler(cube_path, "cube", random_seed=5)
    obs, _, pos, _ = sampler.create_viewpoint_observations(
        n=2, p=800, pad=128, reproject=True
    )
    # reprojected: positions report object-at-origin, camera frame has +x
    # pointing at the cloud (all x > 0 at sane distances)
    np.testing.assert_array_equal(pos, 0.0)
    assert (obs[0][:, 0] > 0).mean() > 0.95


def test_meshsampler_no_mesh(capsys):
    sampler = MeshSampler(None, "nothing")
    obs, labels, pos, dcms = sampler.create_viewpoint_observations(2, 100, 64)
    assert obs.size == 0
    assert "No mesh loaded" in capsys.readouterr().out


def test_load_off_parses_and_samples(tmp_path):
    """OFF loader (ModelNet's format): header variants, quads, sampling."""
    from pointcloudprocessing_tpu.synthesis.mesh import load_off, sample_points_uniformly
    import numpy as np

    # standard header
    off = "OFF\n4 2 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n3 0 1 2\n3 0 2 3\n"
    p1 = tmp_path / "a.off"
    p1.write_text(off)
    mesh = load_off(str(p1))
    assert mesh.vertices.shape == (4, 3)
    assert mesh.triangles.shape == (2, 3)

    # ModelNet quirk: counts glued to the magic + a quad face
    off2 = "OFF 4 1 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n"
    p2 = tmp_path / "b.off"
    p2.write_text(off2)
    mesh2 = load_off(str(p2))
    assert mesh2.triangles.shape == (2, 3)  # quad fan-triangulated

    pts = sample_points_uniformly(mesh2, 64, np.random.default_rng(0))
    assert pts.shape == (64, 3)
    assert (pts[:, 2] == 0).all()  # unit square in z=0


@pytest.mark.slow
def test_modelnet_example_fallback(tmp_path, monkeypatch):
    """The public-dataset walkthrough runs end to end on the procedural
    fallback and learns above chance."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import modelnet_example

    monkeypatch.setitem(modelnet_example.CLOUDS_PER_CLASS, "train", 16)
    monkeypatch.setitem(modelnet_example.CLOUDS_PER_CLASS, "test", 4)
    monkeypatch.setattr(modelnet_example, "NUM_POINTS", 128)
    # eval-mode accuracy needs the momentum-0.99 BN running stats to settle
    # (~100-step time constant; ~480 steps here), hence the epoch count
    acc = modelnet_example.main(None, epochs=120)
    assert acc > 0.5  # 4 classes -> chance 0.25
