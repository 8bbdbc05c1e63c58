"""Procedural triangle meshes for synthetic multi-class workloads.

The reference's class-test sweep (point_cloud_analysis/examples/class_test/)
runs over .obj aircraft models that are not redistributable; these parametric
shapes provide geometrically distinct stand-ins so the N-way classification
experiments are runnable from a clean checkout. Each factory returns a
:class:`~pointcloudprocessing_tpu.synthesis.mesh.Mesh`.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

_BOX_FACES = np.array(
    [
        [0, 1, 2], [0, 2, 3],  # bottom (z-)
        [4, 6, 5], [4, 7, 6],  # top (z+)
        [0, 4, 5], [0, 5, 1],  # y-
        [3, 2, 6], [3, 6, 7],  # y+
        [0, 3, 7], [0, 7, 4],  # x-
        [1, 5, 6], [1, 6, 2],  # x+
    ],
    dtype=np.int32,
)


def box_mesh(extents: tuple[float, float, float] = (1.0, 1.0, 1.0)) -> Mesh:
    """Axis-aligned box centered at the origin."""
    ex, ey, ez = (e / 2.0 for e in extents)
    corners = np.array(
        [
            [-ex, -ey, -ez], [ex, -ey, -ez], [ex, ey, -ez], [-ex, ey, -ez],
            [-ex, -ey, ez], [ex, -ey, ez], [ex, ey, ez], [-ex, ey, ez],
        ]
    )
    return Mesh(vertices=corners, triangles=_BOX_FACES.copy())


def octahedron_mesh(radius: float = 1.0, subdivisions: int = 1) -> Mesh:
    """Octahedron (optionally subdivided + reprojected -> sphere-like)."""
    v = radius * np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=float,
    )
    f = np.array(
        [
            [0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
            [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5],
        ],
        dtype=np.int32,
    )
    for _ in range(subdivisions):
        v, f = _subdivide(v, f)
        v = v / np.linalg.norm(v, axis=-1, keepdims=True) * radius
    return Mesh(vertices=v, triangles=f)


def _subdivide(vertices: np.ndarray, faces: np.ndarray):
    """Loop-style 1->4 triangle split (new vertices at edge midpoints)."""
    edge_cache: dict[tuple[int, int], int] = {}
    verts = list(vertices)

    def midpoint(a: int, b: int) -> int:
        key = (min(a, b), max(a, b))
        if key not in edge_cache:
            edge_cache[key] = len(verts)
            verts.append((vertices[a] + vertices[b]) / 2.0)
        return edge_cache[key]

    out = []
    for a, b, c in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        out.extend([[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]])
    return np.asarray(verts), np.asarray(out, dtype=np.int32)


def compound_mesh(*parts: Mesh) -> Mesh:
    """Concatenate meshes (no boolean union — overlapping shells are fine
    for surface sampling)."""
    vertices, triangles, offset = [], [], 0
    for part in parts:
        vertices.append(part.vertices)
        triangles.append(part.triangles + offset)
        offset += len(part.vertices)
    return Mesh(
        vertices=np.concatenate(vertices), triangles=np.concatenate(triangles)
    )


def aircraft_like_mesh(
    fuselage_len: float = 6.0,
    wing_span: float = 5.0,
    tail_height: float = 1.2,
) -> Mesh:
    """Crude plane: fuselage box + wing plate + vertical stabilizer."""
    fuselage = box_mesh((fuselage_len, 0.8, 0.8))
    wing = box_mesh((1.2, wing_span, 0.15))
    tail = box_mesh((0.8, 0.15, tail_height))
    tail.translate(np.array([-fuselage_len / 2 + 0.5, 0.0, tail_height / 2]))
    return compound_mesh(fuselage, wing, tail)


def shape_library(n: int) -> dict[str, Mesh]:
    """``n`` geometrically distinct meshes keyed by a stable name.

    Deterministic: entry k is the same mesh regardless of ``n``. Used by the
    class-test data generator to stand in for the reference's n-aircraft
    library.
    """
    factories = [
        ("cube", lambda: box_mesh((2.0, 2.0, 2.0))),
        ("rod", lambda: box_mesh((6.0, 0.5, 0.5))),
        ("plate", lambda: box_mesh((4.0, 4.0, 0.2))),
        ("octa", lambda: octahedron_mesh(2.0, 1)),
        ("plane", lambda: aircraft_like_mesh()),
        ("sphere", lambda: octahedron_mesh(2.0, 3)),
        ("tall", lambda: box_mesh((0.8, 0.8, 5.0))),
        ("wide-plane", lambda: aircraft_like_mesh(4.0, 9.0, 0.8)),
    ]
    out: dict[str, Mesh] = {}
    for k in range(n):
        name, fn = factories[k % len(factories)]
        mesh = fn()
        if k >= len(factories):
            # later entries: progressively rescaled variants stay distinct
            mesh.scale(1.0 + 0.35 * (k // len(factories)), np.zeros(3))
            name = f"{name}-{k // len(factories)}"
        out[name] = mesh
    return out
