"""Morton (Z-order) keys for quantized voxel coordinates.

The voxel pipeline needs a total order on integer grid coordinates in which
(a) equal coordinates are adjacent (so segment boundaries delimit voxels)
and (b) nearby coordinates tend to be nearby in the order. Lexicographic
order gives only (a); the Morton curve gives both, which lets downstream
neighborhood ops (windowed kNN normals) read spatially local candidates
from a contiguous index window instead of searching the whole cloud.

15 bits per axis (grid extents to 32768 voxels — any real scan) interleave
into a 45-bit code, split across two int32 sort keys: ``hi`` carries the
top 5 bits of each axis (15 interleaved bits), ``lo`` the bottom 10 bits of
each (30 interleaved bits). ``jax.lax.sort(..., num_keys=2)`` over (hi, lo)
is exactly the Morton order, with no int64 requirement.
"""

from __future__ import annotations

import jax.numpy as jnp


def _part1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of int32 ``v`` so bit i lands at bit 3*i."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_keys_3d(
    x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(hi, lo) int32 Morton sort keys for non-negative grid coords < 2**15.

    Sorting by (hi, lo) orders points along the 3-D Z-curve; equal
    (x, y, z) triples map to equal (hi, lo) pairs and vice versa. Bit
    order within a level: x highest, then y, then z — the choice is
    arbitrary but must stay fixed (sort stability contracts depend on it).
    """
    x = jnp.clip(x, 0, 32767).astype(jnp.int32)
    y = jnp.clip(y, 0, 32767).astype(jnp.int32)
    z = jnp.clip(z, 0, 32767).astype(jnp.int32)
    hi = (
        (_part1by2(x >> 10) << 2)
        | (_part1by2(y >> 10) << 1)
        | _part1by2(z >> 10)
    )
    lo = (
        (_part1by2(x) << 2)
        | (_part1by2(y) << 1)
        | _part1by2(z)
    )
    return hi, lo
