"""Procedural test geometry and small helpers.

Generates simple meshes (box rooms, icospheres, single quads) so tests and
demos don't depend on external assets. Absorption can be set per face group.
Also hosts the backend-aware IR comparison used by the parity tests.
"""
from __future__ import annotations

import os

import numpy as np

from .io.obj import MeshData
from .scene import Scene, build_scene


def on_tpu_suite() -> bool:
    """True when the test suite targets the real TPU backend
    (``AR2_TEST_TPU=1``; tests/conftest.py otherwise pins an 8-device
    virtual CPU mesh)."""
    return bool(os.environ.get("AR2_TEST_TPU"))


def assert_ir_close(a, b, exact: bool | None = None,
                    rtol: float = 1e-3, atol: float = 5e-7,
                    l1_budget: float = 1e-2) -> None:
    """Compare two IR histograms, exactly or statistically.

    ``exact`` (default: not :func:`on_tpu_suite`): per-bin allclose — valid
    when both programs run identical f32 arithmetic (the CPU mesh, where
    backends match bit-for-bit). On the real chip, two differently-fused XLA
    programs diverge at f32 rounding; bounce chaos amplifies an ulp into a
    different path for a handful of rays, which moves whole deposits across
    bins — per-bin allclose then fails regardless of tolerance while the
    renders remain physically identical. The statistical mode asserts what
    hardware actually preserves:

      * per-ear total energy within ``rtol`` (deposit arithmetic parity),
      * relative L1 distance between the full histograms below
        ``l1_budget`` (at most a ray-countable handful of deposits moved).

    CPU-exactness remains pinned by the exact mode on the CPU mesh run.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    if exact is None:
        exact = not on_tpu_suite()
    if exact:
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
        return
    assert a.shape == b.shape, (a.shape, b.shape)
    ea = a.reshape(a.shape[0], -1).sum(axis=1)
    eb = b.reshape(b.shape[0], -1).sum(axis=1)
    np.testing.assert_allclose(ea, eb, rtol=max(rtol, 1e-3), atol=atol)
    denom = np.abs(a).sum()
    assert denom > 0, "empty IR"
    l1 = np.abs(a - b).sum() / denom
    assert l1 < l1_budget, (
        f"relative L1 distance {l1:.3e} exceeds {l1_budget:.1e} "
        f"(more than a few deposits moved bins)")


def mesh_from_arrays(vertices, triangles, tri_material=None,
                     material_names=None) -> MeshData:
    vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
    triangles = np.asarray(triangles, np.int32).reshape(-1, 3)
    if tri_material is None:
        tri_material = np.full(triangles.shape[0], -1, np.int32)
    return MeshData(
        vertices=vertices,
        triangles=triangles,
        tri_material=np.asarray(tri_material, np.int32),
        material_names=list(material_names or []),
    )


def scene_from_arrays(vertices, triangles, absorption) -> Scene:
    """Build a Scene with a uniform or per-triangle absorption."""
    mesh = mesh_from_arrays(vertices, triangles)
    absorption = np.asarray(absorption, np.float32)
    if absorption.ndim == 0:
        absorption = np.full(mesh.n_triangles, float(absorption), np.float32)
    return build_scene(mesh, absorption)


def quad(center, u_axis, v_axis):
    """Two triangles spanning center +- u_axis +- v_axis.

    Returns (vertices [4,3], triangles [2,3])."""
    c = np.asarray(center, np.float32)
    u = np.asarray(u_axis, np.float32)
    v = np.asarray(v_axis, np.float32)
    verts = np.stack([c - u - v, c + u - v, c + u + v, c - u + v])
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, tris


def box_room(size=(10.0, 10.0, 10.0), center=(0.0, 0.0, 0.0)):
    """A closed axis-aligned box room (12 triangles).

    Returns (vertices [8,3], triangles [12,3])."""
    sx, sy, sz = [s / 2.0 for s in size]
    cx, cy, cz = center
    verts = np.array([
        [cx - sx, cy - sy, cz - sz], [cx + sx, cy - sy, cz - sz],
        [cx + sx, cy + sy, cz - sz], [cx - sx, cy + sy, cz - sz],
        [cx - sx, cy - sy, cz + sz], [cx + sx, cy - sy, cz + sz],
        [cx + sx, cy + sy, cz + sz], [cx - sx, cy + sy, cz + sz],
    ], np.float32)
    tris = np.array([
        [0, 1, 2], [0, 2, 3],  # z-
        [4, 6, 5], [4, 7, 6],  # z+
        [0, 4, 5], [0, 5, 1],  # y-
        [3, 2, 6], [3, 6, 7],  # y+
        [0, 3, 7], [0, 7, 4],  # x-
        [1, 5, 6], [1, 6, 2],  # x+
    ], np.int32)
    return verts, tris


def icosphere(radius=1.0, center=(0.0, 0.0, 0.0), subdivisions=2):
    """Subdivided icosahedron. Returns (vertices, triangles)."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts = [tuple(v) for v in verts]
    cache: dict = {}

    def midpoint(i, j):
        key = (min(i, j), max(i, j))
        if key not in cache:
            m = np.add(verts[i], verts[j]) / 2.0
            m /= np.linalg.norm(m)
            cache[key] = len(verts)
            verts.append(tuple(m))
        return cache[key]

    for _ in range(subdivisions):
        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new_faces

    v = np.asarray(verts, np.float32) * radius + np.asarray(center, np.float32)
    return v, np.asarray(faces, np.int32)
