"""Marching-tetrahedra mesh extraction (ops/marching.py).

Validates the triangle mesh against an analytic sphere SDF: vertices sit on
the zero level set, faces are well-formed, surface samples land at the
sphere radius, and the PLY writer round-trips through a manual parse.
"""

import numpy as np

from dqo_map_tpu.ops.marching import (marching_tetrahedra, sample_mesh_points,
                                      write_mesh_ply)


def _sphere_volume(n=48, r=0.35):
    lin = (np.arange(n) + 0.5) / n - 0.5          # voxel centers in [-.5,.5]
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    d = np.sqrt(gx**2 + gy**2 + gz**2) - r        # SDF, <0 inside
    tsdf = np.clip(d / (4.0 / n), -1, 1)          # truncate like ops/tsdf
    weight = np.ones_like(tsdf) * 5.0
    return tsdf, weight, 1.0 / n


def test_sphere_mesh_on_level_set():
    tsdf, weight, voxel = _sphere_volume()
    verts, faces, _ = marching_tetrahedra(tsdf, weight, origin=(0, 0, 0),
                                          voxel=voxel)
    assert len(verts) > 500 and len(faces) > 500
    assert faces.max() < len(verts) and faces.min() >= 0
    center = np.array([0.5, 0.5, 0.5])
    radii = np.linalg.norm(verts - center, axis=1)
    # vertices within half a voxel of the true radius
    assert np.abs(radii - 0.35).max() < voxel * 0.75
    # no degenerate faces
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    assert (area > 0).all()
    # total area ~ 4 pi r^2 (tet meshes slightly overshoot; generous band)
    assert 0.8 < area.sum() / (4 * np.pi * 0.35**2) < 1.3


def test_sample_mesh_points_on_surface():
    tsdf, weight, voxel = _sphere_volume()
    verts, faces, _ = marching_tetrahedra(tsdf, weight, (0, 0, 0), voxel)
    pts = sample_mesh_points(verts, faces, 5000, seed=1)
    radii = np.linalg.norm(pts - 0.5, axis=1)
    assert np.abs(radii - 0.35).max() < voxel


def test_mesh_ply_roundtrip(tmp_path):
    tsdf, weight, voxel = _sphere_volume(n=24)
    verts, faces, _ = marching_tetrahedra(tsdf, weight, (0, 0, 0), voxel)
    cols = np.full((len(verts), 3), 0.5)
    p = str(tmp_path / "m.ply")
    write_mesh_ply(p, verts, faces, cols)
    raw = open(p, "rb").read()
    hdr, body = raw.split(b"end_header\n", 1)
    assert f"element vertex {len(verts)}".encode() in hdr
    assert f"element face {len(faces)}".encode() in hdr
    vrec = np.frombuffer(body[:len(verts) * 15],
                         dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    np.testing.assert_allclose(vrec["xyz"], verts.astype(np.float32),
                               rtol=1e-6)
    frec = np.frombuffer(body[len(verts) * 15:],
                         dtype=[("n", "u1"), ("idx", "<i4", 3)])
    assert (frec["n"] == 3).all()
    np.testing.assert_array_equal(frec["idx"], faces.astype(np.int32))


def test_empty_volume():
    tsdf = np.ones((8, 8, 8), np.float32)
    weight = np.ones_like(tsdf)
    verts, faces, cols = marching_tetrahedra(tsdf, weight, (0, 0, 0), 0.1)
    assert len(verts) == 0 and len(faces) == 0
