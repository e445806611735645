"""Per-object mesh-eval plumbing: mesh PLY IO, disc densification, and the
metric_obj --per-object path (ref `/root/reference/metric_obj.py:171-250`)."""

import numpy as np

from dqo_map_tpu.ops.marching import write_mesh_ply
from dqo_map_tpu.utils.ply import (densify_point_cloud, read_mesh_ply,
                                   write_gaussian_ply, write_point_normal_ply)


def test_mesh_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3]], np.int64)
    p = str(tmp_path / "mesh.ply")
    write_mesh_ply(p, verts, faces)
    v, f = read_mesh_ply(p)
    np.testing.assert_allclose(v, verts, atol=1e-6)
    np.testing.assert_array_equal(np.sort(f, 1), np.sort(faces, 1))


def test_point_cloud_ply_reads_as_verts_only(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (50, 1))
    p = str(tmp_path / "pcd.ply")
    write_point_normal_ply(p, pts, nrm)
    v, f = read_mesh_ply(p)
    np.testing.assert_allclose(v, pts, atol=1e-6)
    assert f is None


def test_densify_points_lie_on_discs():
    """Every densified point must sit in its gaussian's major plane (zero
    normal offset) within the scaled ellipse (ref densify semantics:
    concentric rings at (level+0.5)/levels of the axes)."""
    import jax.numpy as jnp

    from dqo_map_tpu.models import gaussian_map as gm

    P = 4
    rng = np.random.default_rng(1)
    state = gm.empty_map(16)
    xyz = rng.normal(size=(P, 3)).astype(np.float32)
    new = gm.make_new_points(
        jnp.asarray(xyz),
        jnp.asarray(rng.normal(size=(P, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32),
        jnp.ones(P, bool), jnp.int32(0), jnp.int32(0), 0.99, (1.0, 1.0, 0.1))
    state = gm.add_points(state, new, gm.STABLE)

    pts, nrms = densify_point_cloud(state, sigma=1, circle_num=8, levels=3)
    assert pts.shape == (P * 24, 3) and nrms.shape == pts.shape

    scales = np.asarray(state.get_scaling())[:P]
    centers = xyz
    per = 24
    for i in range(P):
        chunk = pts[i * per:(i + 1) * per] - centers[i]
        n = nrms[i * per]
        # in-plane: no offset along the normal
        assert np.abs(chunk @ n).max() < 1e-4
        # within the major-axis ellipse (radii <= max axis * (levels-0.5)/levels)
        r = np.linalg.norm(chunk, axis=1)
        assert r.max() <= scales[i].max() * (2.5 / 3) + 1e-5
        assert r.min() > 0


def test_metric_obj_per_object_cli(tmp_path):
    """--per-object mode scores each exported obj PLY against its GT."""
    import json
    import os
    import subprocess
    import sys

    run = tmp_path / "run"
    d = run / "save_model" / "frame_0005"
    d.mkdir(parents=True)
    rng = np.random.default_rng(2)
    # object 3: points on a unit sphere surface patch; GT = same points
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    write_gaussian_ply(str(d / "iter_0000_obj3.ply"), pts,
                       np.zeros((200, 3), np.float32),
                       np.zeros((200, 15, 3), np.float32),
                       np.zeros(200, np.float32),
                       np.full((200, 3), -3, np.float32),
                       np.tile(np.array([[1, 0, 0, 0]], np.float32),
                               (200, 1)))
    gt = tmp_path / "gt3.ply"
    write_point_normal_ply(str(gt), pts, pts)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, "-m", "dqo_map_tpu.cli.metric_obj",
         "--per-object", str(run), "--gt-mesh", f"3={gt}"],
        capture_output=True, text=True, timeout=240, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    res = json.loads(out.stdout)
    assert "3" in res
    assert res["3"]["n_points"] == 200
    assert res["3"]["accuracy_cm"] < 0.1
    assert res["3"]["f1"] > 0.99
