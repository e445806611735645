"""Surface reconstruction from a finished SLAM run (equivalent of
`/root/reference/make_mesh.py`, which uses open3d Poisson meshing —
unavailable here).

    python -m dqo_map_tpu.cli.make_mesh --config <cfg> --model <run_dir> \
        [--voxel 0.02] [--frame-step 10] [--gt-mesh pts.npy]

Re-renders depth from the saved Gaussian map along the estimated trajectory,
fuses a TSDF volume on-device, extracts a TRIANGLE MESH via marching
tetrahedra (`ops/marching.py`) plus a surface point cloud, and — when GT
surface points are given — reports P/R/F1 on mesh samples like the
reference's `eval_pcd` (`SLAM/eval.py:228-282`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--frame-step", type=int, default=10)
    ap.add_argument("--capacity", type=int, default=1 << 20)
    ap.add_argument("--gt-mesh", default=None,
                    help=".npy of GT surface points for P/R/F1")
    args = ap.parse_args()

    from ..config import Config
    from ..data import Dataset
    from ..ops.marching import (marching_tetrahedra, sample_mesh_points,
                                write_mesh_ply)
    from ..ops.tsdf import extract_surface_points, fuse_frames
    from ..slam.renderer import Renderer, render_state
    from ..utils.ply import load_map_ply
    from .metric import find_model

    cfg = Config.from_yaml(args.config)
    dataset = Dataset(cfg.dataset)
    state = load_map_ply(find_model(args.model), args.capacity)
    pose_file = os.path.join(args.model, "save_traj", "pose_es.npy")
    poses = np.load(pose_file) if os.path.exists(pose_file) else None

    cam0 = dataset[0]
    renderer = Renderer(cfg.map, cam0.width, cam0.height)
    cams, depths, colors = [], [], []
    for i in range(0, len(dataset), args.frame_step):
        frame = dataset[i]
        if poses is not None and i < len(poses):
            frame.update_pose(poses[i])
        out = render_state(state, frame.render_inputs(), renderer.settings)
        cams.append(frame)
        depths.append(np.asarray(out["depth"]))
        colors.append(np.asarray(out["render"]))
        print(f"rendered frame {i}")

    vol = fuse_frames(cams, depths, colors, voxel_size=args.voxel,
                      max_depth=cfg.map.max_depth)

    # triangle mesh (marching tetrahedra)
    verts, faces, vcols = marching_tetrahedra(
        np.asarray(vol.tsdf), np.asarray(vol.weight),
        np.asarray(vol.origin), vol.voxel, np.asarray(vol.color))
    mesh_path = os.path.join(args.model, "save_model", "mesh.ply")
    write_mesh_ply(mesh_path, verts, faces, vcols)
    print(f"wrote {mesh_path}: {len(verts)} vertices, {len(faces)} faces")

    # surface point cloud (kept for SIBR-style consumers)
    pts, cols, valid = extract_surface_points(vol)
    pts = np.asarray(pts)[np.asarray(valid)]
    cols = np.asarray(cols)[np.asarray(valid)]
    out_path = os.path.join(args.model, "save_model", "tsdf_surface.ply")
    _write_color_ply(out_path, pts, cols)
    print(f"wrote {out_path} with {len(pts)} surface points")

    if args.gt_mesh and len(faces):
        from ..eval.evaluate import eval_pcd
        gt = np.load(args.gt_mesh)
        samples = sample_mesh_points(verts, faces, 200_000)
        m = eval_pcd(samples, gt)
        print("mesh eval:", {k: round(v, 4) for k, v in m.items()})


def _write_color_ply(path, pts, cols):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        f.write(hdr.encode())
        rec = np.zeros(len(pts), dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
        rec["xyz"] = pts
        rec["rgb"] = np.clip(cols * 255, 0, 255).astype(np.uint8)
        f.write(rec.tobytes())


if __name__ == "__main__":
    main()
