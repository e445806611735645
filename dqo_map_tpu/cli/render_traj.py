"""Offline map fly-through: render a saved map along a trajectory.

Headless equivalent of the reference's Open3D GUI viewer (`gui/`,
wired at slam.py:56-72 — a live splat viewer with RGB/depth/instance
widgets): renders the optimized gaussian map from the estimated (or ground
truth) camera poses into numbered PNG frames (color + depth + instance),
which any encoder can turn into a video.

    python -m dqo_map_tpu.cli.render_traj --config <cfg> \
        --model output/.../iter_0000_merge.ply \
        --traj output/.../save_traj/pose_es.npy --out /tmp/flythrough
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--model", required=True, help="gaussian map .ply")
    ap.add_argument("--traj", required=True,
                    help="pose_es.npy / pose_gt.npy (N,4,4) c2w stack")
    ap.add_argument("--out", required=True)
    ap.add_argument("--frame-step", type=int, default=1)
    ap.add_argument("--capacity", type=int, default=1 << 19)
    ap.add_argument("--with-instance", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..config import Config
    from ..data import Dataset
    from ..models.cameras import Camera
    from ..slam.renderer import Renderer, render_instance, render_state
    from ..utils.ply import load_map_ply

    cfg = Config.from_yaml(args.config)
    ds = Dataset(cfg.dataset)
    cam0 = ds.cameras[0]
    state = load_map_ply(args.model, capacity=args.capacity)
    renderer = Renderer(cfg.map, cam0.width, cam0.height)
    poses = np.load(args.traj)
    os.makedirs(args.out, exist_ok=True)

    dmax = float(cfg.map.max_depth)
    for i in range(0, len(poses), args.frame_step):
        cam = Camera(uid=i, c2w=poses[i], fx=cam0.fx, fy=cam0.fy, cx=cam0.cx,
                     cy=cam0.cy, width=cam0.width, height=cam0.height)
        ci = cam.render_inputs()
        out = render_state(state, ci, renderer.settings, "global")
        rgb = np.clip(np.asarray(out["render"]) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(args.out, f"rgb_{i:05d}.png"))
        dep = np.clip(np.asarray(out["depth"]) / dmax * 255, 0,
                      255).astype(np.uint8)
        Image.fromarray(dep).save(os.path.join(args.out, f"depth_{i:05d}.png"))
        if args.with_instance:
            inst = render_instance(state, ci, renderer.settings)
            inst = np.clip(np.asarray(inst) * 255, 0, 255).astype(np.uint8)
            Image.fromarray(inst).save(
                os.path.join(args.out, f"instance_{i:05d}.png"))
        print(f"frame {i}/{len(poses)}", flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
