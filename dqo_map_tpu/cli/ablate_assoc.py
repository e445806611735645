"""Object-association ablation: run the object layer with each association
variant (iou / qd / iou_qd) over a sequence and print the resulting object
tables, mirroring the reference's
`eval_obj/results_accociation/room0/{only_IOU,only_QD,iou_QD}.txt` outputs.

    python -m dqo_map_tpu.cli.ablate_assoc --config <cfg> [--out DIR]
    python -m dqo_map_tpu.cli.ablate_assoc --synthetic 40 [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def run_variant(cams, cfg, mode: str):
    import jax.numpy as jnp

    from ..models.quadrics import ObjectLayer
    from ..slam.tracker import Tracker

    cfg.raw["association"] = mode
    layer = ObjectLayer(cfg)
    tracker = Tracker(cfg.tracking, cams[0].width, cams[0].height)
    for frame_id, frame in enumerate(cams):
        fm = tracker.map_preprocess(frame, frame_id)
        frame.update_pose(frame.pose_gt)   # gt poses isolate association
        if frame.detections:
            layer.process_frame(frame, fm, frame_id)
            if frame_id % 5 == 0:
                layer.optimize_objects(frame, frame_id)
    return layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run on N synthetic frames instead of a dataset")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ..config import Config, default_config

    if args.synthetic:
        from ..data.synthetic import synthetic_sequence
        cfg = default_config(type="Synthetic", use_object=True,
                             min_depth=0.1, max_depth=8.0)
        _, cams = synthetic_sequence(args.synthetic, with_detections=True)
    else:
        from ..data import Dataset
        cfg = Config.from_yaml(args.config)
        cams = Dataset(cfg.dataset).cameras

    rows = []
    for mode in ("iou", "qd", "iou_qd"):
        layer = run_variant(cams, cfg, mode)
        n_obs = sum(len(o.bboxes_) for o in layer.objects)
        rows.append((mode, len(layer.objects), n_obs))
        if args.out:
            d = os.path.join(args.out, f"only_{mode}" if mode != "iou_qd"
                             else "iou_qd")
            layer.save(d)
    print(f"{'mode':8s} {'objects':>8s} {'observations':>13s}")
    for mode, n, obs in rows:
        print(f"{mode:8s} {n:8d} {obs:13d}")


if __name__ == "__main__":
    main()
