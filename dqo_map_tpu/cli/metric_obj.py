"""Object-map evaluation (equivalent of `metric_obj.py` + `eval_obj/`).

    python -m dqo_map_tpu.cli.metric_obj --pred <run>/save_obj/objects.txt \
        --gt <gt_boxes.txt>

Both files use `cat tx ty tz qx qy qz qw a1 a2 a3` rows (the reference's
box-file format, eval_obj/compute3Dbbox/room_gt.txt). Reports oriented
3D-box IoU, accuracy at thresholds, and center errors.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", help="predicted objects.txt (box mode)")
    ap.add_argument("--gt", help="GT box file (box mode)")
    ap.add_argument("--per-object", metavar="RUN_DIR",
                    help="per-object MESH eval: a finished run directory "
                         "(save_model/frame_*/iter_*_obj<K>.ply exports)")
    ap.add_argument("--gt-mesh", action="append", default=[],
                    metavar="ID=path.ply",
                    help="GT mesh (or point cloud) per object id; repeatable")
    ap.add_argument("--dist-thresh", type=float, default=0.01,
                    help="accuracy threshold in meters (ref: 1 cm)")
    args = ap.parse_args()

    if args.per_object:
        print(json.dumps(per_object_main(args), indent=2))
        return

    from ..eval.obj_eval import (compute_ap_curve, evaluate_boxes,
                                 load_box_file, object_center_errors)

    pred = load_box_file(args.pred)
    gt = load_box_file(args.gt)
    out = evaluate_boxes(pred, gt)
    out.update(object_center_errors(pred, gt))
    out["ap_curve"] = compute_ap_curve(pred, gt)
    print(json.dumps(out, indent=2))


def per_object_main(args):
    """Per-object reconstruction metrics from the saved per-object PLYs
    (ref `/root/reference/metric_obj.py:171-250`: each object's point cloud
    vs its GT mesh at dist_threshs=[0.01])."""
    import glob
    import os

    import numpy as np

    from ..eval.evaluate import eval_pcd
    from ..eval.obj_eval import load_gt_mesh_points
    from ..utils.ply import read_gaussian_ply

    gt_map = {}
    for spec in args.gt_mesh:
        oid, path = spec.split("=", 1)
        gt_map[int(oid)] = load_gt_mesh_points(path)

    plys = sorted(glob.glob(os.path.join(
        args.per_object, "save_model", "*", "*_obj*.ply")))
    results = {}
    for p in plys:
        oid = int(p.rsplit("_obj", 1)[1].split(".")[0])
        if gt_map and oid not in gt_map:
            continue
        d = read_gaussian_ply(p)
        entry = {"ply": p, "n_points": int(d["xyz"].shape[0])}
        if oid in gt_map:
            entry.update(eval_pcd(d["xyz"], np.asarray(gt_map[oid]),
                                  threshold=args.dist_thresh))
        results[oid] = entry
    return results


if __name__ == "__main__":
    main()
