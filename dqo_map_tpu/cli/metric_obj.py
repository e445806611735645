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
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    args = ap.parse_args()

    from ..eval.obj_eval import (evaluate_boxes, load_box_file,
                                 object_center_errors)

    pred = load_box_file(args.pred)
    gt = load_box_file(args.gt)
    out = evaluate_boxes(pred, gt)
    out.update(object_center_errors(pred, gt))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
