"""Oriented 3D bounding-box IoU / AP metrics for object maps.

Equivalent of the reference's Objectron-style `eval_obj/` suite (pyc-only:
`box`, `iou`, `metrics`; format documented by
`eval_obj/compute3Dbbox/room_gt.txt`): boxes as
`cat tx ty tz qx qy qz qw a1 a2 a3`, IoU by convex-hull intersection of the
oriented boxes, plus per-category accuracy/AP summaries.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from scipy.spatial import ConvexHull
from scipy.spatial.transform import Rotation


class Box3D:
    def __init__(self, category: int, translation, quat_xyzw, axes):
        self.category = int(category)
        self.t = np.asarray(translation, np.float64)
        self.R = Rotation.from_quat(quat_xyzw).as_matrix()
        self.axes = np.asarray(axes, np.float64)   # half-extents

    @property
    def vertices(self) -> np.ndarray:
        corners = np.array([
            [sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
        ], np.float64) * self.axes
        return corners @ self.R.T + self.t

    @property
    def volume(self) -> float:
        return float(np.prod(2 * self.axes))


def _hull_volume(points: np.ndarray) -> float:
    try:
        return float(ConvexHull(points).volume)
    except Exception:
        return 0.0


def box_iou(a: Box3D, b: Box3D, samples: int = 0) -> float:
    """Oriented-box IoU via half-space clipping (exact for convex boxes)."""
    # Sample-free: clip b's vertices + edge intersections against a's slabs
    # using the Sutherland-Hodgman style polytope clip in a's frame.
    pts = b.vertices
    # transform into a's frame
    local = (pts - a.t) @ a.R
    poly = _clip_box(local, a.axes)
    if poly is None or len(poly) < 4:
        return 0.0
    inter = _hull_volume(poly)
    union = a.volume + b.volume - inter
    return inter / union if union > 0 else 0.0


def _clip_box(points: np.ndarray, half: np.ndarray):
    """Clip the convex hull of `points` against the axis-aligned slab box
    [-half, half], returning intersection vertices."""
    try:
        hull = ConvexHull(points)
    except Exception:
        return None
    # collect hull facet planes (outward normals)
    planes = []
    for eq in hull.equations:           # n.x + d <= 0 inside
        planes.append((eq[:3], eq[3]))
    for axis in range(3):
        for sign in (-1.0, 1.0):
            n = np.zeros(3)
            n[axis] = sign
            planes.append((n, -half[axis]))
    # vertex enumeration: intersect all triples of planes, keep feasible
    verts = []
    P = len(planes)
    for i in range(P):
        for j in range(i + 1, P):
            for k in range(j + 1, P):
                A = np.stack([planes[i][0], planes[j][0], planes[k][0]])
                bvec = -np.array([planes[i][1], planes[j][1], planes[k][1]])
                if abs(np.linalg.det(A)) < 1e-10:
                    continue
                x = np.linalg.solve(A, bvec)
                ok = all(np.dot(n, x) + d <= 1e-7 for n, d in planes)
                if ok:
                    verts.append(x)
    if not verts:
        return None
    return np.unique(np.round(np.asarray(verts), 9), axis=0)


def load_box_file(path: str) -> List[Box3D]:
    """Parse `cat tx ty tz qx qy qz qw a1 a2 a3` rows
    (ref eval_obj/compute3Dbbox/room_gt.txt)."""
    boxes = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            v = list(map(float, line.split()))
            boxes.append(Box3D(v[0], v[1:4], v[4:8], v[8:11]))
    return boxes


def evaluate_boxes(pred: List[Box3D], gt: List[Box3D],
                   iou_thresholds=(0.25, 0.5)) -> dict:
    """Greedy category-matched IoU + accuracy at thresholds
    (ref eval_obj metrics: Accuracy / compute_ap_curve)."""
    matches = []
    used = set()
    for p in pred:
        best = (0.0, None)
        for gi, g in enumerate(gt):
            if gi in used or g.category != p.category:
                continue
            iou = box_iou(p, g)
            if iou > best[0]:
                best = (iou, gi)
        if best[1] is not None:
            used.add(best[1])
        matches.append(best[0])
    matches = np.asarray(matches) if matches else np.zeros(0)
    out = {
        "mean_iou": float(matches.mean()) if len(matches) else 0.0,
        "n_pred": len(pred), "n_gt": len(gt),
    }
    for thr in iou_thresholds:
        tp = float((matches >= thr).sum())
        out[f"accuracy@{thr}"] = tp / max(len(gt), 1)
        out[f"precision@{thr}"] = tp / max(len(pred), 1)
    return out


def object_center_errors(pred: List[Box3D], gt: List[Box3D]) -> dict:
    errs = []
    for p in pred:
        ds = [np.linalg.norm(p.t - g.t) for g in gt if g.category == p.category]
        if ds:
            errs.append(min(ds))
    return {
        "mean_center_err_cm": float(np.mean(errs) * 100) if errs else np.nan,
        "n_matched": len(errs),
    }
