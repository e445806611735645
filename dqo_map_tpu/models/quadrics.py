"""Dual-quadric object layer.

Equivalent of `SLAM/multiprocess/quadrics.py`: 2D ellipse / 3D ellipsoid
dual-form algebra, detection filtering, bbox-IoU association with occlusion
handling, duplicate removal, and gradient refinement of each ellipsoid on a
projected-bbox IoU loss.

TPU-first redesign of the optimizer: the reference optimizes objects ONE BY
ONE in a Python loop with a fresh torch Adam each (`Object_Optimize_only`,
quadrics.py:2234-2298). Here every matched object is refined simultaneously
by a vmapped, masked Adam scan — one compiled step covers the whole object
map. Association stays host-side numpy: it is tiny and branchy, exactly the
kind of control flow that should NOT be jitted.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

OBS_CAP = 48          # observations kept per object (reference keeps all)
MAX_OBJECTS = 64      # compiled optimizer width
OBJ_ITERS = 20        # refinement iterations (ref quadrics.py:2252)

# no-silent-caps receipts: every time a fixed capacity actually bites, the
# event is counted here and surfaced in the run summary (the repo's rule
# from the binning work; the reference keeps all observations/objects).
TRUNCATION = {"obs_trimmed": 0, "objects_over_cap": 0}


# ---------------------------------------------------------------------------
# numpy dual-form algebra (host side)
# ---------------------------------------------------------------------------

class Ellipse:
    """2D ellipse in dual form C* (ref `Ellipse`, quadrics.py:148-248)."""

    def __init__(self, axes, angle, center):
        axes_half = 0.5 * np.asarray(axes, np.float64)
        C = np.diag([*(axes_half**2), -1.0])
        T = np.eye(3)
        T[:2, 2] = center
        R = np.array([[np.cos(angle), -np.sin(angle), 0],
                      [np.sin(angle), np.cos(angle), 0], [0, 0, 1.0]])
        tf = T @ R
        C = tf @ C @ tf.T
        C = 0.5 * (C + C.T)
        C /= -C[2, 2]
        self.C_ = C
        self.axes_ = axes_half
        self.angle_ = float(angle)
        self.center_ = np.asarray(center, np.float64)

    @classmethod
    def from_dual(cls, C):
        inst = cls.__new__(cls)
        C = 0.5 * (C + C.T)
        C = C / -C[2, 2]
        inst.C_ = C
        inst.center_ = -C[:2, 2]
        T = np.eye(3)
        T[:2, 2] = -inst.center_
        Cc = T @ C @ T.T
        Cc = 0.5 * (Cc + Cc.T)
        evals, evecs = np.linalg.eigh(Cc[:2, :2])
        if np.linalg.det(evecs) < 0:
            evecs[:, 1] *= -1
        if evecs[0, 0] < 0:
            evecs = -evecs
        inst.axes_ = np.sqrt(np.abs(evals))
        inst.angle_ = float(np.arctan2(evecs[1, 0], evecs[0, 0]))
        return inst

    def compute_bbox(self):
        c, s = np.cos(self.angle_), np.sin(self.angle_)
        xmax = np.sqrt(self.axes_[0]**2 * c**2 + self.axes_[1]**2 * s**2)
        ymax = np.sqrt(self.axes_[0]**2 * s**2 + self.axes_[1]**2 * c**2)
        return np.array([self.center_[0] - xmax, self.center_[1] - ymax,
                         self.center_[0] + xmax, self.center_[1] + ymax])

    def as_gaussian(self):
        """(mu, cov) view for the Wasserstein distance (ref quadrics.py:234-248)."""
        A = np.diag(self.axes_**2)
        c, s = np.cos(self.angle_), np.sin(self.angle_)
        R = np.array([[c, -s], [s, c]])
        cov = R @ A @ R.T
        return self.center_, np.clip(cov, 0, None)


class Ellipsoid:
    """3D ellipsoid in dual form Q* (ref `Ellipsoid`, quadrics.py:388-426)."""

    def __init__(self, axes, R, center):
        Q = np.diag([*(np.asarray(axes, np.float64)**2), -1.0])
        T = np.eye(4)
        T[:3, 3] = center
        Rw = np.eye(4)
        Rw[:3, :3] = R
        tf = T @ Rw
        Q = tf @ Q @ tf.T
        self.Q_ = 0.5 * (Q + Q.T)
        self.Q_ /= -self.Q_[3, 3]
        self.axes_ = np.asarray(axes, np.float64)
        self.R_ = np.asarray(R, np.float64)
        self.center_ = np.asarray(center, np.float64)

    def project(self, P) -> Ellipse:
        return Ellipse.from_dual(P @ self.Q_ @ P.T)


def bbox_area(bb):
    return max(bb[2] - bb[0], 0) * max(bb[3] - bb[1], 0)


def bboxes_iou(bb1, bb2):
    iw = max(min(bb1[2], bb2[2]) - max(bb1[0], bb2[0]), 0)
    ih = max(min(bb1[3], bb2[3]) - max(bb1[1], bb2[1]), 0)
    inter = iw * ih
    union = bbox_area(bb1) + bbox_area(bb2) - inter
    return inter / union if union > 0 else 0.0


def bboxes_intersection(bb1, bb2):
    iw = max(min(bb1[2], bb2[2]) - max(bb1[0], bb2[0]), 0)
    ih = max(min(bb1[3], bb2[3]) - max(bb1[1], bb2[1]), 0)
    return iw * ih


def is_cover(bb1, bb2):
    """bb2 covers >50% of bb1 while bb1 covers <50% of bb2
    (ref quadrics.py:296-311)."""
    inter = bboxes_intersection(bb1, bb2)
    a1, a2 = bbox_area(bb1), bbox_area(bb2)
    if a1 == 0:
        return False
    return inter / a1 > 0.5 and (a2 == 0 or inter / a2 < 0.5)


def wasserstein_similarity(ell1: Ellipse, ell2: Ellipse, C: float = 10.0):
    """exp(-W2/C) between ellipse Gaussians (ref `Calculate_distance`,
    quadrics.py:970-988)."""
    mu1, s1 = ell1.as_gaussian()
    mu2, s2 = ell2.as_gaussian()
    from scipy.linalg import sqrtm
    s11 = np.real(sqrtm(s1))
    s121 = np.real(sqrtm(s11 @ s2 @ s11))
    d = np.linalg.norm(mu1 - mu2)**2 + np.trace(s1 + s2 - 2 * s121)
    return np.exp(-np.sqrt(max(d, 0.0)) / C)


# ---------------------------------------------------------------------------
# detection filtering (ref `detections_filter`, quadrics.py:336-386)
# ---------------------------------------------------------------------------

def detections_filter(detections: List[dict], depth_map: np.ndarray,
                      W: int, H: int, rng=None):
    rng = rng or np.random.default_rng(0)
    kept = []
    for d in detections:
        if d.get("ellipse") is None:
            ell_bb = d["bbox"]
        else:
            e = d["ellipse"]
            ell_bb = Ellipse(e[2:4], e[4], e[0:2]).compute_bbox()
        if (d["score"] < 0.2 or bbox_area(d["bbox"]) < 300
                or bbox_area(d["bbox"]) > 0.5 * H * W
                or bboxes_iou(d["bbox"], ell_bb) < 0.2):
            continue
        similar = False
        for k in kept:
            iou = bboxes_iou(d["bbox"], k["bbox"])
            if (d["cat"] == k["cat"] and iou > 0.3) or (
                    d["cat"] != k["cat"] and iou > 0.6):
                similar = True
                break
        if not similar:
            kept.append(dict(d, obj=None, is_validate=True))

    depth_data = np.zeros((len(kept), 2))
    for i, d in enumerate(kept):
        bb = d["bbox"]
        us = rng.integers(int(bb[0]), max(int(bb[2]), int(bb[0]) + 1), 30)
        vs = rng.integers(int(bb[1]), max(int(bb[3]), int(bb[1]) + 1), 30)
        us = np.clip(us, 0, W - 1)
        vs = np.clip(vs, 0, H - 1)
        ds = depth_map[vs, us]
        ds = ds[ds > 0]
        if len(ds):
            depth_data[i, 0] = min(float(ds.mean()), 5.0)
            depth_data[i, 1] = min(max(float(ds.max() - ds.min()), 0.05), 0.2)
    return kept, depth_data


# ---------------------------------------------------------------------------
# Object (ref `Object`, quadrics.py:429-487)
# ---------------------------------------------------------------------------

class MapObject:
    _next_id = 0

    def __init__(self, det, depth_data, K, Rt, frame_idx):
        self.id_ = MapObject._next_id
        MapObject._next_id += 1
        self.category_id_ = det["cat"]
        self.color = det.get("color", [128, 128, 128])
        self.last_obs_frame = frame_idx
        self.last_obs = [-1, -1, -1.0]       # (frame, det index, best iou)
        self.bboxes_: List[np.ndarray] = []
        self.Rts_: List[np.ndarray] = []

        bb = np.asarray(det["bbox"], np.float64)
        avg_depth, diff_depth = depth_data
        bc = np.array([(bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2])
        u = (bc[0] - K[0, 2]) / K[0, 0]
        v = (bc[1] - K[1, 2]) / K[1, 1]
        bc_cam = np.array([u * avg_depth, v * avg_depth, avg_depth])
        Rcw = Rt[:3, :3]
        tcw = Rt[:3, 3]
        center_world = Rcw.T @ bc_cam - Rcw.T @ tcw

        zc = bc_cam / np.linalg.norm(bc_cam)
        up = np.array([0.0, -1.0, 0.0])
        xc = np.cross(-up, zc)
        xc /= np.linalg.norm(xc)
        yc = np.cross(zc, xc)
        rot_cam = np.stack([xc, yc, zc], axis=1)
        rot_world = Rcw.T @ rot_cam

        w_img = bb[2] - bb[0]
        h_img = bb[3] - bb[1]
        axes = np.array([
            w_img * avg_depth / K[0, 0] * 0.5,
            h_img * avg_depth / K[1, 1] * 0.5,
            diff_depth * 0.5,
        ])
        self.ellipsoid_ = Ellipsoid(axes, rot_world, center_world)
        self.add_observation(bb, Rt)

    def add_observation(self, bbox, Rt):
        self.bboxes_.append(np.asarray(bbox, np.float64))
        self.Rts_.append(np.asarray(Rt, np.float64))
        if len(self.bboxes_) > OBS_CAP:
            # keep the first observation + the most recent window
            TRUNCATION["obs_trimmed"] += len(self.bboxes_) - OBS_CAP
            self.bboxes_ = [self.bboxes_[0]] + self.bboxes_[-(OBS_CAP - 1):]
            self.Rts_ = [self.Rts_[0]] + self.Rts_[-(OBS_CAP - 1):]


# ---------------------------------------------------------------------------
# association (ref `Occlusions_Check` + IoU `MatchObject`,
# quadrics.py:926-968, 1013-1217)
# ---------------------------------------------------------------------------

def occlusions_check(objects, K, Rt, W, H):
    P = K @ Rt
    img_bbox = np.array([0, 0, W, H])
    proj = {}
    for i, obj in enumerate(objects):
        pe = obj.ellipsoid_.project(P)
        c3d = obj.ellipsoid_.center_
        bb = pe.compute_bbox()
        z = Rt[2, :] @ np.append(c3d, 1)
        if z < 0 or bboxes_intersection(bb, img_bbox) < 0.3 * bbox_area(bb):
            continue
        proj[i] = pe
        hidden = []
        for j, pj in list(proj.items()):
            if j != i and bboxes_iou(pj.compute_bbox(), bb) > 0.8:
                zj = Rt[2, :] @ np.append(objects[j].ellipsoid_.center_, 1)
                hidden.append(j if z < zj else i)
                break
        for h in hidden:
            proj.pop(h, None)
    return proj


def _det_ellipse(det) -> "Ellipse":
    """Detection's 2D ellipse; bbox-inscribed fallback when absent."""
    e = det.get("ellipse")
    if e is not None:
        return Ellipse(e[2:4], e[4], e[0:2])
    bb = det["bbox"]
    return Ellipse([(bb[2] - bb[0]) / 2, (bb[3] - bb[1]) / 2], 0.0,
                   [(bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2])


def _assoc_score(pe, bb_proj, det, mode: str):
    """Association score + accept flag for one (projected object, detection)
    pair. Variants match the reference's ablation
    (`/root/reference/SLAM/multiprocess/quadrics.py:970-988` QD metric +
    `Only_IOU` flag; outputs in `eval_obj/results_accociation/`):
      iou    — projected-bbox IoU > 0.5 (the shipped default)
      qd     — 2-Wasserstein ellipse similarity exp(-W2/C) > 0.5
      iou_qd — IoU > 0.5, or both moderately confident (IoU > 0.25 and
               QD > 0.5); ranked by the sum."""
    iou = bboxes_iou(bb_proj, det["bbox"])
    if mode == "iou":
        return iou, iou > 0.5
    try:
        w = wasserstein_similarity(pe, _det_ellipse(det))
    except Exception:
        w = 0.0
    if mode == "qd":
        return w, w > 0.5
    return iou + w, (iou > 0.5) or (iou > 0.25 and w > 0.5)


def match_objects(objects, detections, depth_data, proj, frame_id, K, Rt,
                  mode: str = "iou"):
    """Association with cover-based replacement (ref quadrics.py:1013-1217);
    `mode` selects the iou / qd / iou_qd matching variant.
    Returns has_new_object."""
    has_new = False
    for cur_order, det in enumerate(detections):
        best_score = 0.0
        matched = None
        node_id = -1
        bb_det = det["bbox"]
        replaced = False
        for i, pe in proj.items():
            obj = objects[i]
            bb_proj = pe.compute_bbox()
            iou = bboxes_iou(bb_proj, bb_det)
            if obj.category_id_ == det["cat"] and iou < 0.5:
                if is_cover(bb_proj, bb_det):
                    # the new detection covers the stored object: rebuild
                    objects[i] = MapObject(det, depth_data[cur_order], K, Rt,
                                           frame_id)
                    det["obj"] = objects[i]
                    replaced = True
                    break
                elif is_cover(bb_det, bb_proj):
                    det["is_validate"] = False
                    matched = None
                    break
            score, accept = _assoc_score(pe, bb_proj, det, mode)
            if accept and score > best_score:
                best_score = score
                matched = obj
                node_id = i
        if replaced:
            continue
        if matched is not None:
            if matched.last_obs[0] == frame_id:
                if best_score < matched.last_obs[2]:
                    continue
                prev_det = matched.last_obs[1]
                if 0 <= prev_det < len(detections):
                    detections[prev_det]["obj"] = None
            det["obj"] = matched
            det["node_id"] = node_id
            matched.last_obs = [frame_id, cur_order, best_score]
            pe = matched.ellipsoid_.project(K @ Rt)
            bbp = pe.compute_bbox()
            if bboxes_iou(bbp, bb_det) >= 0.01 or det["is_validate"]:
                if pe.axes_[0] > 1e-3 and pe.axes_[1] > 1e-3:
                    matched.add_observation(det["bbox"], Rt)

    for i, det in enumerate(detections):
        if det.get("obj") is None and det.get("is_validate", True):
            if 0.01 < depth_data[i][0] < 15.0:
                obj = MapObject(det, depth_data[i], K, Rt, frame_id)
                objects.append(obj)
                det["obj"] = obj
                det["node_id"] = len(objects) - 1
                has_new = True
    return has_new


def remove_outliers(objects, K, Rt):
    """Merge same-category objects whose projections nearly coincide
    (ref `remove_outlier`, quadrics.py:2397-2425)."""
    P = K @ Rt
    for i in range(len(objects) - 1, -1, -1):
        o1 = objects[i]
        for j in range(len(objects) - 1, i, -1):
            o2 = objects[j]
            if o1.category_id_ == o2.category_id_:
                try:
                    w = wasserstein_similarity(
                        o1.ellipsoid_.project(P), o2.ellipsoid_.project(P))
                except Exception:
                    continue
                if w < 0.1:
                    objects.pop(j)
    return objects


# ---------------------------------------------------------------------------
# batched JAX refinement (replaces `Object_Optimize_only`)
# ---------------------------------------------------------------------------

def _project_bbox(axes, R, center, P):
    """Differentiable ellipsoid -> projected bbox
    (ref `Ellipsoid_tensor.forward` + `Ellipse_tensor.ComputeBbox`,
    quadrics.py:2018-2225). Closed-form symmetric 2x2 eigensolve."""
    Q = jnp.diag(jnp.concatenate([axes**2, jnp.asarray([-1.0])]))
    T = jnp.eye(4).at[:3, 3].set(center)
    Rw = jnp.eye(4).at[:3, :3].set(R)
    tf = T @ Rw
    Qw = tf @ Q @ tf.T
    Qw = 0.5 * (Qw + Qw.T)
    Qw = Qw / -Qw[3, 3]
    C = P @ Qw @ P.T
    C = 0.5 * (C + C.T)
    C = C / -C[2, 2]
    cx = -C[0, 2]
    cy = -C[1, 2]
    # recentered conic: with C22 = -1 and C[0:2,2] = -center, translating by
    # -center gives Cc = [[C00 + cx^2, C01 + cx cy], [., C11 + cy^2]]
    a = C[0, 0] + cx * cx
    b = C[0, 1] + cx * cy
    c = C[1, 1] + cy * cy
    mid = 0.5 * (a + c)
    rad = jnp.sqrt(jnp.maximum(0.25 * (a - c)**2 + b * b, 1e-12))
    l1 = jnp.abs(mid + rad)
    l2 = jnp.abs(mid - rad)
    theta = 0.5 * jnp.arctan2(2 * b, a - c)
    ax1 = jnp.sqrt(jnp.maximum(l1, 1e-12))
    ax2 = jnp.sqrt(jnp.maximum(l2, 1e-12))
    ct, st = jnp.cos(theta), jnp.sin(theta)
    xmax = jnp.sqrt(ax1**2 * ct**2 + ax2**2 * st**2)
    ymax = jnp.sqrt(ax1**2 * st**2 + ax2**2 * ct**2)
    return jnp.stack([cx - xmax, cy - ymax, cx + xmax, cy + ymax])


def _bbox_iou_j(bb1, bb2):
    iw = jnp.maximum(jnp.minimum(bb1[2], bb2[2]) - jnp.maximum(bb1[0], bb2[0]), 0.0)
    ih = jnp.maximum(jnp.minimum(bb1[3], bb2[3]) - jnp.maximum(bb1[1], bb2[1]), 0.0)
    inter = iw * ih
    a1 = (bb1[2] - bb1[0]) * (bb1[3] - bb1[1])
    a2 = (bb2[2] - bb2[0]) * (bb2[3] - bb2[1])
    return inter / jnp.maximum(a1 + a2 - inter, 1e-8)


@partial(jax.jit, static_argnames=("iters",))
def refine_objects(axes, R, center, obs_bbox, obs_P, obs_valid, opt_mask,
                   rand_idx, iters: int = OBJ_ITERS,
                   lr_axes: float = 0.01, lr_center: float = 0.001,
                   lr_R: float = 0.01):
    """Vmapped masked Adam over all objects at once.

    axes (O,3), R (O,3,3), center (O,3); obs_bbox (O,CAP,4), obs_P (O,CAP,3,4)
    [P = K @ Rt per observation], obs_valid (O,CAP), opt_mask (O,),
    rand_idx (iters,O) observation schedule. Returns refined (axes,R,center).
    """
    params = {"axes": axes, "R": R, "center": center}
    lrs = {"axes": lr_axes, "R": lr_R, "center": lr_center}
    m0 = {k: jnp.zeros_like(v) for k, v in params.items()}
    v0 = {k: jnp.zeros_like(v) for k, v in params.items()}

    def obj_loss(axes_o, R_o, center_o, bbox_o, P_o, valid_o):
        pred = _project_bbox(axes_o, R_o, center_o, P_o)
        iou = _bbox_iou_j(bbox_o, pred)
        loss = 1.0 - iou
        # ref guards loss==1 (no overlap) by skipping the step
        return jnp.where(valid_o & (iou > 1e-6), loss, 0.0)

    def step(carry, it):
        p, m, v = carry
        oidx = rand_idx[it]                      # (O,)
        bb = jnp.take_along_axis(obs_bbox, oidx[:, None, None], axis=1)[:, 0]
        P = jnp.take_along_axis(obs_P, oidx[:, None, None, None], axis=1)[:, 0]
        ov = jnp.take_along_axis(obs_valid, oidx[:, None], axis=1)[:, 0]

        def total(pp):
            losses = jax.vmap(obj_loss)(pp["axes"], pp["R"], pp["center"],
                                        bb, P, ov)
            return jnp.sum(jnp.where(opt_mask, losses, 0.0))

        g = jax.grad(total)(p)
        t = it + 1
        bc1 = 1 - 0.9 ** t.astype(jnp.float32)
        bc2 = 1 - 0.999 ** t.astype(jnp.float32)
        newp, newm, newv = {}, {}, {}
        for k in p:
            mk = opt_mask
            while mk.ndim < g[k].ndim:
                mk = mk[..., None]
            gk = jnp.where(mk, g[k], 0.0)
            newm[k] = 0.9 * m[k] + 0.1 * gk
            newv[k] = 0.999 * v[k] + 0.001 * gk * gk
            upd = lrs[k] * (newm[k] / bc1) / (jnp.sqrt(newv[k] / bc2) + 1e-15)
            newp[k] = p[k] - jnp.where(mk, upd, 0.0)
        return (newp, newm, newv), None

    (params, _, _), _ = jax.lax.scan(step, (params, m0, v0), jnp.arange(iters))
    return params["axes"], params["R"], params["center"]


# ---------------------------------------------------------------------------
# MODE=0: render-based object refinement (ref mapper.py:164-165,223-226 —
# `from_Quadrics_to_Mode` + `object_optimize` + `Update_Map`)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("settings", "iters"))
def refine_objects_render(log_axes, quat, center, colors, opt_mask, cam,
                          gt_obj_img, settings, iters: int = OBJ_ITERS,
                          object_weight: float = 0.1,
                          lr_center: float = 0.002, lr_axes: float = 0.01,
                          lr_quat: float = 0.01):
    """The reference's MODE=0 alternate object path, as one compiled scan.

    Each ellipsoid becomes ONE Gaussian (center -> xyz, axes -> scales,
    R -> quat, its palette color as colors_precomp — ref
    `gaussian_pointcloud.from_Quadrics_to_Mode`, gaussian_pointcloud.py:
    380-413) rendered through the SAME rasterizer as the map
    (ref `Renderer.render_obj`, SLAM/render.py:61-133), with an L1 loss
    against the per-pixel object-color image (ref `get_gt_obj`,
    quadrics.py:1889-1960, painted here from the matched-detection id map)
    and a masked Adam over center/axes/rotation (ref `object_optimize`,
    mapper.py:266-316 + `loss_update_obj`:776-795).

    log_axes/center (O,3), quat (O,4) wxyz, colors (O,3), opt_mask (O,),
    gt_obj_img (H,W,3). Returns refined (log_axes, quat, center).
    """
    from ..ops.rasterize import rasterize
    from ..utils.math3d import normalize

    params = {"center": center, "log_axes": log_axes, "quat": quat}
    lrs = {"center": lr_center, "log_axes": lr_axes, "quat": lr_quat}
    m0 = {k: jnp.zeros_like(v) for k, v in params.items()}
    v0 = {k: jnp.zeros_like(v) for k, v in params.items()}
    opac = jnp.where(opt_mask, 0.99, 0.0)

    def loss_fn(p):
        out = rasterize(
            p["center"], jnp.exp(p["log_axes"]), normalize(p["quat"]),
            opac, colors, cam, settings, valid_mask=opt_mask,
            with_normal=False, with_n_touched=False)
        return object_weight * jnp.abs(out["render"] - gt_obj_img).mean()

    def step(carry, it):
        p, m, v = carry
        g = jax.grad(loss_fn)(p)
        t = (it + 1).astype(jnp.float32)
        bc1 = 1 - 0.9 ** t
        bc2 = 1 - 0.999 ** t
        newp, newm, newv = {}, {}, {}
        for k in p:
            mk = opt_mask
            while mk.ndim < g[k].ndim:
                mk = mk[..., None]
            gk = jnp.where(mk, g[k], 0.0)
            newm[k] = 0.9 * m[k] + 0.1 * gk
            newv[k] = 0.999 * v[k] + 0.001 * gk * gk
            upd = lrs[k] * (newm[k] / bc1) / (jnp.sqrt(newv[k] / bc2) + 1e-15)
            newp[k] = p[k] - jnp.where(mk, upd, 0.0)
        return (newp, newm, newv), None

    (params, _, _), _ = jax.lax.scan(step, (params, m0, v0),
                                     jnp.arange(iters))
    return params["log_axes"], normalize(params["quat"]), params["center"]


# ---------------------------------------------------------------------------
# ObjectLayer orchestrator (the `Map_global` lifecycle, mapper.py:145-245)
# ---------------------------------------------------------------------------

class ObjectLayer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.objects: List[MapObject] = []
        self.current_dets: List[dict] = []
        self.rng = np.random.default_rng(2024)
        self.iou_log: dict = {}
        # association variant for the reference's ablation suite
        # (`eval_obj/results_accociation/`): iou | qd | iou_qd
        self.association = (cfg.get("association", "iou")
                            if hasattr(cfg, "get") else "iou")
        # multi-chip: when SLAMSystem installs a mesh, the batched quadric
        # refinement shards over the object axis (parallel.dp)
        self.mesh = None

    def process_frame(self, frame, frame_map, frame_id: int):
        if hasattr(frame, "sync_pose"):
            frame.sync_pose()      # host-side projection math needs numpy
        dets = frame.detections
        if not dets:
            self.current_dets = []
            return
        K = frame.K.astype(np.float64)
        Rt = frame.Rt.astype(np.float64)
        W, H = frame.width, frame.height
        # host-side depth stats come from the camera's own (host) depth map —
        # reading the device `frame_map` back costs a full-image D2H transfer
        # per frame when the TPU sits behind a tunnel
        depth = np.asarray(frame.depth)
        mn = float(self.cfg.map.min_depth)
        mx = float(self.cfg.map.max_depth)
        depth = np.where((depth > mn) & (depth < mx), depth, 0.0)
        kept, depth_data = detections_filter(dets, depth, W, H, self.rng)
        if not self.objects:
            for i, det in enumerate(kept):
                if 0.0 < depth_data[i][0] < 15.0:
                    obj = MapObject(det, depth_data[i], K, Rt, frame_id)
                    self.objects.append(obj)
                    det["obj"] = obj
                    det["node_id"] = len(self.objects) - 1
        else:
            proj = occlusions_check(self.objects, K, Rt, W, H)
            match_objects(self.objects, kept, depth_data, proj, frame_id, K,
                          Rt, mode=self.association)
            remove_outliers(self.objects, K, Rt)
        self.current_dets = kept
        self._K = K

    def optimize_objects(self, frame, frame_id: int):
        """Batched refinement of all objects matched this frame
        (reference: per-object loop at keyframes, mapper.py:204-205)."""
        active = []
        for det in self.current_dets:
            obj = det.get("obj")
            if obj is None or not det.get("is_validate", True):
                continue
            if len(obj.bboxes_) < 2:
                continue
            try:
                idx = self.objects.index(obj)
            except ValueError:
                continue
            active.append(idx)
        if not active:
            return
        if len(active) > MAX_OBJECTS:
            TRUNCATION["objects_over_cap"] += len(active) - MAX_OBJECTS
        active = active[:MAX_OBJECTS]
        O = MAX_OBJECTS
        K = self._K

        axes = np.zeros((O, 3), np.float32)
        R = np.tile(np.eye(3, dtype=np.float32), (O, 1, 1))
        center = np.zeros((O, 3), np.float32)
        obs_bbox = np.zeros((O, OBS_CAP, 4), np.float32)
        obs_P = np.zeros((O, OBS_CAP, 3, 4), np.float32)
        obs_valid = np.zeros((O, OBS_CAP), bool)
        opt_mask = np.zeros((O,), bool)
        n_obs = np.ones((O,), np.int64)
        for slot, i in enumerate(active):
            obj = self.objects[i]
            axes[slot] = obj.ellipsoid_.axes_
            R[slot] = obj.ellipsoid_.R_
            center[slot] = obj.ellipsoid_.center_
            n = min(len(obj.bboxes_), OBS_CAP)
            obs_bbox[slot, :n] = np.stack(obj.bboxes_[-n:])
            obs_P[slot, :n] = np.stack([K @ rt for rt in obj.Rts_[-n:]])
            obs_valid[slot, :n] = True
            opt_mask[slot] = True
            n_obs[slot] = n

        # observation schedule: random obs per iter, latest after 1/4 of the
        # iterations (ref quadrics.py:2253-2257)
        rand_idx = self.rng.integers(0, n_obs[None, :], (OBJ_ITERS, O))
        for it in range(OBJ_ITERS // 4 + 1, OBJ_ITERS):
            rand_idx[it] = n_obs - 1
        if self.mesh is not None and MAX_OBJECTS % self.mesh.devices.size == 0:
            from ..parallel.dp import shard_objects_refine
            new_axes, new_R, new_center = shard_objects_refine(
                self.mesh, jnp.asarray(axes), jnp.asarray(R),
                jnp.asarray(center), jnp.asarray(obs_bbox),
                jnp.asarray(obs_P), jnp.asarray(obs_valid),
                jnp.asarray(opt_mask), jnp.asarray(rand_idx, jnp.int32),
                iters=OBJ_ITERS)
        else:
            new_axes, new_R, new_center = refine_objects(
                jnp.asarray(axes), jnp.asarray(R), jnp.asarray(center),
                jnp.asarray(obs_bbox), jnp.asarray(obs_P),
                jnp.asarray(obs_valid), jnp.asarray(opt_mask),
                jnp.asarray(rand_idx, jnp.int32))
        new_axes = np.asarray(new_axes)
        new_R = np.asarray(new_R)
        new_center = np.asarray(new_center)
        for slot, i in enumerate(active):
            self.objects[i].ellipsoid_ = Ellipsoid(
                np.abs(new_axes[slot]), new_R[slot], new_center[slot])

    def optimize_objects_render(self, frame, settings) -> int:
        """MODE=0 frame-end pass (ref mapper.py:223-226): every live object
        is rendered as one Gaussian and refined against the object-color
        image, then the quadric map is updated in place (ref `Update_Map`,
        quadrics.py:822-840). Returns the number of objects refined."""
        from ..utils.math3d import quat_to_rotmat, rotmat_to_quat

        objs = self.objects[:MAX_OBJECTS]
        if not objs:
            return 0
        O = MAX_OBJECTS
        log_axes = np.zeros((O, 3), np.float32)
        quat = np.tile(np.array([1, 0, 0, 0], np.float32), (O, 1))
        center = np.zeros((O, 3), np.float32)
        colors = np.zeros((O, 3), np.float32)
        opt_mask = np.zeros((O,), bool)
        for i, obj in enumerate(objs):
            e = obj.ellipsoid_
            log_axes[i] = np.log(np.maximum(np.abs(e.axes_), 1e-4))
            quat[i] = np.asarray(rotmat_to_quat(jnp.asarray(
                e.R_, jnp.float32)))
            center[i] = e.center_
            colors[i] = np.asarray(obj.color, np.float32) / 255.0
            opt_mask[i] = True

        # GT object image (ref get_gt_obj): matched-detection id map painted
        # with each object's color; background black
        oid = self.obj_id_image(frame.width, frame.height)
        gt = np.where(oid[..., None] >= 0,
                      colors[np.clip(oid, 0, O - 1)], 0.0).astype(np.float32)

        cam = frame.render_inputs()
        new_la, new_q, new_c = refine_objects_render(
            jnp.asarray(log_axes), jnp.asarray(quat), jnp.asarray(center),
            jnp.asarray(colors), jnp.asarray(opt_mask), cam,
            jnp.asarray(gt), settings,
            object_weight=float(getattr(self.cfg.opt, "object_weight", 0.1)))
        new_la = np.asarray(new_la)
        new_c = np.asarray(new_c)
        n = 0
        for i, obj in enumerate(objs):
            R = np.asarray(quat_to_rotmat(new_q[i]), np.float64)
            obj.ellipsoid_ = Ellipsoid(
                np.exp(new_la[i]).astype(np.float64), R,
                new_c[i].astype(np.float64))
            n += 1
        return n

    def obj_id_image(self, width: int, height: int) -> np.ndarray:
        """(H,W) int32 object-index image from this frame's matched
        detections (-1 = background). Larger boxes are painted first so
        smaller (foreground) detections win overlaps. This is what binds new
        gaussians to objects (ref: the reference labels gaussians inside
        detection boxes with the object id, gaussian_pointcloud.py obj_id +
        mapper object masks)."""
        img = np.full((height, width), -1, np.int32)
        dets = [d for d in self.current_dets if d.get("obj") is not None]
        dets.sort(key=lambda d: -bbox_area(d["bbox"]))
        for det in dets:
            try:
                idx = self.objects.index(det["obj"])
            except ValueError:
                continue
            x0, y0, x1, y1 = det["bbox"]
            x0 = max(0, int(x0)); y0 = max(0, int(y0))
            x1 = min(width, int(np.ceil(x1))); y1 = min(height, int(np.ceil(y1)))
            if x1 > x0 and y1 > y0:
                img[y0:y1, x0:x1] = idx
        return img

    def categories_table(self) -> np.ndarray:
        """(MAX_OBJECTS,) int32 category per object slot (-1 = empty)."""
        t = np.full((MAX_OBJECTS,), -1, np.int32)
        for i, obj in enumerate(self.objects[:MAX_OBJECTS]):
            t[i] = int(obj.category_id_)
        return t

    # -- outputs ------------------------------------------------------------
    def record_iou(self, K: np.ndarray) -> dict:
        """Mean projected-bbox IoU per object over its stored observations
        (ref `record_iou`, mapper.py:1503-1534)."""
        out = {}
        for obj in self.objects:
            ious = []
            for bb, Rt in zip(obj.bboxes_, obj.Rts_):
                pe = obj.ellipsoid_.project(K @ Rt)
                iou = bboxes_iou(bb, pe.compute_bbox())
                if iou > 0:
                    ious.append(iou)
            out[obj.id_] = float(np.mean(ious)) if ious else 0.0
        self.iou_log = out
        return out

    def save(self, path: str):
        """Object txt in the reference format `cat cx cy cz qx qy qz qw
        a1 a2 a3` (ref `save_obj`, mapper.py:1536-1567)."""
        os.makedirs(path, exist_ok=True)
        from scipy.spatial.transform import Rotation as Rot
        with open(os.path.join(path, "objects.txt"), "w") as f:
            for obj in self.objects:
                c = obj.ellipsoid_.center_
                q = Rot.from_matrix(obj.ellipsoid_.R_).as_quat()  # xyzw
                a = obj.ellipsoid_.axes_
                f.write(f"{obj.category_id_} {c[0]} {c[1]} {c[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]} "
                        f"{a[0]} {a[1]} {a[2]}\n")
