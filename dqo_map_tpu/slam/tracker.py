"""Frontend tracker: frame preprocessing + pose estimation.

Equivalent of `SLAM/multiprocess/tracker.py` (Tracker). Preprocessing
(vertex/normal/confidence maps, range + confidence masking, pyramids) and the
ICP pyramid run as one jitted function per image shape; the pose composition
and trajectory bookkeeping stay on the host.

The optional feature-based pose backend (`use_orb_backend`, a C++ ORB-SLAM2
binding in the reference) is pluggable via `pose_backend`; the default
ICP-only path is what every synthetic-dataset config ships
(`configs/base.yaml:105`).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.cameras import Camera
from ..utils import image as im
from ..utils.math3d import eval_ate
from .icp import IcpConfig, icp_pyramid


@jax.jit
def _compose_pose(a, b):
    return a @ b


@partial(jax.jit, static_argnames=("levels", "min_depth", "max_depth",
                                   "invalid_confidence_thresh", "depth_filter"))
def preprocess_frame(depth: jnp.ndarray, color: jnp.ndarray, K: jnp.ndarray,
                     levels: int = 3, min_depth: float = 0.3,
                     max_depth: float = 5.0,
                     invalid_confidence_thresh: float = 0.2,
                     depth_filter: bool = False):
    """(ref `Tracker.map_preprocess`, tracker.py:118-199).

    depth (H,W) meters; color (H,W,3). Returns frame_map dict (camera-frame
    maps + pyramids); world-frame maps are added after tracking.
    """
    if depth_filter:
        depth = im.bilateral_filter(depth, 5, 2.0, 2.0)[..., 0]
    valid = (depth > min_depth) & (depth < max_depth)
    depth = jnp.where(valid, depth, 0.0)

    vertex_c = im.compute_vertex_map(depth, K)
    normal_c = im.compute_normal_map(vertex_c)
    confidence = im.compute_confidence_map(normal_c, K)

    invalid_conf = (jnp.all(normal_c == 0, axis=-1)
                    | (confidence[..., 0] < invalid_confidence_thresh))
    depth = jnp.where(invalid_conf, 0.0, depth)
    normal_c = jnp.where(invalid_conf[..., None], 0.0, normal_c)
    vertex_c = jnp.where(invalid_conf[..., None], 0.0, vertex_c)
    confidence = jnp.where(invalid_conf[..., None], 0.0, confidence)

    vertex_pyr = tuple(im.build_vertex_pyramid(depth, K, levels))
    normal_pyr = tuple(im.build_normal_pyramid(vertex_pyr))
    return {
        "depth_map": depth,
        "color_map": color,
        "vertex_map_c": vertex_c,
        "normal_map_c": normal_c,
        "confidence_map": confidence,
        "invalid_confidence_mask": invalid_conf,
        "vertex_pyr": vertex_pyr,
        "normal_pyr": normal_pyr,
    }


@partial(jax.jit, static_argnames=("levels",))
def build_pyramids(depth: jnp.ndarray, K: jnp.ndarray, levels: int = 3):
    vp = tuple(im.build_vertex_pyramid(depth, K, levels))
    npyr = tuple(im.build_normal_pyramid(vp))
    return vp, npyr


def _median3x3(x):
    """9-tap median on (H,W) via a partial selection network on shifted
    views (edge-padded). ~30 elementwise min/max passes — trivial VPU cost
    at frame scale."""
    p = jnp.pad(x, 1, mode="edge")
    H, W = x.shape
    v = [p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]

    def cas(i, j):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi

    # median-of-9 selection network (Paeth), 19 compare-exchanges
    for a, b in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
        cas(a, b)
    return v[4]


@jax.jit
def fuse_model_depth(render_depth, frame_depth, render_normal, frame_normal,
                     sample_distance_threshold: float = 0.01,
                     sample_normal_threshold: float = 0.01):
    """Frame-to-model depth fusion for the next ICP reference
    (ref `IcpTracker.update_last_status`, icp.py:403-421), made
    ERROR-ADAPTIVE (r04 post-mortem, PROFILE_r04.md):

    The reference keeps the RENDERED depth wherever it agrees with the frame
    within a fixed 1 cm threshold. That is only a win when the sensor depth
    is noisier than the render: our hit-plane depth render carries
    ~0.5-0.8 cm error, so on noiseless (synthetic / ray-cast) depth the
    fixed rule replaces exact pixels with noisy ones and ATE collapses
    0.55 -> 3.7-4.5 cm (BENCH_r04 tries 2/3/7/14).

    Fix, two parts:
    1. the render depth is 3x3-median filtered first — the hit-Gaussian
       selection switches between overlapping gaussians pixel-to-pixel and
       the plane intersection makes that speckle, which the median removes
       without softening true depth edges;
    2. the fused value is an inverse-variance blend
       w = s_f^2 / (s_f^2 + s_r^2) of render and frame, with the sensor
       noise s_f estimated from the frame depth's own high-frequency
       residual (|frame - median3x3(frame)| over valid, planar pixels) and
       the render error s_r^2 = max(s_d^2 - s_f^2, 0) from the total
       render-frame deviation s_d. Noiseless frames give s_f ~ 0 -> w ~ 0
       -> the fused map IS the frame map (exactly the OFF behavior); noisy
       sensors give w -> 1 and the smooth model depth dominates, which is
       the RTG-SLAM drift-bounding mechanism this hook exists for.

    Robust scales use the mean of |.| over the gated pixels (the cheap
    estimator; a median over 816k pixels costs a sort per frame).
    """
    rd = _median3x3(render_depth)
    cos = jnp.sum(render_normal * frame_normal, axis=-1) / (
        jnp.linalg.norm(render_normal, axis=-1)
        * jnp.linalg.norm(frame_normal, axis=-1) + 1e-8
    )
    normal_ok = (1.0 - cos) <= sample_normal_threshold
    both = (frame_depth > 0) & (rd > 0)
    agree = both & normal_ok & (
        jnp.abs(rd - frame_depth) <= sample_distance_threshold)

    def gated_mean(x, m):
        return jnp.sum(jnp.where(m, x, 0.0)) / jnp.maximum(jnp.sum(m), 1)

    # sensor-noise scale from the frame's own speckle (mean |highpass|,
    # scaled to sigma for a normal: E|x| = sigma * sqrt(2/pi))
    hp = jnp.abs(frame_depth - _median3x3(frame_depth))
    s_f = gated_mean(hp, agree) * 1.2533
    # total render-frame deviation over agreeing pixels
    s_d = gated_mean(jnp.abs(rd - frame_depth), agree) * 1.2533
    s_r2 = jnp.maximum(s_d * s_d - s_f * s_f, 1e-12)
    w = (s_f * s_f) / (s_f * s_f + s_r2)

    fused = jnp.where(agree, w * rd + (1.0 - w) * frame_depth, frame_depth)
    # frame-invalid pixels keep the (filtered) render depth, like the
    # reference's fill &= (frame_depth > 0) gate
    return jnp.where(frame_depth > 0, fused, rd)


class Tracker:
    def __init__(self, args, width: int, height: int):
        self.use_gt_pose = args.use_gt_pose
        self.icp_use_model_depth = args.icp_use_model_depth
        self.icp_warmup_frames = args.icp_warmup_frames
        self.min_depth = args.min_depth
        self.max_depth = args.max_depth
        self.depth_filter = args.depth_filter
        self.invalid_confidence_thresh = args.invalid_confidence_thresh
        self.icp_sample_distance_threshold = args.icp_sample_distance_threshold
        self.icp_sample_normal_threshold = args.icp_sample_normal_threshold
        self.levels = len(args.icp_downscales)
        self.icp_cfg = IcpConfig(
            downscales=tuple(args.icp_downscales),
            iters=tuple(args.icp_downscale_iters),
            distance_threshold=args.icp_distance_threshold,
            normal_threshold_cos=float(
                math.cos(math.radians(args.icp_normal_threshold))),
            damping=args.icp_damping,
            fail_threshold=args.icp_fail_threshold,
            min_valid_ratio=getattr(args, "icp_min_valid_ratio", 0.3),
        )
        self.width = width
        self.height = height

        self.K = None
        self.pose_gt: list = []
        self.pose_es: list = []
        self.timestamps: list = []
        self.icp_fail_count = 0
        self.save_path: Optional[str] = None   # set by SLAMSystem for dumps
        self._fail_dumps = 0
        self._fail_pending = []
        self.async_pose = False        # overlapped mode (set by SLAMSystem)
        self._pending_p2p = None
        self._last_pyr = None          # (vertex_pyr, normal_pyr) of frame t0
        self._last_model_depth = None
        self._curr_pyr = None

        # optional feature-based backend (ORB-SLAM2-like); None = ICP only
        self.pose_backend = None
        if getattr(args, "use_orb_backend", False):
            try:
                from .pose_backend import PoseBackend
                self.pose_backend = PoseBackend(args)
            except Exception as e:  # pragma: no cover
                print(f"[tracker] pose backend unavailable ({e}); ICP only")

    # ------------------------------------------------------------------
    def map_preprocess(self, frame: Camera, frame_id: int) -> dict:
        self.K = jnp.asarray(frame.K)
        fm = preprocess_frame(
            jnp.asarray(frame.depth), jnp.asarray(frame.image), self.K,
            levels=self.levels, min_depth=self.min_depth,
            max_depth=self.max_depth,
            invalid_confidence_thresh=self.invalid_confidence_thresh,
            depth_filter=self.depth_filter,
        )
        self._curr_pyr = (fm["vertex_pyr"], fm["normal_pyr"])
        fm = dict(fm)
        fm["time"] = frame_id
        if frame.semantics is not None:
            fm["semantics"] = jnp.asarray(frame.semantics)
        else:
            fm["semantics"] = None
        if frame.instance is not None:
            fm["instance_img"] = jnp.asarray(frame.instance)
        else:
            fm["instance_img"] = None
        return fm

    def tracking(self, frame: Camera, frame_map: dict) -> bool:
        """Estimate the frame pose, update `frame`, and lift maps to world
        (ref `Tracker.tracking`, tracker.py:307-339).

        With `async_pose` (the overlapped loose/free modes) the ICP result
        stays ON DEVICE: the pose chain composes in a jitted matmul, the
        failure check reads the PREVIOUS frame's residual (by then long
        computed — the ref's loose mode also reacts one frame late,
        system.py:19-24), and the host never stalls on the device queue —
        the mapper's compiled steps for frame N overlap the tracker
        dispatch for frame N+1."""
        self.pose_gt.append(np.asarray(frame.pose_gt, np.float64))
        self.timestamps.append(frame.timestamp)
        success = True
        if self.use_gt_pose:
            pose_t1_w = self.pose_gt[-1]
        elif self._last_pyr is None:
            # first frame — or first frame after a checkpoint resume, where
            # the previous pyramid isn't restored: hold the last pose
            pose_t1_w = (np.asarray(jax.device_get(self.pose_es[-1]))
                         if self.pose_es else np.eye(4))
            if self.pose_backend is not None:
                # prime the feature tracker's reference frame
                self.pose_backend.ingest(frame)
                self.pose_backend.poses.append(pose_t1_w)
        else:
            vp0, np0 = self._last_pyr
            pose10, p2p, valid_ratio = icp_pyramid(
                vp0, np0, *self._curr_pyr, self.K, self.icp_cfg
            )
            if self.async_pose and self.pose_backend is None:
                # deferred failure check: previous frame's residual (its host
                # copy was prefetched last frame, so the read is ~free)
                if self._pending_p2p is not None:
                    p_prev, vr_prev = [
                        float(x) for x in jax.device_get(self._pending_p2p)]
                    if (p_prev > self.icp_cfg.fail_threshold
                            or vr_prev < self.icp_cfg.min_valid_ratio):
                        self.icp_fail_count += 1
                        self._dump_icp_failure(frame, frame_map, p_prev,
                                               None)
                self._pending_p2p = (p2p, valid_ratio)
                pose_dev = _compose_pose(self._pose_dev(), pose10)
                # start async D2H mirrors now: every later host consumer
                # (sync_pose for keyframe checks / object layer, the p2p
                # check above, final trajectory save) reads a warm copy
                # instead of paying the tunnel's fresh-readback latency
                try:
                    p2p.copy_to_host_async()
                    valid_ratio.copy_to_host_async()
                    pose_dev.copy_to_host_async()
                except Exception:
                    pass
                self.move_last_status()
                self.pose_es.append(pose_dev)
                frame.set_pose_device(pose_dev)
                c2w = pose_dev.astype(jnp.float32)
                frame_map["vertex_map_w"] = im.transform_map(
                    frame_map["vertex_map_c"], c2w)
                frame_map["normal_map_w"] = im.rotate_map(
                    frame_map["normal_map_c"], c2w)
                return True
            from .mapper import _now, _pr
            if self.pose_backend is not None:
                # run the feature DETECT phase before reading the ICP pose
                # back: the native detection (~80% of the backend's host
                # cost) overlaps the device queue that is still computing
                # the ICP result (ctypes releases the GIL)
                t0 = _now()
                self.pose_backend.detect(frame)
                _pr("tracker/feature_detect", t0)
            # ONE host transfer for pose + p2p (each readback is a network
            # roundtrip when the TPU sits behind a tunnel)
            t0 = _now()
            pose10, p2p, valid_ratio = jax.device_get(
                (pose10, p2p, valid_ratio))
            _pr("tracker/pose_sync", t0)
            pose10 = np.asarray(pose10, np.float64)
            success = bool(p2p <= self.icp_cfg.fail_threshold
                           and valid_ratio >= self.icp_cfg.min_valid_ratio)
            if not success:
                self.icp_fail_count += 1
                self._dump_icp_failure(frame, frame_map, float(p2p), pose10)
            if self.pose_backend is not None:
                # fusion incl. ICP-failure fallback to feature-only tracking
                # (ref tracker.py:265-283)
                t0 = _now()
                pose_t1_w = self.pose_backend.track(
                    frame, pose10, success)
                _pr("tracker/feature_backend", t0)
            else:
                pose_t1_w = np.asarray(
                    jax.device_get(self.pose_es[-1])) @ pose10

        self.move_last_status()
        self.pose_es.append(np.asarray(pose_t1_w, np.float64))
        frame.update_pose(pose_t1_w)

        c2w = jnp.asarray(frame.c2w, jnp.float32)
        frame_map["vertex_map_w"] = im.transform_map(frame_map["vertex_map_c"], c2w)
        frame_map["normal_map_w"] = im.rotate_map(frame_map["normal_map_c"], c2w)
        return success

    def _pose_dev(self):
        """Last pose as a device array (lazy promotion from numpy)."""
        if self.pose_es:
            p = self.pose_es[-1]
            return p if hasattr(p, "devices") else jnp.asarray(
                np.asarray(p), jnp.float32)
        return jnp.eye(4, dtype=jnp.float32)

    def _dump_icp_failure(self, frame, frame_map, p2p: float,
                          pose10: np.ndarray, max_dumps: int = 5):
        """Diagnostics on tracking failure (ref `Tracker` failure dumps,
        SLAM/multiprocess/tracker.py:97-116): the finest-level vertex maps,
        the rejected relative pose, and the loss, capped at `max_dumps`.

        DEFERRED: only device-array references are stashed here; the D2H
        readback + compressed write (~4 s through a tunnel) happens in
        `flush_icp_failures` at end of run, never inside a tracked frame."""
        if self.save_path is None or self._fail_dumps >= max_dumps:
            return
        self._fail_pending.append({
            "idx": len(self.pose_es), "p2p": p2p, "pose10": pose10,
            "vertex_last": (self._last_pyr[0][-1]
                            if self._last_pyr is not None else None),
            "vertex_curr": self._curr_pyr[0][-1],
            "depth": frame_map["depth_map"],
            "n_fail": self.icp_fail_count,
        })
        self._fail_dumps += 1
        if self._fail_dumps == 1:
            # diagnostics must survive a crash/abort before save_traj runs —
            # the exact situation they exist for (ADVICE r02)
            import atexit
            atexit.register(self.flush_icp_failures)
        if self._fail_dumps >= max_dumps:
            self.flush_icp_failures()

    def flush_icp_failures(self):
        """Write the deferred failure diagnostics (called from save_traj)."""
        if not self._fail_pending or self.save_path is None:
            return
        import os as _os
        d = _os.path.join(self.save_path, "icp_fail")
        _os.makedirs(d, exist_ok=True)
        for rec in self._fail_pending:
            np.savez_compressed(
                _os.path.join(d, f"fail_{rec['idx']:05d}.npz"),
                p2p=rec["p2p"],
                pose10=(np.zeros(0) if rec["pose10"] is None
                        else np.asarray(rec["pose10"])),
                vertex_last=(np.zeros(0) if rec["vertex_last"] is None
                             else np.asarray(rec["vertex_last"])),
                vertex_curr=np.asarray(rec["vertex_curr"]),
                depth=np.asarray(rec["depth"]), n_fail=rec["n_fail"])
        self._fail_pending = []

    def move_last_status(self):
        self._last_pyr = self._curr_pyr
        if self._last_model_depth is None and self._curr_pyr is not None:
            pass

    def update_last_status(self, frame, render_depth, frame_depth,
                           render_normal, frame_normal):
        """Use the fused rendered depth as the next ICP reference
        (ref tracker.py:253-263 + icp.py:403-431)."""
        if not self.icp_use_model_depth:
            return
        fused = fuse_model_depth(
            render_depth, frame_depth, render_normal, frame_normal,
            self.icp_sample_distance_threshold,
            self.icp_sample_normal_threshold,
        )
        self._last_pyr = build_pyramids(fused, self.K, self.levels)

    # ------------------------------------------------------------------
    def _poses_np(self):
        """pose_es with device entries materialized (one transfer)."""
        return [np.asarray(p, np.float64)
                for p in jax.device_get(self.pose_es)]

    def eval_ate_series(self):
        es = np.stack([p[:3, 3] for p in self._poses_np()])
        gt = np.stack([p[:3, 3] for p in self.pose_gt])
        return eval_ate(es, gt)

    def save_traj(self, save_path: str):
        """(ref `Tracker.save_traj`, tracker.py:396-424): pose npy + TUM txt
        + final ATE."""
        traj_dir = os.path.join(save_path, "save_traj")
        os.makedirs(traj_dir, exist_ok=True)
        self.flush_icp_failures()
        pose_es = np.stack(self._poses_np())
        pose_gt = np.stack(self.pose_gt)
        np.save(os.path.join(traj_dir, "pose_es.npy"), pose_es)
        np.save(os.path.join(traj_dir, "pose_gt.npy"), pose_gt)
        ate = self.eval_ate_series()
        with open(os.path.join(traj_dir, "poses.txt"), "w") as f:
            from scipy.spatial.transform import Rotation as R
            for ts, p in zip(self.timestamps, pose_es):
                q = R.from_matrix(p[:3, :3]).as_quat()
                t = p[:3, 3]
                f.write(f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n")
        with open(os.path.join(traj_dir, "ate.txt"), "w") as f:
            f.write(f"{ate}\n")
        return ate
