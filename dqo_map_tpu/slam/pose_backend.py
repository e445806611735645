"""Feature-based pose backend (native C++), the reference's ORB-SLAM2 slot.

The reference's tracker optionally delegates pose estimation to a C++
ORB-SLAM2 binding and fuses it with ICP (`use_orb_backend` / `orb_useicp`,
reference SLAM/tracker.py:80-120,340-420). This module binds our
from-scratch native backend (`runtime/orb_backend.cc`: oriented-BRIEF
corners, Hamming matching, RANSAC 3D-3D alignment over depth-lifted
keypoints) via ctypes and implements the same fusion policy:

  * feature pose wins when it has enough inliers,
  * otherwise fall back to the ICP relative pose when ICP converged,
  * otherwise constant-velocity (identity relative motion).
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
    lib.ob_create.restype = ctypes.c_void_p
    lib.ob_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_double,
                              ctypes.c_double, ctypes.c_double,
                              ctypes.c_double, ctypes.c_int]
    lib.ob_track.restype = ctypes.c_int
    lib.ob_track.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_uint8),
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_double)]
    lib.ob_reset.argtypes = [ctypes.c_void_p]
    lib.ob_destroy.argtypes = [ctypes.c_void_p]
    return lib


class PoseBackend:
    """Stateful per-sequence feature tracker.

    `track(frame, icp_pose10, icp_success)` returns the world pose (c2w) of
    the new frame, composing the last estimated pose with the chosen
    relative motion. Mirrors the decision structure of the reference's
    `Tracking` orb/icp fusion (reference SLAM/tracker.py:340-420).
    """

    MIN_INLIERS = 12

    def __init__(self, args):
        self._lib = _load_lib()
        self._handle = None
        self._max_feats = int(getattr(args, "orb_max_feats", 1000))
        self.use_icp = bool(getattr(args, "orb_useicp", True))
        self.poses: list = []
        self.n_inliers_last = -1

    def _ensure(self, W, H, K):
        if self._handle is None:
            self._handle = self._lib.ob_create(
                int(W), int(H), float(K[0, 0]), float(K[1, 1]),
                float(K[0, 2]), float(K[1, 2]), self._max_feats)

    def ingest(self, frame) -> int:
        """Feed one frame; returns feature-pose inlier count (<0 before the
        second frame). `self.rel` holds T_{prev<-curr} on success."""
        img = np.asarray(frame.image)
        if img.ndim == 3:
            gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                    + 0.114 * img[..., 2])
        else:
            gray = img
        if gray.dtype != np.uint8:
            gray = np.clip(gray * (255.0 if gray.max() <= 1.5 else 1.0),
                           0, 255).astype(np.uint8)
        gray = np.ascontiguousarray(gray)
        depth = np.ascontiguousarray(np.asarray(frame.depth, np.float32))
        H, W = gray.shape
        self._ensure(W, H, np.asarray(frame.K))
        pose = np.eye(4, dtype=np.float64).reshape(-1)
        n = self._lib.ob_track(
            self._handle,
            gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pose.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        self.rel = pose.reshape(4, 4)
        self.n_inliers_last = n
        return n

    def track(self, frame, icp_pose10: np.ndarray, icp_success: bool):
        n = self.ingest(frame)
        if n >= self.MIN_INLIERS:
            rel = self.rel
        elif self.use_icp and icp_success and icp_pose10 is not None:
            rel = np.asarray(icp_pose10, np.float64)
        else:
            rel = np.eye(4)
        last = self.poses[-1] if self.poses else np.eye(4)
        pose_w = last @ rel
        self.poses.append(pose_w)
        return pose_w

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
