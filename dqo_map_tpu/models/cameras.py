"""Camera model.

Equivalent of `scene/cameras.py` but with plain (non-transposed) matrices:
the reference stores transposed matrices for the CUDA row-vector convention
(`scene/cameras.py:138-155`); here everything is standard column-vector math,
and the rasterizer consumes `w2c` / `K` directly.

A Camera is host-side (numpy poses + image arrays); `render_inputs()` packs
what jitted code needs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def _render_inputs_device(c2w_dev, proj, K, tan_fovx, tan_fovy) -> dict:
    import jax

    @jax.jit
    def pack(c2w, proj, K, tx, ty):
        import jax.numpy as jnp
        c2w = c2w.astype(jnp.float32)
        w2c = jnp.linalg.inv(c2w)
        return {
            "w2c": w2c, "cam_pos": c2w[:3, 3], "full_proj": proj @ w2c,
            "K": K, "tan_fovx": tx, "tan_fovy": ty,
        }

    return pack(c2w_dev, proj, K, tan_fovx, tan_fovy)


def get_projection_matrix(znear: float, zfar: float, fovX: float, fovY: float) -> np.ndarray:
    """Perspective NDC projection, z in [0,1] (ref `utils/graphics_utils.py:66-86`)."""
    tanY = math.tan(fovY / 2)
    tanX = math.tan(fovX / 2)
    top = tanY * znear
    right = tanX * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@dataclass
class Camera:
    uid: int
    c2w: np.ndarray                      # (4,4) camera-to-world
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    image: Optional[np.ndarray] = None   # (H,W,3) float32 in [0,1]
    depth: Optional[np.ndarray] = None   # (H,W) float32 meters
    pose_gt: np.ndarray = field(default_factory=lambda: np.eye(4))
    timestamp: float = 0.0
    depth_scale: float = 1.0
    semantics: Optional[np.ndarray] = None    # (H,W,3)
    instance: Optional[np.ndarray] = None     # (H,W,3)
    object_img: Optional[np.ndarray] = None
    detections: Optional[list] = None         # per-frame detection dicts
    znear: float = 0.01
    zfar: float = 100.0
    c2w_dev: Optional[object] = None          # device-side pose (overlapped
                                              # tracking: no host readback)

    # --- pose ---------------------------------------------------------------
    @property
    def w2c(self) -> np.ndarray:
        return np.linalg.inv(self.c2w).astype(np.float32)

    @property
    def R(self) -> np.ndarray:
        """W2C rotation, stored transposed like the reference's Camera.R
        (`scene/cameras.py:54`, set from `np.transpose(w2c[:3,:3])`)."""
        return self.w2c[:3, :3].T

    @property
    def T(self) -> np.ndarray:
        return self.w2c[:3, 3]

    @property
    def Rt(self) -> np.ndarray:
        """(3,4) world->camera [R|t], the object layer's projection pose
        (ref `scene/cameras.py:62,172-173`)."""
        return self.w2c[:3, :4]

    @property
    def camera_center(self) -> np.ndarray:
        return self.c2w[:3, 3]

    @property
    def FoVx(self) -> float:
        return focal2fov(self.fx, self.width)

    @property
    def FoVy(self) -> float:
        return focal2fov(self.fy, self.height)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], dtype=np.float32
        )

    @property
    def projection_matrix(self) -> np.ndarray:
        return get_projection_matrix(self.znear, self.zfar, self.FoVx, self.FoVy)

    @property
    def full_proj(self) -> np.ndarray:
        """(4,4) world -> NDC (ref `full_proj_transform`)."""
        return (self.projection_matrix @ self.w2c).astype(np.float32)

    def update_pose(self, pose_c2w: np.ndarray) -> None:
        """(ref `scene/cameras.py:165-167`)."""
        self.c2w = np.asarray(pose_c2w, dtype=np.float64)
        self.c2w_dev = None

    def set_pose_device(self, c2w_dev) -> None:
        """Adopt a DEVICE-side pose (overlapped tracker mode): downstream
        jitted consumers read it without a host roundtrip; host-side
        consumers call `sync_pose()` first."""
        self.c2w_dev = c2w_dev

    def sync_pose(self) -> None:
        """Materialize the device pose into the numpy `c2w` (blocks)."""
        if self.c2w_dev is not None:
            import jax
            self.c2w = np.asarray(jax.device_get(self.c2w_dev), np.float64)
            self.c2w_dev = None

    def update_w2c(self, R_transposed: np.ndarray, T: np.ndarray) -> None:
        """Set pose from the reference's (R^T, t) W2C split (ref `update`)."""
        w2c = np.eye(4)
        w2c[:3, :3] = np.asarray(R_transposed).T
        w2c[:3, 3] = np.asarray(T)
        self.c2w = np.linalg.inv(w2c)

    def get_uv(self, xyz_w: np.ndarray) -> np.ndarray:
        """Project world points to integer pixel coords (ref `get_uv`)."""
        w2c = self.w2c
        xyz_c = xyz_w @ w2c[:3, :3].T + w2c[:3, 3]
        uv = xyz_c @ self.K.T
        return (uv[:, :2] / uv[:, 2:]).astype(np.int64)

    # --- packing for jitted code ---------------------------------------------
    def render_inputs(self) -> dict:
        """Static-shape float32 dict consumed by the rasterizer. With a
        device pose (`set_pose_device`) every entry is computed on device —
        zero host roundtrips on the overlapped tracking path."""
        if self.c2w_dev is not None:
            return _render_inputs_device(
                self.c2w_dev, self.projection_matrix, self.K,
                np.float32(math.tan(self.FoVx * 0.5)),
                np.float32(math.tan(self.FoVy * 0.5)))
        return {
            "w2c": self.w2c.astype(np.float32),
            "cam_pos": self.camera_center.astype(np.float32),
            "full_proj": self.full_proj,
            "K": self.K,
            "tan_fovx": np.float32(math.tan(self.FoVx * 0.5)),
            "tan_fovy": np.float32(math.tan(self.FoVy * 0.5)),
        }

    def resized(self, scale: float) -> "Camera":
        """Downscaled copy (images resized by nearest)."""
        if scale == 1.0:
            return self
        H2, W2 = int(self.height * scale), int(self.width * scale)

        def rs(img):
            if img is None:
                return None
            ys = (np.arange(H2) / scale).astype(np.int64).clip(0, self.height - 1)
            xs = (np.arange(W2) / scale).astype(np.int64).clip(0, self.width - 1)
            return img[ys][:, xs]

        return Camera(
            uid=self.uid, c2w=self.c2w, fx=self.fx * scale, fy=self.fy * scale,
            cx=self.cx * scale, cy=self.cy * scale, width=W2, height=H2,
            image=rs(self.image), depth=rs(self.depth), pose_gt=self.pose_gt,
            timestamp=self.timestamp, depth_scale=self.depth_scale,
            semantics=rs(self.semantics), instance=rs(self.instance),
            object_img=rs(self.object_img), detections=self.detections,
        )
