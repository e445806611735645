"""Image-space geometry ops: vertex/normal/confidence maps, pyramids,
pooling, tile masks, pixel sampling, bilateral filter.

Pure-JAX equivalents of `SLAM/utils.py:56-808` and `SLAM/icp.py:150-359`.
Maps are (H, W, C) float32, matching the reference's H-W-C convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def compute_vertex_map(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project depth (H,W) or (H,W,1) to camera-frame points (H,W,3)
    (ref `SLAM/utils.py:65-75`)."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    i = jnp.arange(W, dtype=depth.dtype)[None, :].repeat(H, axis=0)
    j = jnp.arange(H, dtype=depth.dtype)[:, None].repeat(W, axis=1)
    dirs = jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)
    return dirs * depth[..., None]


def sobel_gradient(img: jnp.ndarray):
    """Per-channel Sobel x/y gradients with replicate padding
    (ref `SLAM/utils.py:77-100`)."""
    H, W, C = img.shape
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    x = jnp.transpose(x, (2, 0, 1))[:, None]  # (C,1,H+2,W+2)
    wx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=img.dtype)
    wy = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=img.dtype)
    kern = jnp.stack([wx, wy])[:, None]  # (2,1,3,3)
    out = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST
    )  # (C,2,H,W)
    gx = jnp.transpose(out[:, 0], (1, 2, 0))
    gy = jnp.transpose(out[:, 1], (1, 2, 0))
    return gx, gy


def compute_normal_map(vertex_map: jnp.ndarray) -> jnp.ndarray:
    """Normals from a vertex map via Sobel cross product
    (ref `SLAM/utils.py:102-126`): normal = dy x dx, zeroed at min/max depth."""
    H, W, _ = vertex_map.shape
    img_dx, img_dy = sobel_gradient(vertex_map)
    normal = jnp.cross(img_dy.reshape(-1, 3), img_dx.reshape(-1, 3)).reshape(H, W, 3)
    mag = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / (mag + 1e-8)
    depth = vertex_map[:, :, -1]
    invalid = (depth <= depth.min()) | (depth >= depth.max())
    return jnp.where(invalid[..., None], 0.0, normal)


def compute_normal_map_icp(vertex_map: jnp.ndarray) -> jnp.ndarray:
    """ICP-side normal convention: dx x dy (ref `SLAM/icp.py:169-191`)."""
    H, W, _ = vertex_map.shape
    img_dx, img_dy = sobel_gradient(vertex_map)
    normal = jnp.cross(img_dx.reshape(-1, 3), img_dy.reshape(-1, 3)).reshape(H, W, 3)
    mag = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / (mag + 1e-8)
    depth = vertex_map[:, :, -1]
    invalid = (depth <= depth.min()) | (depth >= depth.max())
    return jnp.where(invalid[..., None], 0.0, normal)


def compute_confidence_map(normal_map: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """|cos| between pixel normal and the viewing ray direction (H,W,1)
    (ref `SLAM/utils.py:129-142`)."""
    H, W, _ = normal_map.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    i = jnp.arange(W, dtype=normal_map.dtype)[None, :].repeat(H, axis=0)
    j = jnp.arange(H, dtype=normal_map.dtype)[:, None].repeat(W, axis=1)
    proj = jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)
    proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-8)
    nn = normal_map / (jnp.linalg.norm(normal_map, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.abs(jnp.sum(nn * proj, axis=-1))
    return cos[..., None]


def transform_map(m: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform to an (H,W,3) point map (ref `SLAM/utils.py:56-63`)."""
    return jnp.matmul(m, T[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + T[:3, 3]


def rotate_map(m: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(m, T[:3, :3].T, precision=jax.lax.Precision.HIGHEST)


# --- pooling / pyramids -----------------------------------------------------

def _pool2d(x: jnp.ndarray, stride: int, mode: str, pad_value: float) -> jnp.ndarray:
    H, W = x.shape[:2]
    pad_h = (H + stride - 1) // stride * stride - H
    pad_w = (W + stride - 1) // stride * stride - W
    x = jnp.pad(x, ((0, pad_h), (0, pad_w)), constant_values=pad_value)
    Hp, Wp = x.shape
    blocks = x.reshape(Hp // stride, stride, Wp // stride, stride)
    if mode == "max":
        return blocks.max(axis=(1, 3))
    return blocks.mean(axis=(1, 3))


def maxpool(x: jnp.ndarray, stride: int, pad_value: float = 0.0) -> jnp.ndarray:
    return _pool2d(x, stride, "max", pad_value)


def meanpool(x: jnp.ndarray, stride: int, pad_value: float = 0.0) -> jnp.ndarray:
    return _pool2d(x, stride, "mean", pad_value)


def build_depth_pyramid(depth: jnp.ndarray, levels: int) -> list:
    """Max-pooled depth pyramid, coarse->fine (ref `ImagePyramids` with 'max'
    pooling, `SLAM/icp.py:341-359`). Level i uses pool size 2^(levels-1-i)."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    out = []
    for i in range(levels):
        k = 1 << (levels - 1 - i)
        out.append(depth if k == 1 else _pool2d(depth, k, "max", 0.0))
    return out


def build_vertex_pyramid(depth: jnp.ndarray, K: jnp.ndarray, levels: int) -> list:
    """(ref `SLAM/utils.py:542-553`)."""
    pyr = build_depth_pyramid(depth, levels)
    out = []
    for i, d in enumerate(pyr):
        downscale = 1.0 / (1 << (levels - 1 - i))
        Kd = K * downscale
        Kd = Kd.at[2, 2].set(1.0) if hasattr(Kd, "at") else Kd
        out.append(compute_vertex_map(d, Kd))
    return out


def build_normal_pyramid(vertex_pyramid: list) -> list:
    return [compute_normal_map_icp(v) for v in vertex_pyramid]


# --- tile masks -------------------------------------------------------------

def pixelmask_to_tilemask(pixelmask: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(ref `SLAM/utils.py:738-749`)."""
    return (maxpool(pixelmask.astype(jnp.float32), stride) > 0).astype(jnp.int32)


def transmission_to_tilemask(pixelmask: jnp.ndarray, stride: int,
                             tile_mask_ratio: float = 0.5) -> jnp.ndarray:
    """Tiles where >ratio of pixels are active (ref `SLAM/utils.py:752-762`)."""
    t = meanpool(pixelmask.astype(jnp.float32), stride)
    return (t > tile_mask_ratio).astype(jnp.int32)


def colorerror_to_tilemask(color_error: jnp.ndarray, stride: int,
                           top_ratio: float = 0.4) -> jnp.ndarray:
    """Top-`ratio` tiles by mean color error (ref `SLAM/utils.py:765-798`)."""
    if color_error.ndim == 3:
        color_error = color_error[..., 0]
    down = meanpool(color_error, stride)
    k = int(down.size * top_ratio)
    flat = down.reshape(-1)
    if k <= 0:
        return jnp.zeros_like(down, dtype=jnp.int32)
    thresh_vals, idx = jax.lax.top_k(flat, k)
    mask = jnp.zeros_like(flat, dtype=jnp.int32).at[idx].set(1)
    return mask.reshape(down.shape)


def tilemask_to_pixelmask(tile_mask: jnp.ndarray, stride: int, H: int, W: int) -> jnp.ndarray:
    up = jnp.repeat(jnp.repeat(tile_mask, stride, axis=0), stride, axis=1)
    return up[:H, :W].astype(bool)


# --- pixel sampling ---------------------------------------------------------

def sample_pixels(key: jax.Array, select_mask: jnp.ndarray, max_samples: int,
                  want_num: jnp.ndarray):
    """Sample up to `max_samples` pixel indices uniformly from `select_mask`.

    TPU-friendly re-design of `SLAM/utils.py:145-212` (torch.randperm over
    masked pixels): static output shape `max_samples`, with a validity mask
    covering (a) fewer masked pixels than requested and (b) the traced
    `want_num` <= max_samples. Returns (flat_indices, valid) both (max_samples,).
    """
    flat_mask = select_mask.reshape(-1)
    n = flat_mask.shape[0]
    scores = jax.random.uniform(key, (n,)) + flat_mask.astype(jnp.float32) * 2.0
    # exact top_k: hardware-profiled at ~1 ms for 816k pixels — approx_max_k
    # saved nothing measurable and its recall misses masked pixels when the
    # masked count is close to the request
    _, idx = jax.lax.top_k(scores, max_samples)
    rank = jnp.arange(max_samples)
    valid = flat_mask[idx] & (rank < want_num)
    return idx, valid


# --- bilateral filter -------------------------------------------------------

def bilateral_filter(depth: jnp.ndarray, radius: int, sigma_color: float,
                     sigma_space: float) -> jnp.ndarray:
    """Depth-aware bilateral filter (ref `SLAM/utils.py:607-646`)."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    h, w = depth.shape
    pad = jnp.pad(depth, ((radius, radius), (radius, radius)))
    weight_sum = jnp.zeros_like(depth)
    pixel_sum = jnp.zeros_like(depth)
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            if (i * i + j * j) > radius * radius:
                continue
            shifted = jax.lax.dynamic_slice(pad, (radius + i, radius + j), (h, w))
            spatial = -(i * i + j * j) / (2 * sigma_space**2)
            colorw = -((depth - shifted) ** 2) / (2 * sigma_color**2)
            wgt = jnp.exp(spatial + colorw) * (shifted != 0)
            weight_sum = weight_sum + wgt
            pixel_sum = pixel_sum + wgt * shifted
    out = jnp.where(weight_sum == 0, 0.0, pixel_sum / jnp.where(weight_sum == 0, 1.0, weight_sum))
    return out[..., None]
