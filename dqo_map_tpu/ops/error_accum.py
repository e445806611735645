"""Per-Gaussian error accumulation from per-pixel error maps.

Replaces `cuda_utils.accumulate_gaussian_error`
(submodules/cuda_utils/map_process.cu:33-110): for every pixel, its color
error is max/sum-scattered onto the hit-COLOR gaussian and its depth/normal
error onto the hit-DEPTH gaussian, with per-gaussian over-threshold counters.
On TPU these are plain segment max/sum scatters — no custom kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def accumulate_gaussian_error(P: int, color_error: jnp.ndarray,
                              depth_error: jnp.ndarray,
                              normal_error: jnp.ndarray,
                              color_index: jnp.ndarray,
                              depth_index: jnp.ndarray,
                              color_threshold: float, depth_threshold: float,
                              normal_threshold: float, check_max: bool = True):
    """All image args are (H,W). Index maps hold global gaussian ids or -1.

    Returns (gs_color_error, gs_depth_error, gs_normal_error,
    outlier/rescale_counter) each (P,), matching the CUDA outputs consumed at
    `mapper.py:1029-1047`.
    """
    ce = color_error.reshape(-1)
    de = depth_error.reshape(-1)
    ne = normal_error.reshape(-1)
    ci = color_index.reshape(-1)
    di = depth_index.reshape(-1)
    # guard: -1 would wrap; send invalid to a dropped OOB slot
    ci = jnp.where(ci >= 0, ci, P)
    di = jnp.where(di >= 0, di, P)

    if check_max:
        gs_color = jnp.zeros(P, jnp.float32).at[ci].max(ce, mode="drop")
        gs_depth = jnp.zeros(P, jnp.float32).at[di].max(de, mode="drop")
        gs_normal = jnp.zeros(P, jnp.float32).at[di].max(ne, mode="drop")
    else:
        gs_color = jnp.zeros(P, jnp.float32).at[ci].add(ce, mode="drop")
        gs_depth = jnp.zeros(P, jnp.float32).at[di].add(de, mode="drop")
        gs_normal = jnp.zeros(P, jnp.float32).at[di].add(ne, mode="drop")

    rescale = (
        jnp.zeros(P, jnp.float32).at[ci].add(
            (ce > color_threshold).astype(jnp.float32), mode="drop")
        + jnp.zeros(P, jnp.float32).at[di].add(
            (de > depth_threshold).astype(jnp.float32)
            + (ne > normal_threshold).astype(jnp.float32), mode="drop")
    )
    return gs_color, gs_depth, gs_normal, rescale
