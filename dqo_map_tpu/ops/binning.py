"""Tile binning: duplicate-with-keys + device sort + range extraction.

TPU-native replacement for the CUDA pipeline `duplicateWithKeys` -> cub radix
sort -> `identifyTileRanges` -> host-side `tile_indices` compaction
(`rasterizer_impl.cu:104-146,347-439`). TPUs want static shapes, so each
Gaussian emits a fixed number of (tile, depth, id) slots
(`max_tiles_per_gaussian`); slots beyond a Gaussian's actual tile rect are
masked to a sentinel tile and sort to the end. `jax.lax.sort` with two keys
(tile id, camera depth) reproduces the CUDA (tile | depth-bits) key order.

Truncation: Gaussians whose rect exceeds the cap lose their farthest rows
(row-major slot enumeration); `dropped` counts lost slots so callers can
raise the cap. Radii in SLAM maps are bounded by `max_radius`, so the default
cap of 16 (4x4 tiles) is loss-free in practice.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import Preprocessed


class Binning(NamedTuple):
    point_list: jnp.ndarray    # (L,) int32 gaussian index per entry, sorted by (tile, depth)
    entry_tile: jnp.ndarray    # (L,) int32 tile id per entry (sentinel num_tiles when invalid)
    tile_offsets: jnp.ndarray  # (num_tiles+1,) int32 range starts into point_list
    num_entries: jnp.ndarray   # () int32 total valid entries
    dropped: jnp.ndarray       # () int32 slots lost to the per-gaussian cap


def tile_grid_size(width: int, height: int, tile_size: int):
    return (height + tile_size - 1) // tile_size, (width + tile_size - 1) // tile_size


def bin_gaussians(pre: Preprocessed, width: int, height: int, tile_size: int,
                  max_tiles_per_gaussian: int,
                  tile_mask: Optional[jnp.ndarray] = None) -> Binning:
    P = pre.xy.shape[0]
    R = max_tiles_per_gaussian
    TH, TW = tile_grid_size(width, height, tile_size)
    num_tiles = TH * TW

    xy = jax.lax.stop_gradient(pre.xy)
    radius = jax.lax.stop_gradient(pre.radius)
    depth = jax.lax.stop_gradient(pre.depth)

    # tile rect per gaussian (ref `getRect`, auxiliary.h:49-57)
    rect_min_x = jnp.clip(jnp.floor((xy[:, 0] - radius) / tile_size), 0, TW).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((xy[:, 1] - radius) / tile_size), 0, TH).astype(jnp.int32)
    rect_max_x = jnp.clip(
        jnp.floor((xy[:, 0] + radius + tile_size - 1) / tile_size), 0, TW
    ).astype(jnp.int32)
    rect_max_y = jnp.clip(
        jnp.floor((xy[:, 1] + radius + tile_size - 1) / tile_size), 0, TH
    ).astype(jnp.int32)
    rw = jnp.maximum(rect_max_x - rect_min_x, 0)
    rh = jnp.maximum(rect_max_y - rect_min_y, 0)
    area = rw * rh
    gauss_valid = pre.valid & (area > 0)

    slots = jnp.arange(R, dtype=jnp.int32)[None, :]            # (1,R)
    rw_safe = jnp.maximum(rw, 1)[:, None]
    tx = rect_min_x[:, None] + slots % rw_safe                  # (P,R)
    ty = rect_min_y[:, None] + slots // rw_safe
    slot_valid = gauss_valid[:, None] & (slots < area[:, None])

    tile_id = ty * TW + tx
    if tile_mask is not None:
        masked_on = tile_mask.reshape(-1).astype(bool)
        slot_valid = slot_valid & masked_on[jnp.clip(tile_id, 0, num_tiles - 1)]

    tile_key = jnp.where(slot_valid, tile_id, num_tiles).reshape(-1).astype(jnp.int32)
    depth_key = jnp.broadcast_to(depth[:, None], (P, R)).reshape(-1).astype(jnp.float32)
    gauss_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, R)
    ).reshape(-1)

    sorted_tile, _, sorted_id = jax.lax.sort(
        (tile_key, depth_key, gauss_id), num_keys=2
    )

    tile_offsets = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    num_entries = tile_offsets[num_tiles]
    dropped = jnp.sum(
        jnp.where(gauss_valid, jnp.maximum(area - R, 0), 0), dtype=jnp.int32
    )
    return Binning(
        point_list=sorted_id, entry_tile=sorted_tile, tile_offsets=tile_offsets,
        num_entries=num_entries, dropped=dropped,
    )
