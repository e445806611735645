"""Tile binning: duplicate-with-keys + device sort + aligned range layout.

TPU-native replacement for the CUDA pipeline `duplicateWithKeys` -> cub radix
sort -> `identifyTileRanges` -> host-side `tile_indices` compaction
(`rasterizer_impl.cu:104-146,347-439`). TPUs want static shapes, so each
Gaussian emits a fixed number of (tile, depth, id) slots
(`max_tiles_per_gaussian`); invalid slots sort to the end via a sentinel key.

Keys are fused into a single uint32 (tile | quantized depth) when the tile
grid fits 12 bits — single-key single-value sorts are the fastest lax.sort
shape. After the sort, entries are re-laid-out CHUNK-ALIGNED per tile and
capped at a static `entry_cap` — crucially via GATHERS (output slot ->
source index through a searchsorted over the padded offsets): TPU scatters
serialize and were ~25x slower than the sort itself.

The aligned layout is what lets the Pallas blend kernel consume entries
through pallas's own pipelined block fetching. Truncation is explicit and
reported via `dropped`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import Preprocessed

DEPTH_BITS = 19
DEPTH_RANGE = 100.0   # zfar; 100 m / 2^19 = 0.2 mm ordering resolution


class Binning(NamedTuple):
    point_list: jnp.ndarray    # (entry_cap,) int32 gaussian index per slot
    entry_tile: jnp.ndarray    # (entry_cap,) int32 tile id (sentinel = T)
    entry_valid: jnp.ndarray   # (entry_cap,) bool
    tile_offsets: jnp.ndarray  # (T+1,) int32, ALIGNED starts into point_list
    block_tile: jnp.ndarray    # (entry_cap/align,) int32 tile per block (-1 unused)
    num_entries: jnp.ndarray   # () int32 valid entries kept
    num_blocks: jnp.ndarray    # () int32 align-sized blocks actually used
    dropped: jnp.ndarray       # () int32 entries lost to caps


def tile_grid_size(width: int, height: int, tile_size: int):
    return (height + tile_size - 1) // tile_size, (width + tile_size - 1) // tile_size


def bin_gaussians(pre: Preprocessed, width: int, height: int, tile_size: int,
                  max_tiles_per_gaussian: int,
                  tile_mask: Optional[jnp.ndarray] = None,
                  align: int = 256, entry_cap: int = 1 << 20,
                  max_chunks: int = 32) -> Binning:
    P = pre.xy.shape[0]
    R = max_tiles_per_gaussian
    TH, TW = tile_grid_size(width, height, tile_size)
    num_tiles = TH * TW
    assert entry_cap % align == 0

    xy = jax.lax.stop_gradient(pre.xy)
    radius = jax.lax.stop_gradient(pre.radius)
    depth = jax.lax.stop_gradient(pre.depth)

    # tile rect per gaussian (ref `getRect`, auxiliary.h:49-57)
    xy_T = xy.T
    rect_min_x = jnp.clip(jnp.floor((xy_T[0] - radius) / tile_size), 0, TW).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((xy_T[1] - radius) / tile_size), 0, TH).astype(jnp.int32)
    rect_max_x = jnp.clip(
        jnp.floor((xy_T[0] + radius + tile_size - 1) / tile_size), 0, TW
    ).astype(jnp.int32)
    rect_max_y = jnp.clip(
        jnp.floor((xy_T[1] + radius + tile_size - 1) / tile_size), 0, TH
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

    tile_key = jnp.where(slot_valid, tile_id, num_tiles).reshape(-1)
    gauss_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, R)).reshape(-1)

    if num_tiles < (1 << 12):
        # fused single-u32 key: tile(12b) | quantized depth(19b). The CUDA
        # reference packs exact f32 depth bits into a 64-bit key; 0.2 mm
        # ordering resolution is far below any visible difference.
        dq = jnp.clip(depth * (1.0 / DEPTH_RANGE), 0.0, 1.0)
        dq = (dq * ((1 << DEPTH_BITS) - 1)).astype(jnp.uint32)
        dq = jnp.broadcast_to(dq[:, None], (P, R)).reshape(-1)
        key = (tile_key.astype(jnp.uint32) << DEPTH_BITS) | dq
        sorted_key, sorted_id = jax.lax.sort((key, gauss_id), num_keys=1)
        sorted_tile = (sorted_key >> DEPTH_BITS).astype(jnp.int32)
    else:
        depth_key = jnp.broadcast_to(depth[:, None], (P, R)).reshape(-1)
        sorted_tile, _, sorted_id = jax.lax.sort(
            (tile_key.astype(jnp.int32), depth_key, gauss_id), num_keys=2
        )

    # per-tile ranges in sort space, then the CHUNK-aligned capped layout
    offsets = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = offsets[1:] - offsets[:-1]
    kept_counts = jnp.minimum(counts, align * max_chunks)
    padded = ((kept_counts + align - 1) // align) * align
    poffs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )
    poffs = jnp.minimum(poffs, entry_cap)

    # GATHER-based layout: for each output slot, find its tile by counting
    # tile boundaries at or before it — a 3k-element scatter + a cumsum.
    # (searchsorted over entry_cap queries costs ~100 ms of serialized
    # gathers; scatters of a few thousand elements are cheap.)
    o = jnp.arange(entry_cap, dtype=jnp.int32)
    boundary = jnp.zeros(entry_cap + 1, jnp.int32).at[poffs[1:]].add(
        1, mode="drop")
    t_of_o = jnp.cumsum(boundary[:entry_cap])
    t_safe = jnp.clip(t_of_o, 0, num_tiles - 1)
    rank = o - poffs[t_safe]
    valid = (t_of_o < num_tiles) & (rank < kept_counts[t_safe])
    src = jnp.where(valid, offsets[t_safe] + rank, 0)
    point_list = jnp.take(sorted_id, src)
    entry_tile = jnp.where(valid, t_safe, num_tiles)
    block_starts = jnp.arange(entry_cap // align, dtype=jnp.int32) * align
    bt = entry_tile[block_starts]
    block_tile = jnp.where(bt < num_tiles, bt, -1).astype(jnp.int32)

    n_valid_slots = jnp.sum(slot_valid.astype(jnp.int32))
    num_entries = jnp.sum(valid.astype(jnp.int32))
    dropped = (
        jnp.sum(jnp.where(gauss_valid, jnp.maximum(area - R, 0), 0),
                dtype=jnp.int32)
        + (n_valid_slots - num_entries)
    )
    return Binning(
        point_list=point_list, entry_tile=entry_tile, entry_valid=valid,
        tile_offsets=poffs, block_tile=block_tile,
        num_entries=num_entries, num_blocks=poffs[num_tiles] // align,
        dropped=dropped,
    )
