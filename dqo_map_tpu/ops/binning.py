"""Tile binning: duplicate-with-keys + device sort + aligned range layout.

TPU-native replacement for the CUDA pipeline `duplicateWithKeys` -> cub radix
sort -> `identifyTileRanges` -> host-side `tile_indices` compaction
(`rasterizer_impl.cu:104-146,347-439`). TPUs want static shapes; the slot
array is sized by the entry budget (2x entry_cap), filled by a prefix-sum
over per-gaussian tile counts + gather expansion (a dense P x
max_tiles_per_gaussian grid sorts 4-5x more slots than exist — and the sort
IS the binning cost). Invalid slots sort to the end via a sentinel key.

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

    # --- two-phase slot emission (replaces the dense (P,R) slot grid) ---
    # A dense P x R grid sorts P*R slots (4.2M at office0 scale) though only
    # ~E = sum(area) (<1M) are real. Prefix-sum the kept per-gaussian tile
    # counts, then GATHER-expand into a slot array sized by the entry
    # budget. Slot s belongs to the gaussian whose cumulative-count interval
    # contains s (boundary-scatter + cumsum — searchsorted would serialize).
    #
    # PERF (hardware-profiled): one 2M-element gather from a P-array costs
    # ~18 ms on TPU, but a (K, P) table gathered ONCE along axis=1 amortizes
    # to ~1 ms/row — so every per-gaussian field rides a single stacked
    # take. Integer //, % over 2M slots lower to slow VPU sequences; rank
    # (< R <= 31) and rw decompose exactly in f32 instead.
    area_k = jnp.where(gauss_valid, jnp.minimum(area, R), 0)
    cum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(area_k).astype(jnp.int32)])
    total = cum[P]
    slot_cap = min(P * R, 2 * entry_cap)
    sboundary = jnp.zeros(slot_cap + 1, jnp.int32).at[cum[1:]].add(
        1, mode="drop")
    g_of_s = jnp.cumsum(sboundary[:slot_cap])                  # (slot_cap,)
    s = jnp.arange(slot_cap, dtype=jnp.int32)
    g_safe = jnp.clip(g_of_s, 0, P - 1)
    slot_ok = s < jnp.minimum(total, slot_cap)

    assert R < 32
    fused_key = num_tiles < (1 << 12)
    origin = rect_min_y * TW + rect_min_x      # rect rows are TW apart
    origin_rw = origin * 32 + jnp.minimum(rw, 31)
    dq = jnp.clip(depth * (1.0 / DEPTH_RANGE), 0.0, 1.0)
    dq = (dq * ((1 << DEPTH_BITS) - 1)).astype(jnp.uint32)
    rows = [cum[:P], origin_rw,
            dq.astype(jnp.int32) if fused_key
            else jnp.arange(P, dtype=jnp.int32)]
    gtab = jnp.take(jnp.stack(rows), g_safe, axis=1)           # (3, slot_cap)
    rank = (s - gtab[0]).astype(jnp.float32)
    rw_g = jnp.maximum(gtab[1] & 31, 1)
    # exact small-int div: rank < 32 and f32 division is correctly rounded
    ty = jnp.floor(rank / rw_g.astype(jnp.float32)).astype(jnp.int32)
    tx = rank.astype(jnp.int32) - ty * rw_g
    tile_id = (gtab[1] >> 5) + ty * TW + tx

    tile_key = jnp.where(slot_ok, tile_id, num_tiles)
    gauss_id = g_safe

    if fused_key:
        # fused single-u32 key: tile(12b) | quantized depth(19b). The CUDA
        # reference packs exact f32 depth bits into a 64-bit key; 0.2 mm
        # ordering resolution is far below any visible difference.
        key = (tile_key.astype(jnp.uint32) << DEPTH_BITS) | gtab[2].astype(
            jnp.uint32)
        sorted_key, sorted_id = jax.lax.sort((key, gauss_id), num_keys=1)
        sorted_tile = (sorted_key >> DEPTH_BITS).astype(jnp.int32)
    else:
        depth_key = depth[g_safe]
        sorted_tile, _, sorted_id = jax.lax.sort(
            (tile_key.astype(jnp.int32), depth_key, gauss_id), num_keys=2
        )

    # per-tile ranges in sort space, then the CHUNK-aligned capped layout.
    # tile_mask is applied HERE, per tile (free), not per slot pre-sort: a
    # 2M-element bool gather from the mask table costs ~18 ms.
    offsets = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = offsets[1:] - offsets[:-1]
    kept_counts = jnp.minimum(counts, align * max_chunks)
    if tile_mask is not None:
        masked_on = tile_mask.reshape(-1).astype(bool)
        kept_counts = jnp.where(masked_on, kept_counts, 0)
    padded = ((kept_counts + align - 1) // align) * align
    poffs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )
    poffs = jnp.minimum(poffs, entry_cap)

    # GATHER-based layout: for each output slot, find its tile by counting
    # tile boundaries at or before it — a 3k-element scatter + a cumsum.
    # (searchsorted over entry_cap queries costs ~100 ms of serialized
    # gathers; scatters of a few thousand elements are cheap.) Per-tile
    # fields ride one stacked take, like the emission above.
    o = jnp.arange(entry_cap, dtype=jnp.int32)
    boundary = jnp.zeros(entry_cap + 1, jnp.int32).at[poffs[1:]].add(
        1, mode="drop")
    t_of_o = jnp.cumsum(boundary[:entry_cap])
    t_safe = jnp.clip(t_of_o, 0, num_tiles - 1)
    ttab = jnp.take(jnp.stack([poffs[:num_tiles], kept_counts,
                               offsets[:num_tiles]]), t_safe, axis=1)
    rank = o - ttab[0]
    valid = (t_of_o < num_tiles) & (rank < ttab[1])
    src = jnp.where(valid, ttab[2] + rank, 0)
    point_list = jnp.take(sorted_id, src)
    entry_tile = jnp.where(valid, t_safe, num_tiles)
    block_starts = jnp.arange(entry_cap // align, dtype=jnp.int32) * align
    bt = entry_tile[block_starts]
    block_tile = jnp.where(bt < num_tiles, bt, -1).astype(jnp.int32)

    num_entries = jnp.sum(valid.astype(jnp.int32))
    # truncation by the per-tile chunk cap (masked-off tiles are "not
    # rendered", not dropped) + overflow of the global entry budget
    trunc = counts - kept_counts
    if tile_mask is not None:
        trunc = jnp.where(masked_on, trunc, 0)
    dropped = (
        jnp.sum(jnp.where(gauss_valid, jnp.maximum(area - R, 0), 0),
                dtype=jnp.int32)
        + jnp.maximum(total - slot_cap, 0)
        + jnp.sum(trunc, dtype=jnp.int32)
        + (jnp.sum(kept_counts, dtype=jnp.int32) - num_entries)
    )
    return Binning(
        point_list=point_list, entry_tile=entry_tile, entry_valid=valid,
        tile_offsets=poffs, block_tile=block_tile,
        num_entries=num_entries, num_blocks=poffs[num_tiles] // align,
        dropped=dropped,
    )
