"""Tile binning: dense cell enumeration + device sort + aligned range layout.

TPU-native replacement for the CUDA pipeline `duplicateWithKeys` -> cub radix
sort -> `identifyTileRanges` -> host-side `tile_indices` compaction
(`rasterizer_impl.cu:104-146,347-439`).

v2 design (chain-difference profiled on v5e; v1's gather-based slot emission
cost ~50 ms at office0 scale because TPU gathers run ~12 ms per million
indices, while `lax.sort` of 2M keys is only ~3 ms):

- Slots live as a DENSE (R, P) grid — gaussian index on the well-tiled lane
  axis, rect-cell rank on sublanes. Every per-gaussian field BROADCASTS
  (zero gathers); cell coordinates decompose from the rank with exact f32
  arithmetic (R < 32).
- Rects come from the TIGHT per-axis extents of the alpha>=1/255 support
  (`Preprocessed.ext`), intersected with the reference's 3-sigma circle
  rect, and each cell is tested EXACTLY against the conic: the minimum of
  the Mahalanobis quadratic over the cell's pixel box is computed in closed
  form, and cells whose minimum exceeds ln(255) are culled. Those cells
  cannot contain any pixel with alpha >= 1/255 (opacity <= 1), i.e. the
  blend kernel would skip every pixel of them (`forward.cu:771`), so
  culling is bit-exact — it just stops paying sort/pack/blend for entries
  that contribute nothing. Empirically this removes ~35-60% of entries.
- Invalid/culled slots sort to the end via a sentinel key; keys fuse
  tile|quantized-depth into one uint32 when the grid fits 12 bits.
- After the sort, entries are laid out CHUNK-ALIGNED per tile and capped at
  a static `entry_cap` via GATHERS with MONOTONIC indices (fast path on
  TPU), exactly as v1.

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
CULL_TAU = 5.5413     # ln(255): Q_min > tau  =>  alpha < 1/255 everywhere


class Binning(NamedTuple):
    point_list: jnp.ndarray    # (entry_cap,) int32 gaussian index per slot
    entry_tile: jnp.ndarray    # (entry_cap,) int32 tile id (sentinel = T)
    entry_valid: jnp.ndarray   # (entry_cap,) bool
    tile_offsets: jnp.ndarray  # (T+1,) int32, ALIGNED starts into point_list
    block_tile: jnp.ndarray    # (entry_cap/align,) int32 tile per block (-1 unused)
    num_entries: jnp.ndarray   # () int32 valid entries kept
    demand: jnp.ndarray        # () int32 UNCLIPPED aligned layout size
                               #    (valid entries + per-tile CHUNK padding)
                               #    — the exact entry_cap the ladder must
                               #    cover to avoid budget drops
    num_blocks: jnp.ndarray    # () int32 align-sized blocks actually used
    dropped: jnp.ndarray       # () int32 GLOBAL entry-budget losses — the
                               #    entry-cap ladder's signal; must stay 0
    tile_dropped: jnp.ndarray  # () int32 per-tile chunk-cap losses (the
                               #    FARTHEST entries of overfull tiles;
                               #    raise max_chunks_per_tile) — reported
                               #    separately so budget ladders don't grow
                               #    on tile congestion
    clipped: jnp.ndarray       # () int32 upper bound of rect cells clipped
                               #    by the per-gaussian R window (most would
                               #    have been conic-culled; centered window
                               #    keeps the high-alpha cells)


def tile_grid_size(width: int, height: int, tile_size: int):
    return (height + tile_size - 1) // tile_size, (width + tile_size - 1) // tile_size


def _cell_qmin(lx, ux, ly, uy, Ca, Cb, Cc):
    """Exact min of Q(d) = 0.5(Ca dx^2 + Cc dy^2) + Cb dx dy over the box
    [lx,ux] x [ly,uy]. For a PD quadratic the min is 0 if the origin is
    inside, else it lies on the boundary; each edge restricts Q to a 1-D
    quadratic whose minimizer is clamped to the edge."""
    def q(dx, dy):
        return 0.5 * (Ca * dx * dx + Cc * dy * dy) + Cb * dx * dy

    inv_c = 1.0 / jnp.where(Cc == 0, 1e-12, Cc)
    inv_a = 1.0 / jnp.where(Ca == 0, 1e-12, Ca)

    def edge_x(X):
        dy = jnp.clip(-Cb * X * inv_c, ly, uy)
        return q(X, dy)

    def edge_y(Y):
        dx = jnp.clip(-Cb * Y * inv_a, lx, ux)
        return q(dx, Y)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(ux)),
        jnp.minimum(edge_y(ly), edge_y(uy)),
    )
    inside = (lx <= 0) & (ux >= 0) & (ly <= 0) & (uy >= 0)
    return jnp.where(inside, 0.0, qmin)


def bin_gaussians(pre: Preprocessed, width: int, height: int, tile_size: int,
                  max_tiles_per_gaussian: int,
                  tile_mask: Optional[jnp.ndarray] = None,
                  align: int = 256, entry_cap: int = 1 << 20,
                  max_chunks: int = 32) -> Binning:
    P = pre.xy.shape[0]
    R = max_tiles_per_gaussian
    assert R < 32
    TH, TW = tile_grid_size(width, height, tile_size)
    num_tiles = TH * TW
    assert entry_cap % align == 0

    xy = jax.lax.stop_gradient(pre.xy)
    ext = jax.lax.stop_gradient(pre.ext)
    conic = jax.lax.stop_gradient(pre.conic)
    depth = jax.lax.stop_gradient(pre.depth)

    # tight tile rect per gaussian (ref `getRect`, auxiliary.h:49-57, but
    # with per-axis extents; xmax/ymax are EXCLUSIVE tile bounds). NOTE the
    # CUDA-style `(v + ts - 1) / ts` upper bound is only correct for integer
    # (ceil'd) radii — with fractional extents it drops a covered boundary
    # tile when floor(v) lands on a tile multiple; the exact exclusive bound
    # of pixel floor(x + ex) is floor((x + ex)/ts) + 1.
    xy_T = xy.T
    ex, ey = ext.T[0], ext.T[1]
    rect_min_x = jnp.clip(jnp.floor((xy_T[0] - ex) / tile_size), 0, TW).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((xy_T[1] - ey) / tile_size), 0, TH).astype(jnp.int32)
    rect_max_x = jnp.clip(
        jnp.floor((xy_T[0] + ex) / tile_size) + 1, 0, TW
    ).astype(jnp.int32)
    rect_max_y = jnp.clip(
        jnp.floor((xy_T[1] + ey) / tile_size) + 1, 0, TH
    ).astype(jnp.int32)
    rw = jnp.maximum(rect_max_x - rect_min_x, 0)
    rh = jnp.maximum(rect_max_y - rect_min_y, 0)
    area = rw * rh
    gauss_valid = pre.valid & (area > 0) & (ex > 0)

    # Over-R rects keep a CENTERED sub-window instead of the first R cells
    # in row-major order (which silently discarded every bottom row of a
    # wide gaussian). The clipped ring is the far-from-center part the
    # conic cull would mostly remove anyway; `clipped` reports the upper
    # bound of cells lost this way, separately from hard `dropped` losses.
    over = area > R
    s = jnp.sqrt(R / jnp.maximum(area.astype(jnp.float32), 1.0))
    rw2 = jnp.clip(jnp.floor(rw.astype(jnp.float32) * s), 1, rw).astype(jnp.int32)
    rh2 = jnp.clip(R // jnp.maximum(rw2, 1), 1, jnp.maximum(rh, 1))
    rw2 = jnp.clip(R // jnp.maximum(rh2, 1), 1, jnp.maximum(rw, 1))
    cx0 = jnp.clip(jnp.floor(xy_T[0] / tile_size).astype(jnp.int32),
                   rect_min_x, rect_max_x - 1)
    cy0 = jnp.clip(jnp.floor(xy_T[1] / tile_size).astype(jnp.int32),
                   rect_min_y, rect_max_y - 1)
    ox = jnp.clip(cx0 - rw2 // 2, rect_min_x, rect_max_x - rw2)
    oy = jnp.clip(cy0 - rh2 // 2, rect_min_y, rect_max_y - rh2)
    rw_e = jnp.where(over, rw2, rw)
    rh_e = jnp.where(over, rh2, rh)
    ox = jnp.where(over, ox, rect_min_x)
    oy = jnp.where(over, oy, rect_min_y)
    area_k = jnp.where(gauss_valid,
                       jnp.minimum(rw_e * rh_e, R), 0)

    # --- dense (R, P) cell enumeration: zero gathers, pure broadcasting ---
    jj = jax.lax.broadcasted_iota(jnp.int32, (R, P), 0)
    rw_f = jnp.maximum(rw_e, 1).astype(jnp.float32)[None, :]
    # exact small-int div: jj < 32 and f32 division is correctly rounded
    ty = jnp.floor(jj.astype(jnp.float32) / rw_f).astype(jnp.int32)
    tx = jj - ty * rw_e[None, :]
    cellx = ox[None, :] + tx
    celly = oy[None, :] + ty
    enum_ok = jj < area_k[None, :]

    # exact per-cell cull: pixel centers of cell (cx,cy) span
    # [cx*ts, cx*ts + ts-1]; Q_min over that box > tau -> every pixel has
    # alpha < 1/255 -> the blend kernel would skip all of them.
    lx = cellx.astype(jnp.float32) * tile_size - xy_T[0][None, :]
    ux = lx + (tile_size - 1)
    ly = celly.astype(jnp.float32) * tile_size - xy_T[1][None, :]
    uy = ly + (tile_size - 1)
    c_T = conic.T
    qmin = _cell_qmin(lx, ux, ly, uy, c_T[0][None, :], c_T[1][None, :],
                      c_T[2][None, :])
    keep = enum_ok & (qmin <= CULL_TAU)

    tile_id = celly * TW + cellx
    tile_key = jnp.where(keep, tile_id, num_tiles)
    gauss_id = jax.lax.broadcasted_iota(jnp.int32, (R, P), 1).reshape(-1)

    fused_key = num_tiles < (1 << 12)
    if fused_key:
        # fused single-u32 key: tile(12b) | quantized depth(19b). The CUDA
        # reference packs exact f32 depth bits into a 64-bit key; 0.2 mm
        # ordering resolution is far below any visible difference.
        dq = jnp.clip(depth * (1.0 / DEPTH_RANGE), 0.0, 1.0)
        dq = (dq * ((1 << DEPTH_BITS) - 1)).astype(jnp.uint32)
        key = ((tile_key.astype(jnp.uint32) << DEPTH_BITS)
               | jnp.broadcast_to(dq[None, :], (R, P))).reshape(-1)
        sorted_key, sorted_id = jax.lax.sort((key, gauss_id), num_keys=1)
        sorted_tile = (sorted_key >> DEPTH_BITS).astype(jnp.int32)
    else:
        depth_key = jnp.broadcast_to(depth[None, :], (R, P)).reshape(-1)
        sorted_tile, _, sorted_id = jax.lax.sort(
            (tile_key.reshape(-1), depth_key, gauss_id), num_keys=2
        )

    # per-tile ranges in sort space, then the CHUNK-aligned capped layout.
    # tile_mask is applied HERE, per tile (free), not per slot pre-sort: a
    # multi-million-element bool gather from the mask table is the expensive
    # v1 mistake in reverse.
    slot_cap = R * P
    offsets = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = offsets[1:] - offsets[:-1]
    kept_counts = jnp.minimum(counts, align * max_chunks)
    if tile_mask is not None:
        masked_on = tile_mask.reshape(-1).astype(bool)
        kept_counts = jnp.where(masked_on, kept_counts, 0)
    padded = ((kept_counts + align - 1) // align) * align
    demand = jnp.sum(padded, dtype=jnp.int32)
    poffs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )
    poffs = jnp.minimum(poffs, entry_cap)

    # GATHER-based layout with monotonic indices: for each output slot, find
    # its tile by counting tile boundaries at or before it (boundary scatter
    # of a few thousand elements + cumsum). Per-tile fields ride one stacked
    # take.
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
    point_list = jnp.take(sorted_id, jnp.minimum(src, slot_cap - 1))
    entry_tile = jnp.where(valid, t_safe, num_tiles)
    block_starts = jnp.arange(entry_cap // align, dtype=jnp.int32) * align
    bt = entry_tile[block_starts]
    block_tile = jnp.where(bt < num_tiles, bt, -1).astype(jnp.int32)

    num_entries = jnp.sum(valid.astype(jnp.int32))
    # truncation receipts: (a) rect cells beyond the per-gaussian cap R — an
    # UPPER bound: some of those cells would have been culled anyway;
    # (b) per-tile chunk-cap truncation (masked-off tiles are "not
    # rendered", not dropped); (c) global entry-budget overflow.
    trunc = counts - kept_counts
    if tile_mask is not None:
        trunc = jnp.where(masked_on, trunc, 0)
    tile_dropped = jnp.sum(trunc, dtype=jnp.int32)
    dropped = jnp.sum(kept_counts, dtype=jnp.int32) - num_entries
    clipped = jnp.sum(
        jnp.where(gauss_valid, jnp.maximum(area - area_k, 0), 0),
        dtype=jnp.int32)
    return Binning(
        point_list=point_list, entry_tile=entry_tile, entry_valid=valid,
        tile_offsets=poffs, block_tile=block_tile,
        num_entries=num_entries, demand=demand,
        num_blocks=poffs[num_tiles] // align,
        dropped=dropped, tile_dropped=tile_dropped, clipped=clipped,
    )
