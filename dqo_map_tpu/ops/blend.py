"""Front-to-back alpha blending with the hit-Gaussian depth model.

This module holds the blending MATH shared by the pure-JAX reference path
(`blend_tiles_ref`, used on CPU/tests) and the Pallas TPU kernel
(`blend_pallas.py`). It re-derives `renderCUDA_withMask`
(`cuda_rasterizer/forward.cu:638-866`) as a data-parallel recurrence:

  the sequential per-pixel loop over depth-sorted Gaussians becomes an
  exclusive cumulative product of (1 - alpha) along the sorted axis, after
  which color accumulation is a (pixels x entries) @ (entries x channels)
  matmul, the "first splat with alpha >= opaque_threshold" hit selection is a
  first-true mask, and the per-Gaussian n_touched counters are row sums.

Early termination (`test_T < T_threshold` -> done) needs no special handling:
test_T is non-increasing along the sorted axis, so the contribution mask
`test_T >= T_threshold` reproduces the sequential semantics exactly.

One intentional deviation: the background term uses end_T instead of the
loop-exit T. Every shipped config uses bg = 0 (`SLAM/render.py:36`), where
the two are identical.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


class BlendParams(NamedTuple):
    opaque_threshold: float
    depth_threshold: float
    normal_threshold: float   # already cos(deg)
    T_threshold: float


class PixelState(NamedTuple):
    """Per-pixel blending state carried across entry chunks."""
    logT: jnp.ndarray          # (n,) log transmittance so far
    color: jnp.ndarray         # (n,3)
    weight_sum: jnp.ndarray    # (n,)
    end_T: jnp.ndarray         # (n,) test_T after last contributor
    best_w: jnp.ndarray        # (n,) max color weight so far
    best_id: jnp.ndarray       # (n,) int32 gaussian id of max color weight
    hit_found: jnp.ndarray     # (n,) bool
    hit_id: jnp.ndarray        # (n,) int32
    hit_depth: jnp.ndarray     # (n,)
    hit_depth_weight: jnp.ndarray  # (n,)
    hit_normal: jnp.ndarray    # (n,3) camera-frame normal of the hit entry
    crossed: jnp.ndarray       # (n,) bool — background surface passed


def init_pixel_state(n: int, dtype=jnp.float32) -> PixelState:
    return PixelState(
        logT=jnp.zeros((n,), dtype),
        color=jnp.zeros((n, 3), dtype),
        weight_sum=jnp.zeros((n,), dtype),
        end_T=jnp.ones((n,), dtype),
        best_w=jnp.full((n,), -1.0, dtype),
        best_id=jnp.full((n,), -1, jnp.int32),
        hit_found=jnp.zeros((n,), bool),
        hit_id=jnp.full((n,), -1, jnp.int32),
        hit_depth=jnp.zeros((n,), dtype),
        hit_depth_weight=jnp.zeros((n,), dtype),
        hit_normal=jnp.zeros((n, 3), dtype),
        crossed=jnp.zeros((n,), bool),
    )


def blend_chunk(state: PixelState, feats: dict, pix_xy: jnp.ndarray,
                ray: jnp.ndarray, params: BlendParams, bg_surface=None):
    """Blend one chunk of K depth-sorted entries over n pixels.

    feats: xy(K,2) conic(K,3) opacity(K,) color(K,3) depth(K,) mean_c(K,3)
           normal_c(K,3) scale_max(K,) gauss_id(K,)int32 valid(K,)bool
    pix_xy: (n,2) float pixel coords; ray: (n,3) unit rays (camera frame).
    Returns (new_state, n_touched_chunk (K,) int32).

    `bg_surface` (optional) composites a frozen per-pixel BACKGROUND
    SURFACE at its true depth: {"S": (n,3) premultiplied splat color,
    "D": (n,) surface depth, "tau": (n,) transmittance}. Equivalent to
    inserting one virtual entry of alpha 1-tau and color S/(1-tau) at
    depth D into the sorted stream: entries in front blend normally, the
    surface contributes S * T(front), entries behind are attenuated by
    tau. This is the depth-aware stable-background model of the compact
    local optimize (an all-in-front composite misorders occlusion and
    measured ~2 dB worse).
    """
    K = feats["xy"].shape[0]
    dx = feats["xy"][:, 0:1] - pix_xy[None, :, 0]          # (K,n)
    dy = feats["xy"][:, 1:2] - pix_xy[None, :, 1]
    cx = feats["conic"][:, 0:1]
    cb = feats["conic"][:, 1:2]
    cc = feats["conic"][:, 2:3]
    power = -0.5 * (cx * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    og = feats["opacity"][:, None] * G
    # straight-through 0.99 clamp: the CUDA backward ignores the clamp's
    # gradient gate (backward.cu:948,985-996), so we mirror that here to keep
    # ref-path autodiff identical to the Pallas custom VJP.
    alpha_raw = og + jax.lax.stop_gradient(jnp.minimum(ALPHA_MAX, og) - og)
    skip = (power > 0.0) | (alpha_raw < ALPHA_MIN) | (~feats["valid"][:, None])
    alpha = jnp.where(skip, 0.0, alpha_raw)

    log1m = jnp.log1p(-alpha)
    cum_incl = state.logT[None, :] + jnp.cumsum(log1m, axis=0)  # log T after k
    test_T = jnp.exp(cum_incl)
    T_prev = jnp.exp(cum_incl - log1m)
    contrib = (~skip) & (test_T >= params.T_threshold)
    w = jnp.where(contrib, alpha * T_prev, 0.0)                 # (K,n)

    crossed = state.crossed
    if bg_surface is not None:
        behind = (feats["depth"][:, None] > bg_surface["D"][None, :]) \
            & feats["valid"][:, None]                           # (K,n)
        tau_b = bg_surface["tau"][None, :]
        # behind-surface entries see the TRUE transmittance test_T*tau —
        # the global render's early termination cuts them there
        w = jnp.where(behind & (test_T * tau_b < params.T_threshold),
                      0.0, w * jnp.where(behind, tau_b, 1.0))
        # T over the FRONT entries only (behind entries excluded; invalid
        # lanes carry alpha 0 and are harmless either way)
        T_front = jnp.exp(state.logT
                          + jnp.sum(jnp.where(behind, 0.0, log1m), axis=0))
        has_behind = jnp.any(behind, axis=0)
        new_cross = (~crossed) & has_behind
        surface = jnp.where(new_cross[:, None],
                            bg_surface["S"] * T_front[:, None], 0.0)
        crossed = crossed | has_behind
    else:
        surface = 0.0

    color = state.color + surface + jnp.einsum(
        "kn,kc->nc", w, feats["color"],
        precision=jax.lax.Precision.HIGHEST)
    weight_sum = state.weight_sum + w.sum(axis=0)

    # max-color-weight contributor (strict >, so earliest max wins)
    chunk_best_w = jnp.max(w, axis=0)
    chunk_best_k = jnp.argmax(w, axis=0)
    chunk_best_id = feats["gauss_id"][chunk_best_k]
    take = chunk_best_w > state.best_w
    best_w = jnp.where(take, chunk_best_w, state.best_w)
    best_id = jnp.where(take & (chunk_best_w > 0), chunk_best_id, state.best_id)

    # end_T: smallest contributing test_T so far
    chunk_end = jnp.min(jnp.where(contrib, test_T, jnp.inf), axis=0)
    end_T = jnp.minimum(state.end_T, chunk_end)

    # hit-Gaussian depth model (ref forward.cu:779-810)
    eligible = (~skip) & (alpha_raw >= params.opaque_threshold)
    first = eligible & (jnp.cumsum(eligible.astype(jnp.int32), axis=0) == 1)
    chunk_has = jnp.any(eligible, axis=0)

    ndm = jnp.sum(feats["normal_c"] * feats["mean_c"], axis=-1)      # (K,)
    ndr = feats["normal_c"] @ ray.T                                   # (K,n)
    t = ndm[:, None] / (ndr + 1e-8)
    hit_z = t * ray[None, :, 2]
    depth_dist = jnp.abs(hit_z - feats["mean_c"][:, 2:3])
    angle_dist = jnp.abs(ndr)
    plane_ok = (depth_dist <= feats["scale_max"][:, None] * params.depth_threshold) & (
        angle_dist >= params.normal_threshold
    )
    depth_cand = jnp.where(plane_ok, hit_z, feats["depth"][:, None])

    fsel = first.astype(jnp.float32)
    sel_depth = jnp.sum(fsel * depth_cand, axis=0)
    sel_w = jnp.sum(fsel * alpha * T_prev, axis=0)
    sel_id = jnp.sum(first.astype(jnp.int32) * (feats["gauss_id"][:, None] + 1), axis=0) - 1
    # hit normal (camera frame), differentiable through normal_c only — the
    # hit selection is integer-valued (naturally stop-gradient), matching the
    # Pallas VJP's analytic routing of normal cotangents to the hit entry
    sel_normal = jnp.einsum("kn,kc->nc", jax.lax.stop_gradient(fsel),
                            feats["normal_c"],
                            precision=jax.lax.Precision.HIGHEST)

    new_hit = (~state.hit_found) & chunk_has
    hit_found = state.hit_found | chunk_has
    hit_id = jnp.where(new_hit, sel_id, state.hit_id)
    hit_depth = jnp.where(new_hit, sel_depth, state.hit_depth)
    hit_depth_weight = jnp.where(new_hit, sel_w, state.hit_depth_weight)
    hit_normal = jnp.where(new_hit[:, None], sel_normal, state.hit_normal)

    n_touched = jnp.sum(contrib & (test_T > 0.5), axis=1).astype(jnp.int32)

    new_state = PixelState(
        logT=state.logT + jnp.sum(log1m, axis=0),
        color=color, weight_sum=weight_sum, end_T=end_T,
        best_w=best_w, best_id=best_id, hit_found=hit_found, hit_id=hit_id,
        hit_depth=hit_depth, hit_depth_weight=hit_depth_weight,
        hit_normal=hit_normal, crossed=crossed,
    )
    return new_state, n_touched


def gather_entry_feats(point_list, valid_entries, xy, conic, opacity, color,
                       depth, mean_c, normal_c, scale_max):
    """Gather per-gaussian arrays into sorted entry order."""
    g = point_list
    return {
        "xy": xy[g],
        "conic": conic[g],
        "opacity": opacity[g],
        "color": color[g],
        "depth": depth[g],
        "mean_c": mean_c[g],
        "normal_c": normal_c[g],
        "scale_max": scale_max[g],
        "gauss_id": g.astype(jnp.int32),
        "valid": valid_entries,
    }


def blend_tiles_ref(feats: dict, entry_tile: jnp.ndarray, num_tiles: int,
                    tile_size: int, width: int, height: int, K: jnp.ndarray,
                    params: BlendParams, bg: jnp.ndarray,
                    tile_offsets: jnp.ndarray = None, window: int = None,
                    bg_surface_maps: dict = None):
    """Pure-JAX tile loop (reference/CPU path; the TPU fast path is the
    Pallas kernel).

    Without `tile_offsets` every tile scans ALL entries with a tile mask —
    O(T x L). With `tile_offsets` (the binning's aligned per-tile starts)
    each tile scans only a `window`-entry slice starting at its own offset
    (entries are laid out contiguously per tile), cutting the CPU cost by
    L/window; out-of-tile entries inside a clamped window are masked.
    Returns dict of (H,W,…) maps + n_touched per entry (L,).
    """
    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    n = tile_size * tile_size
    L = entry_tile.shape[0]
    win = min(L, window) if (tile_offsets is not None and window) else L

    @jax.checkpoint
    def one_tile(t):
        # rematerialized: under value_and_grad the (K, n) per-tile
        # intermediates would otherwise all be saved as residuals — at
        # entry_cap 32k x 80 tiles that is a ~180 GB arena on CPU (observed).
        # Recomputing the tile blend in the backward keeps the ref path's
        # grad memory at one tile's working set.
        ty = t // TW
        tx = t % TW
        px = (tx * tile_size + jnp.arange(tile_size, dtype=jnp.int32))[None, :]
        py = (ty * tile_size + jnp.arange(tile_size, dtype=jnp.int32))[:, None]
        px = jnp.broadcast_to(px, (tile_size, tile_size)).reshape(-1)
        py = jnp.broadcast_to(py, (tile_size, tile_size)).reshape(-1)
        pix_xy = jnp.stack([px, py], -1).astype(jnp.float32)
        ray = jnp.stack(
            [(px - cx) / fx, (py - cy) / fy, jnp.ones((n,), jnp.float32)], -1
        )
        ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

        if win < L:
            start = jnp.minimum(tile_offsets[t], L - win)
            tile_feats = {
                k: jax.lax.dynamic_slice_in_dim(v, start, win, 0)
                for k, v in feats.items()
            }
            et = jax.lax.dynamic_slice_in_dim(entry_tile, start, win, 0)
        else:
            start = jnp.int32(0)
            tile_feats = dict(feats)
            et = entry_tile
        tile_feats["valid"] = tile_feats["valid"] & (et == t)
        state = init_pixel_state(n)
        bg_sf = None
        if bg_surface_maps is not None:
            pyc = jnp.clip(py, 0, height - 1)
            pxc = jnp.clip(px, 0, width - 1)
            bg_sf = {
                "S": bg_surface_maps["S"][pyc, pxc],
                "D": bg_surface_maps["D"][pyc, pxc],
                "tau": bg_surface_maps["tau"][pyc, pxc],
            }
        state, n_touched = blend_chunk(state, tile_feats, pix_xy, ray,
                                       params, bg_surface=bg_sf)
        T_fin = jnp.exp(state.logT)
        out_color = state.color + state.end_T[:, None] * bg[None, :]
        if bg_sf is not None:
            # surface never crossed inside the entry stream: it sits behind
            # everything — composite it at the end with the final T
            out_color = out_color + jnp.where(
                state.crossed[:, None], 0.0, bg_sf["S"] * T_fin[:, None])
        return (
            out_color, state.hit_depth, state.hit_id, state.best_id,
            state.best_w, state.hit_depth_weight, state.end_T,
            state.weight_sum, state.hit_normal, T_fin,
        ), (n_touched, start)

    outs, (n_touched_tiles, starts) = jax.lax.map(
        one_tile, jnp.arange(num_tiles, dtype=jnp.int32))
    if win < L:
        pos = starts[:, None] + jnp.arange(win)[None, :]
        n_touched = jnp.zeros((L,), jnp.int32).at[pos.reshape(-1)].add(
            n_touched_tiles.reshape(-1), mode="drop")
    else:
        n_touched = n_touched_tiles.sum(axis=0)

    def untile(x, ch=None):
        shape = (TH, TW, tile_size, tile_size) + ((ch,) if ch else ())
        x = x.reshape(shape)
        x = jnp.moveaxis(x, 2, 1).reshape(
            (TH * tile_size, TW * tile_size) + ((ch,) if ch else ())
        )
        return x[:height, :width]

    (color, depth, hit_id, best_id, best_w, hdw, end_T, wsum, hnorm,
     t_fin) = outs
    return {
        "render": untile(color, 3),
        "depth": untile(depth),
        "depth_index_map": untile(hit_id),
        "color_index_map": untile(best_id),
        "color_hit_weight": untile(jnp.maximum(best_w, 0.0)),
        "depth_hit_weight": untile(hdw),
        "T_map": untile(end_T),
        "weight_sum": untile(wsum),
        "T_final": untile(t_fin),
        "normal_c": untile(hnorm, 3),
        "n_touched_entries": n_touched,
    }
