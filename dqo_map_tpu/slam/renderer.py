"""Renderer facade over the TPU rasterizer.

API twin of `SLAM/render.py::Renderer`: holds the render thresholds from the
config and exposes `render(camera, map_state, subset, tile_mask)` returning
the reference's output dict (render/depth/normal/index maps/hit weights/
T_map/n_touched).

Bucketed compaction: the MapState is a fixed-capacity array with dead slots;
binning/sorting all `capacity` slots would dominate once capacity >> alive.
`render_state(..., bucket=N)` first compacts the requested subset into a
static-size bucket via `jnp.nonzero(size=...)` so every downstream cost
(SH eval, EWA preprocess, the (P x 16)-entry sort, gathers) scales with the
live map, while index maps are translated back to GLOBAL slot ids so
consumers (error accumulation, attach, normal scatter) are unaffected.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gaussian_map import MapState, STABLE, UNSTABLE
from ..ops.rasterize import RenderSettings, eval_colors, rasterize


class Renderer:
    def __init__(self, args, width: int, height: int):
        self.settings = RenderSettings(
            width=width, height=height,
            opaque_threshold=args.renderer_opaque_threshold,
            depth_threshold=args.renderer_depth_threshold,
            normal_threshold_cos=float(
                math.cos(math.radians(args.renderer_normal_threshold))),
            color_sigma=args.color_sigma,
            T_threshold=args.T_threshold,
            tile_size=args.tile_size,
            max_tiles_per_gaussian=args.max_tiles_per_gaussian,
            entry_cap=int(getattr(args, "entry_cap", 1 << 20)),
            entries_per_gaussian=int(getattr(args, "entries_per_gaussian", 6)),
            max_chunks_per_tile=int(getattr(args, "max_chunks_per_tile", 32)),
            sh_degree=args.active_sh_degree,
        )

    def render(self, cam_inputs: dict, state: MapState, subset: str = "global",
               tile_mask: Optional[jnp.ndarray] = None,
               bucket: Optional[int] = None) -> dict:
        return render_state(state, cam_inputs, self.settings, subset,
                            tile_mask, bucket=bucket)


def palette_color(ids: jnp.ndarray) -> jnp.ndarray:
    """Deterministic id -> RGB in [0,1]; id < 0 renders black.

    Used for the object-ID / instance passes (ref `Renderer.render` extra
    color passes, SLAM/render.py:227-266 — the reference rasterizes
    per-gaussian semantic/instance colors with the same geometry)."""
    i = ids.astype(jnp.uint32)
    h = i * jnp.uint32(2654435761)
    r = ((h >> 0) & 255).astype(jnp.float32) / 255.0
    g = ((h >> 8) & 255).astype(jnp.float32) / 255.0
    b = ((h >> 16) & 255).astype(jnp.float32) / 255.0
    rgb = jnp.stack([r, g, b], -1) * 0.85 + 0.15
    return jnp.where((ids >= 0)[:, None], rgb, 0.0)


def render_color_pass(state: MapState, cam_inputs: dict,
                      settings: RenderSettings, colors: jnp.ndarray,
                      subset: str = "global",
                      bucket: Optional[int] = None) -> jnp.ndarray:
    """Rasterize arbitrary per-gaussian colors with the map's geometry
    (semantic / instance / object-ID passes). Geometry is stop-gradient:
    these passes never train shape, matching the reference's extra passes."""
    out = render_state(
        jax.tree.map(jax.lax.stop_gradient, state), cam_inputs, settings,
        subset, colors_precomp=colors, bucket=bucket)
    return out["render"]


def render_instance(state: MapState, cam_inputs: dict,
                    settings: RenderSettings,
                    bucket: Optional[int] = None) -> jnp.ndarray:
    """Object-instance image: per-gaussian obj_id through the palette."""
    return render_color_pass(state, cam_inputs, settings,
                             palette_color(state.obj_id), bucket=bucket)


def render_semantic(state: MapState, cam_inputs: dict,
                    settings: RenderSettings, categories: jnp.ndarray,
                    bucket: Optional[int] = None) -> jnp.ndarray:
    """Semantic (category-color) image: obj_id -> category -> palette.

    `categories` is the (MAX_OBJECTS,) int32 category table from the object
    layer; gaussians without an object render black."""
    n = categories.shape[0]
    oid = state.obj_id
    cat = jnp.where((oid >= 0) & (oid < n),
                    categories[jnp.clip(oid, 0, n - 1)], -1)
    return render_color_pass(state, cam_inputs, settings, palette_color(cat),
                             bucket=bucket)


def subset_mask(state: MapState, subset: str) -> jnp.ndarray:
    if subset == "global":
        return state.status != 0
    if subset == "unstable":
        return state.status == UNSTABLE
    if subset == "stable":
        return state.status == STABLE
    raise ValueError(subset)


def compute_binning_state(state: MapState, cam_inputs: dict,
                          settings: RenderSettings, subset: str = "global",
                          tile_mask: Optional[jnp.ndarray] = None,
                          bucket: Optional[int] = None):
    """Tile binning for a MapState subset, reusable across renders of the
    same camera (pass to `render_state(..., binning=...)`). Uses the same
    bucket-prefix slicing as `render_state`, so slot indices line up."""
    from ..ops.rasterize import compute_binning
    valid = subset_mask(state, subset)
    cap = state.capacity
    if bucket is not None and bucket < cap:
        return compute_binning(
            state.xyz[:bucket], state.get_scaling()[:bucket],
            state.get_rotation()[:bucket], cam_inputs, settings,
            tile_mask=tile_mask, valid_mask=valid[:bucket])
    return compute_binning(
        state.xyz, state.get_scaling(), state.get_rotation(), cam_inputs,
        settings, tile_mask=tile_mask, valid_mask=valid)


def coverage_mask_state(state: MapState, cam_inputs: dict,
                        settings: RenderSettings, subset: str = "unstable",
                        bucket: Optional[int] = None):
    """(TH, TW) projection-coverage tile mask for a MapState subset (the
    sort-free replacement for the local-optimize transmission range renders,
    ref `evaluate_render_range` mapper.py:930-988)."""
    from ..ops.rasterize import coverage_tile_mask
    valid = subset_mask(state, subset)
    if bucket is not None and bucket < state.capacity:
        return coverage_tile_mask(
            state.xyz[:bucket], state.get_scaling()[:bucket],
            state.get_rotation()[:bucket], cam_inputs, settings,
            valid_mask=valid[:bucket])
    return coverage_tile_mask(state.xyz, state.get_scaling(),
                              state.get_rotation(), cam_inputs, settings,
                              valid_mask=valid)


def render_state(state: MapState, cam_inputs: dict, settings: RenderSettings,
                 subset: str = "global",
                 tile_mask: Optional[jnp.ndarray] = None,
                 colors_precomp: Optional[jnp.ndarray] = None,
                 bucket: Optional[int] = None,
                 with_n_touched: bool = False,
                 binning=None, bg_maps: Optional[dict] = None,
                 bg_tiled=None, tiled: bool = False) -> dict:
    """Render a MapState subset.

    `bucket` is a STATIC PREFIX length: `add_points` packs alive slots below
    the `count` watermark, so slicing [0:bucket] (free under XLA) replaces
    the earlier nonzero+gather compaction — which cost a large gather on
    every render and a scatter in every gradient render. Slot ids in the
    index maps are global by construction. Dead holes inside the prefix are
    culled by the rasterizer's valid mask; the host compacts when holes
    accumulate (`Mapping._update_bucket`).

    with_n_touched defaults OFF (the entries->gaussian scatter costs ~10 ms
    at full cap and only the USE_PURNE prune path reads it). Depth is always
    differentiable — the Pallas VJP routes the depth cotangent in-kernel.
    """
    valid = subset_mask(state, subset)
    cap = state.capacity
    if bucket is not None and bucket < cap:
        sl = lambda x: x[:bucket]
        from ..utils.math3d import normalize
        sh = sl(state.sh)
        xyz = sl(state.xyz)
        cp = colors_precomp[:bucket] if colors_precomp is not None else None
        colors = cp if cp is not None else eval_colors(
            sh, xyz, cam_inputs["cam_pos"], settings.sh_degree)
        sub = state._replace(
            xyz=xyz, sh=sh, scaling=sl(state.scaling),
            rotation=sl(state.rotation), opacity=sl(state.opacity),
            confidence=sl(state.confidence), add_tick=sl(state.add_tick),
            depth_err_cnt=sl(state.depth_err_cnt),
            color_err_cnt=sl(state.color_err_cnt),
            frame_id=sl(state.frame_id), obj_id=sl(state.obj_id),
            status=sl(state.status),
        )
        out = rasterize(
            xyz, sub.get_scaling(), sub.get_rotation(), sub.get_opacity(),
            colors, cam_inputs, settings,
            tile_mask=tile_mask,
            valid_mask=sl(valid), with_n_touched=with_n_touched,
            binning=binning, bg_maps=bg_maps, bg_tiled=bg_tiled, tiled=tiled,
        )
        if with_n_touched:
            out["n_touched"] = jnp.zeros(cap, jnp.int32).at[:bucket].set(
                out["n_touched"])
        else:
            out["n_touched"] = jnp.zeros(cap, jnp.int32)
        out["bucket_overflow"] = state.count > bucket
        return out

    colors = (colors_precomp if colors_precomp is not None else eval_colors(
        state.sh, state.xyz, cam_inputs["cam_pos"], settings.sh_degree))
    out = rasterize(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity(), colors, cam_inputs, settings,
        tile_mask=tile_mask, valid_mask=valid,
        with_n_touched=with_n_touched, binning=binning, bg_maps=bg_maps,
        bg_tiled=bg_tiled, tiled=tiled,
    )
    out["bucket_overflow"] = jnp.asarray(False)
    return out
