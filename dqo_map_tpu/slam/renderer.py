"""Renderer facade over the TPU rasterizer.

API twin of `SLAM/render.py::Renderer`: holds the render thresholds from the
config and exposes `render(camera, map_state, subset, tile_mask)` returning
the reference's output dict (render/depth/normal/index maps/hit weights/
T_map/n_touched).
"""

from __future__ import annotations

import math
from typing import Optional

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
            sh_degree=args.active_sh_degree,
        )

    def render(self, cam_inputs: dict, state: MapState, subset: str = "global",
               tile_mask: Optional[jnp.ndarray] = None,
               colors_precomp: Optional[jnp.ndarray] = None) -> dict:
        return render_state(state, cam_inputs, self.settings, subset,
                            tile_mask, colors_precomp)


def subset_mask(state: MapState, subset: str) -> jnp.ndarray:
    if subset == "global":
        return state.status != 0
    if subset == "unstable":
        return state.status == UNSTABLE
    if subset == "stable":
        return state.status == STABLE
    raise ValueError(subset)


def render_state(state: MapState, cam_inputs: dict, settings: RenderSettings,
                 subset: str = "global",
                 tile_mask: Optional[jnp.ndarray] = None,
                 colors_precomp: Optional[jnp.ndarray] = None) -> dict:
    valid = subset_mask(state, subset)
    colors = (colors_precomp if colors_precomp is not None else eval_colors(
        state.sh, state.xyz, cam_inputs["cam_pos"], settings.sh_degree))
    return rasterize(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity(), colors, cam_inputs, settings,
        tile_mask=tile_mask, normal_w=state.get_normal(), valid_mask=valid,
    )
