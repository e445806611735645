"""Public differentiable rasterizer.

API equivalent of `diff_gaussian_rasterization_depth.GaussianRasterizer` +
`SLAM/render.py:134-272`, returning the same map set: color, depth, normal,
color/depth index maps, hit weights, transmittance, n_touched.

Composition (all jittable):
  1. `projection.preprocess`  — differentiable EWA projection (XLA)
  2. `binning.bin_gaussians`  — sort-based tile binning (XLA, stop-grad)
  3. blend                    — Pallas TPU kernel (fast path) or pure-JAX
                                reference. Color/alpha AND hit-depth
                                gradients flow through the blend itself
                                (the Pallas custom VJP routes the depth
                                cotangent to the hit entry analytically,
                                mirroring `backward.cu:997-1065`; the hit
                                index and plane-vs-splat branch are
                                stop-gradient, exactly as in CUDA).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import binning as binning_mod
from .blend import BlendParams, blend_tiles_ref, gather_entry_feats
from .projection import Preprocessed, preprocess


class RenderSettings(NamedTuple):
    width: int
    height: int
    opaque_threshold: float = 0.6
    depth_threshold: float = 1.0
    normal_threshold_cos: float = 0.5       # cos(60 deg)
    color_sigma: float = 3.0
    T_threshold: float = 1e-4
    tile_size: int = 16
    max_tiles_per_gaussian: int = 16
    entry_cap: int = 1 << 20            # static sorted-entry capacity
    entries_per_gaussian: int = 6       # tightens entry_cap to P*this (the
                                        # pack gather + n_touched scatter
                                        # scale with the STATIC cap; typical
                                        # duplication is ~3-4 tiles/gaussian)
    max_chunks_per_tile: int = 32       # kernel grid chunk dimension
    sh_degree: int = 3
    scale_modifier: float = 1.0
    bg: tuple = (0.0, 0.0, 0.0)
    impl: str = "auto"                      # auto | ref | pallas
    chunk: int = 0                          # entries/block + layout align;
                                            # 0 = module default (DQO_CHUNK).
                                            # 128 suits sparse unstable
                                            # scans (~100 entries/tile: 61%
                                            # padding at 256 -> 22% at 128);
                                            # 256 suits dense global renders

    def chunk_(self) -> int:
        from .blend_pallas import CHUNK
        return self.chunk or CHUNK

    @staticmethod
    def from_args(width, height, args) -> "RenderSettings":
        return RenderSettings(
            width=width, height=height,
            opaque_threshold=args.renderer_opaque_threshold,
            depth_threshold=args.renderer_depth_threshold,
            normal_threshold_cos=float(math.cos(math.radians(args.renderer_normal_threshold))),
            color_sigma=args.color_sigma,
            T_threshold=args.T_threshold,
            tile_size=args.tile_size,
            max_tiles_per_gaussian=args.max_tiles_per_gaussian,
            entry_cap=getattr(args, "entry_cap", 1 << 20),
            entries_per_gaussian=getattr(args, "entries_per_gaussian", 6),
            max_chunks_per_tile=getattr(args, "max_chunks_per_tile", 32),
            sh_degree=args.active_sh_degree,
        )


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "ref"


def entry_budget(P_stat: int, settings: RenderSettings):
    """Static (entry_cap, max_chunks) for a P_stat-gaussian render.

    Worst case including per-tile alignment padding, tightened by the
    expected duplication factor (over-cap entries are dropped + counted);
    the budget's alignment allowance is a HALF chunk per tile — the
    expected padding, not the worst case (the pack gather and its scatter
    VJP scale with this static cap). Small scenes keep the exact worst
    case (their cap is cheap; the tight budget would starve them — every
    occupied tile pads a full chunk).
    """
    ck = settings.chunk_()
    TH0, TW0 = binning_mod.tile_grid_size(
        settings.width, settings.height, settings.tile_size)
    worst = P_stat * settings.max_tiles_per_gaussian + TH0 * TW0 * ck
    budget = P_stat * settings.entries_per_gaussian + TH0 * TW0 * (ck // 2)
    budget = max(budget, min(worst, 1 << 16))
    entry_cap = min(settings.entry_cap, worst, budget)
    entry_cap = ((entry_cap + ck - 1) // ck) * ck
    max_chunks = max(1, min(settings.max_chunks_per_tile, entry_cap // ck))
    return entry_cap, max_chunks


@partial(jax.jit, static_argnames=("settings",))
def coverage_tile_mask(means3d: jnp.ndarray, scales: jnp.ndarray,
                       rots: jnp.ndarray, cam: dict,
                       settings: RenderSettings,
                       valid_mask: Optional[jnp.ndarray] = None):
    """Sort-free (TH, TW) tile mask: tiles whose 16x16 rect overlaps ANY
    valid gaussian's projected extent. The per-tile coverage count is a sum
    of rank-1 interval outer products — one (TH, P) x (P, TW) matmul on the
    MXU — so the whole mask costs ~1 ms where a subset render (the previous
    way to get `evaluate_render_range`'s transmission mask, ref
    mapper.py:930-988) paid the full binning sort.

    Superset semantics vs the reference's T-map mask: every tile that could
    receive gradient from a masked gaussian is included (the T!=1 render
    mask additionally drops tiles whose accumulated alpha stayed ~0), which
    only adds tiles whose loss terms have zero gradient w.r.t. the
    optimized subset."""
    H, W = settings.height, settings.width
    ts = settings.tile_size
    TH, TW = binning_mod.tile_grid_size(W, H, ts)
    pre = preprocess(means3d, scales, rots, cam, settings.color_sigma, W, H,
                     settings.scale_modifier)
    valid = pre.valid if valid_mask is None else (pre.valid & valid_mask)
    xy = jax.lax.stop_gradient(pre.xy)
    radius = jnp.where(valid, jax.lax.stop_gradient(pre.radius), -1.0)
    # same rect math as `binning.bin_gaussians` (ref getRect,
    # auxiliary.h:49-57); xmax/ymax are EXCLUSIVE tile bounds
    xmin = jnp.floor((xy[:, 0] - radius) / ts)
    xmax = jnp.floor((xy[:, 0] + radius + ts - 1) / ts)
    ymin = jnp.floor((xy[:, 1] - radius) / ts)
    ymax = jnp.floor((xy[:, 1] + radius + ts - 1) / ts)
    tx = jnp.arange(TW, dtype=jnp.float32)
    ty = jnp.arange(TH, dtype=jnp.float32)
    Ax = ((tx[None, :] >= xmin[:, None]) & (tx[None, :] < xmax[:, None])
          & (radius > 0)[:, None]).astype(jnp.float32)      # (P, TW)
    Ay = ((ty[None, :] >= ymin[:, None])
          & (ty[None, :] < ymax[:, None])).astype(jnp.float32)  # (P, TH)
    cov = jax.lax.dot_general(Ay, Ax, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (TH, TW)
    return (cov > 0.5).astype(jnp.int32)


def gaussian_tile_overlap(pre: "Preprocessed", tile_mask: jnp.ndarray,
                          tile_size: int, TH: int, TW: int) -> jnp.ndarray:
    """(P,) bool: does each valid gaussian's projected rect overlap ANY
    masked-on tile? The transpose of `coverage_tile_mask`'s matmul: with
    Ax (P,TW) / Ay (P,TH) interval indicators and M (TH,TW) the mask,
    hit_p = sum_ty Ay[p,ty] * (M @ Ax^T)[ty,p] > 0 — two MXU matmuls,
    no binning sort. Used to compact the optimize set to gaussians that can
    contribute to (or receive gradient from) the masked tiles."""
    xy = jax.lax.stop_gradient(pre.xy)
    radius = jnp.where(pre.valid, jax.lax.stop_gradient(pre.radius), -1.0)
    ts = tile_size
    xmin = jnp.floor((xy[:, 0] - radius) / ts)
    xmax = jnp.floor((xy[:, 0] + radius + ts - 1) / ts)
    ymin = jnp.floor((xy[:, 1] - radius) / ts)
    ymax = jnp.floor((xy[:, 1] + radius + ts - 1) / ts)
    tx = jnp.arange(TW, dtype=jnp.float32)
    ty = jnp.arange(TH, dtype=jnp.float32)
    Ax = ((tx[None, :] >= xmin[:, None]) & (tx[None, :] < xmax[:, None])
          & (radius > 0)[:, None]).astype(jnp.float32)      # (P, TW)
    Ay = ((ty[None, :] >= ymin[:, None])
          & (ty[None, :] < ymax[:, None])).astype(jnp.float32)  # (P, TH)
    M = tile_mask.astype(jnp.float32)                        # (TH, TW)
    Mx = jax.lax.dot_general(M, Ax, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (TH, P)
    hit = jnp.sum(Ay * Mx.T, axis=1)
    return hit > 0.5


@partial(jax.jit, static_argnames=("settings",))
def compute_binning(means3d: jnp.ndarray, scales: jnp.ndarray,
                    rots: jnp.ndarray, cam: dict, settings: RenderSettings,
                    tile_mask: Optional[jnp.ndarray] = None,
                    valid_mask: Optional[jnp.ndarray] = None):
    """Standalone tile binning for reuse across several renders of the SAME
    camera + (approximately the same) geometry — e.g. every iteration of an
    optimize scan. The (P x max_tiles) sort is the most expensive part of a
    render at map scale; hoisting it out of the iteration loop and passing
    the result to `rasterize(..., binning=...)` amortizes it. The blend
    still evaluates alpha from the CURRENT xy/conic, so a cached binning
    only means a slightly stale tile assignment / depth order while the
    geometry drifts during optimization."""
    H, W = settings.height, settings.width
    pre = preprocess(means3d, scales, rots, cam, settings.color_sigma, W, H,
                     settings.scale_modifier)
    if valid_mask is not None:
        pre = pre._replace(valid=pre.valid & valid_mask,
                           radius=jnp.where(valid_mask, pre.radius, 0.0))
    entry_cap, max_chunks = entry_budget(means3d.shape[0], settings)
    return binning_mod.bin_gaussians(
        pre, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
        tile_mask, align=settings.chunk_(), entry_cap=entry_cap,
        max_chunks=max_chunks,
    )


@partial(jax.jit, static_argnames=("settings", "with_normal",
                                   "with_n_touched", "tiled"))
def rasterize(means3d: jnp.ndarray, scales: jnp.ndarray, rots: jnp.ndarray,
              opacities: jnp.ndarray, colors: jnp.ndarray, cam: dict,
              settings: RenderSettings,
              tile_mask: Optional[jnp.ndarray] = None,
              normal_w: Optional[jnp.ndarray] = None,
              valid_mask: Optional[jnp.ndarray] = None,
              with_normal: bool = True,
              with_n_touched: bool = True,
              binning=None, bg_maps: Optional[dict] = None,
              bg_tiled: Optional[jnp.ndarray] = None,
              tiled: bool = False) -> dict:
    """Render a view.

    means3d (P,3); scales (P,3) ACTIVATED (exp applied); rots (P,4) normalized
    wxyz; opacities (P,) activated; colors (P,3) precomputed RGB (evaluate SH
    with `eval_colors` first when using SH); normal_w is accepted for API
    compatibility but unused — the normal map now comes from the blend's hit
    normal channels (see below); valid_mask (P,) excludes dead slots.
    Returns dict of (H,W[,C]) maps + per-gaussian n_touched (P,).

    with_n_touched=False skips the entries->gaussian scatter-add (~10 ms at
    1M entry cap — only the USE_PURNE path consumes it). `depth` is
    differentiable on both impls: the Pallas kernel routes the depth
    cotangent to the hit entry analytically, the ref blend differentiates
    its own hit-depth math.

    `tiled=True` returns maps in the kernel-native (num_tiles, n_px[,C])
    layout (see `blend_pallas.blend_tiles_pallas`); `bg_tiled` supplies the
    one-surface background already in the (num_tiles+1, n_px, NB) layout —
    the optimize scans precompute it ONCE per scan instead of re-tiling the
    constant bg maps every iteration.
    """
    H, W = settings.height, settings.width
    pre = preprocess(means3d, scales, rots, cam, settings.color_sigma, W, H,
                     settings.scale_modifier)
    if valid_mask is not None:
        pre = pre._replace(valid=pre.valid & valid_mask,
                           radius=jnp.where(valid_mask, pre.radius, 0.0))

    entry_cap, max_chunks = entry_budget(means3d.shape[0], settings)
    if binning is None:
        b = binning_mod.bin_gaussians(
            pre, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
            tile_mask, align=settings.chunk_(), entry_cap=entry_cap,
            max_chunks=max_chunks,
        )
    else:
        b = binning    # precomputed via `compute_binning` (same cam/subset)
    TH, TW = binning_mod.tile_grid_size(W, H, settings.tile_size)
    num_tiles = TH * TW
    entry_valid = b.entry_valid

    params = BlendParams(
        opaque_threshold=settings.opaque_threshold,
        depth_threshold=settings.depth_threshold,
        normal_threshold=settings.normal_threshold_cos,
        T_threshold=settings.T_threshold,
    )
    bg = jnp.asarray(settings.bg, jnp.float32)

    impl = _resolve_impl(settings.impl)
    if impl == "pallas":
        from .blend_pallas import blend_tiles_pallas, tile_px_maps
        if bg_tiled is None and bg_maps is not None:
            bg_tiled = tile_px_maps(
                [bg_maps["S"], bg_maps["D"], bg_maps["tau"]],
                settings.tile_size, W, H, num_tiles)
        out = blend_tiles_pallas(
            pre, b, entry_valid, colors, opacities, num_tiles,
            settings.tile_size, W, H, cam["K"], params, settings.bg,
            max_chunks=max_chunks, bg_tiled=bg_tiled, tiled=tiled,
            chunk=settings.chunk_(),
        )
    else:
        from .blend_pallas import untile_map
        feats = gather_entry_feats(
            b.point_list, entry_valid, pre.xy, pre.conic, opacities, colors,
            pre.depth, pre.mean_c, pre.normal_c, pre.scale_max,
        )
        bg_sf = None
        if bg_maps is not None:
            bg_sf = {k: jax.lax.stop_gradient(bg_maps[k])
                     for k in ("S", "D", "tau")}
        elif bg_tiled is not None:
            # tiled-bg callers on the ref impl: recover the image maps
            bts = jax.lax.stop_gradient(bg_tiled[:num_tiles])
            bg_sf = {
                "S": untile_map(bts[:, :, 0:3], settings.tile_size, W, H),
                "D": untile_map(bts[:, :, 3], settings.tile_size, W, H),
                "tau": untile_map(bts[:, :, 4], settings.tile_size, W, H),
            }
        out = blend_tiles_ref(
            feats, b.entry_tile, num_tiles, settings.tile_size, W, H,
            cam["K"], params, bg,
            tile_offsets=b.tile_offsets,
            window=settings.chunk_() * max_chunks,
            bg_surface_maps=bg_sf,
        )
        if tiled:
            # the pure-JAX reference blend emits image-space maps; tile
            # them so tiled-mode consumers see one layout on every impl
            from .blend_pallas import tile_map
            ts = settings.tile_size
            out = {k: (tile_map(v, ts, W, H)
                       if (hasattr(v, "ndim") and v.ndim >= 2
                           and v.shape[:2] == (H, W)) else v)
                   for k, v in out.items()}

    # n_touched per gaussian (segment sum over entries) — the scatter-add is
    # expensive on TPU, so it's gated (only USE_PURNE-style pruning reads it)
    P = means3d.shape[0]
    nte = out.pop("n_touched_entries")
    if with_n_touched:
        out["n_touched"] = jnp.zeros((P,), jnp.int32).at[b.point_list].add(
            jnp.where(entry_valid, nte, 0).astype(jnp.int32))
    else:
        out["n_touched"] = jnp.zeros((P,), jnp.int32)

    # normal map (ref `SLAM/render.py:211-214`): the blend emits the hit
    # entry's camera-frame normal as differentiable channels (its cotangent
    # is routed to the hit entry inside the kernel, like depth); rotating to
    # world here is elementwise. The reference's per-pixel gather of world
    # normals by depth_index_map computes the identical value, but its VJP is
    # an (H*W,3)->(P,3) scatter-add — 33 ms/iter on TPU at office0 scale.
    nc = out.pop("normal_c")
    if with_normal:
        R = cam["w2c"][:3, :3]       # world->cam; n_w = R^T n_c
        n0, n1, n2 = nc[..., 0], nc[..., 1], nc[..., 2]
        out["normal"] = jnp.stack([
            R[0, 0] * n0 + R[1, 0] * n1 + R[2, 0] * n2,
            R[0, 1] * n0 + R[1, 1] * n1 + R[2, 1] * n2,
            R[0, 2] * n0 + R[1, 2] * n1 + R[2, 2] * n2,
        ], axis=-1)
    else:
        out["normal"] = jnp.zeros(nc.shape, jnp.float32)

    out["dropped_entries"] = b.dropped
    out["tile_dropped"] = b.tile_dropped
    out["entry_demand"] = b.demand
    out["clipped_cells"] = b.clipped
    out["num_entries"] = b.num_entries
    return out


def eval_colors(sh: jnp.ndarray, means3d: jnp.ndarray, cam_pos: jnp.ndarray,
                sh_degree: int) -> jnp.ndarray:
    """SH -> view-dependent RGB (ref `computeColorFromSH`)."""
    from ..utils.sh import eval_sh
    dirs = means3d - cam_pos[None, :]
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    return eval_sh(sh_degree, sh, dirs)
