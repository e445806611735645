"""Pallas TPU kernel for the per-tile front-to-back blend (fwd + custom VJP).

TPU-native replacement for `renderCUDA_withMask` (forward.cu:638-866) and
`BACKWARD::renderCUDA_flat` (backward.cu:809-1065).

v2 design (after profiling v1 on hardware):
- Entries live FEATURE-MAJOR as one dense (24, entry_cap) float32 array —
  entry-major (L, k) layouts with narrow minor dims explode 42-128x under
  XLA's (8,128) tiling and OOM at Replica scale.
- The binning lays tiles out CHUNK-aligned (`binning.bin_gaussians`), so the
  kernel grid is 2-D (tile, chunk) and entry blocks are fetched by pallas's
  OWN pipeline via a scalar-prefetch-computed block index — automatic double
  buffering, no manual DMA (whose unaligned slices Mosaic rejects anyway).
- In-kernel layout: pixels on SUBLANES (n_px, 1), entries on LANES (1, K);
  blending state persists in VMEM scratch across the chunk dimension of the
  grid. Transmittance = Hillis-Steele lane-shift cumsums of log(1-alpha)
  (full f32; MXU matmuls would cost bf16-grade mantissa), color accumulation
  = (n_px, K) x (K, 3) matmul.
- Backward walks chunks in REVERSE (per-tile reversed block index), carrying
  per-pixel suffix color sums and reconstructing T_prev from the forward's
  total log transmittance (the CUDA `T /= (1-alpha)` back-walk); per-entry
  gradients stream out as (9, CHUNK) blocks of a feature-major buffer.

Feature rows (24 x entry_cap):
  0:2 xy | 2:5 conic | 5 opacity | 6:9 color | 9 depth | 10:13 mean_c
  | 13:16 normal_c | 16 scale_max | 17 gauss_id | 18 valid | 19:24 pad.
Gradient rows (9): dxy(2) dconic(3) dopacity(1) dcolor(3) — matching feature
rows 0:9, so the VJP w.r.t. the feats array is a row-aligned paste.

Gradients cover the color/alpha path; depth/normal gradients are recovered
outside from the integer hit-index maps (`rasterize._recompute_depth`),
exactly as the CUDA backward treats the hit Gaussian as a fixed selection.
Like CUDA (backward.cu:948-996), the 0.99 alpha clamp is straight-through.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as jdtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend import ALPHA_MAX, ALPHA_MIN, BlendParams

CHUNK = 256          # entries per block (= binning alignment)
NF = 24              # feature rows
NG = 9               # gradient rows
NA = 8               # per-pixel aux channels
BIG = 1e30


def _interpret() -> bool:
    if os.environ.get("DQO_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def _cumsum_lanes(x):
    """Inclusive cumsum along axis 1 via a Hillis-Steele doubling scan."""
    K = x.shape[1]
    s = 1
    while s < K:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1
        )
        x = x + shifted
        s <<= 1
    return x


def _cumsum_rev_excl_lanes(x):
    """out[:, k] = sum_{j>k} x[:, j]."""
    total = jnp.sum(x, axis=1, keepdims=True)
    return total - _cumsum_lanes(x)


def _tile_pixels(t, tw, tile_size, scal):
    """Pixel coords + unit rays for tile t, all (n_px, 1) columns."""
    n = tile_size * tile_size
    ty = t // tw
    tx = t % tw
    p = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    px = (tx * tile_size + p % tile_size).astype(jnp.float32)
    py = (ty * tile_size + p // tile_size).astype(jnp.float32)
    fx, fy, cx, cy = scal[0], scal[1], scal[2], scal[3]
    rx = (px - cx) / fx
    ry = (py - cy) / fy
    inv = jax.lax.rsqrt(rx * rx + ry * ry + 1.0)
    return px, py, rx * inv, ry * inv, inv


def _alpha_terms(f, px, py):
    """f: (NF, K) feature block; px/py: (n_px, 1). Returns (n_px, K) terms."""
    dx = f[0:1, :] - px
    dy = f[1:2, :] - py
    ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha_raw = jnp.minimum(ALPHA_MAX, f[5:6, :] * G)
    valid = f[18:19, :] > 0.5
    skip = (power > 0.0) | (alpha_raw < ALPHA_MIN) | (~valid)
    alpha = jnp.where(skip, 0.0, alpha_raw)
    return alpha, alpha_raw, skip, jnp.log1p(-alpha), G, dx, dy


# state scratch columns
(S_LOGT, S_C0, S_C1, S_C2, S_WSUM, S_ENDT, S_BESTW, S_BESTID, S_HIT,
 S_HITID, S_HITD, S_HITDW) = range(12)
NS = 16


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(block_tile_ref, scal_ref, f_ref, color_ref, aux_ref, nt_ref,
                state, *, tw, tile_size, params: BlendParams, bg):
    bidx = pl.program_id(0)
    t = block_tile_ref[bidx]
    n_px = tile_size * tile_size
    is_first = jnp.logical_or(
        bidx == 0, block_tile_ref[jnp.maximum(bidx - 1, 0)] != t)
    active = t >= 0
    nt_ref[0:1, :] = jnp.zeros((1, CHUNK), jnp.float32)

    @pl.when(is_first & active)
    def _init():
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_px, NS), 1)
        init = jnp.where(cols == S_ENDT, 1.0, 0.0)
        init = jnp.where(
            (cols == S_BESTW) | (cols == S_BESTID) | (cols == S_HITID),
            -1.0, init)
        state[:, :] = init

    @pl.when(active)
    def _process():
        px, py, rx, ry, rz = _tile_pixels(t, tw, tile_size, scal_ref)
        f = f_ref[:, :]
        alpha, alpha_raw, skip, log1m, G, dx, dy = _alpha_terms(f, px, py)
        logT = state[:, S_LOGT:S_LOGT + 1]
        cum = logT + _cumsum_lanes(log1m)          # (n, K)
        test_T = jnp.exp(cum)
        T_prev = jnp.exp(cum - log1m)
        contrib = (~skip) & (test_T >= params.T_threshold)
        w = jnp.where(contrib, alpha * T_prev, 0.0)

        # per-entry touched-pixel count (ref forward.cu n_touched++; used by
        # the reference's USE_PURNE pruning). Same predicate as the ref
        # blend: contributing with test_T > 0.5.
        nt_ref[0:1, :] = jnp.sum(
            (contrib & (test_T > 0.5)).astype(jnp.float32), axis=0,
            keepdims=True)

        Cd = jax.lax.dot_general(                   # (n, 3)
            w, f[6:9, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        state[:, S_C0:S_C0 + 1] = state[:, S_C0:S_C0 + 1] + Cd[:, 0:1]
        state[:, S_C1:S_C1 + 1] = state[:, S_C1:S_C1 + 1] + Cd[:, 1:2]
        state[:, S_C2:S_C2 + 1] = state[:, S_C2:S_C2 + 1] + Cd[:, 2:3]
        state[:, S_WSUM:S_WSUM + 1] = (
            state[:, S_WSUM:S_WSUM + 1] + jnp.sum(w, axis=1, keepdims=True))

        # first-max color contributor (strict >, earliest max wins)
        kidx = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        cw = jnp.max(w, axis=1, keepdims=True)
        ksel = jnp.min(jnp.where(w >= cw, kidx, CHUNK), axis=1, keepdims=True)
        onehot = (kidx == ksel).astype(jnp.float32)
        cid = jnp.sum(onehot * f[17:18, :], axis=1, keepdims=True)
        best_w = state[:, S_BESTW:S_BESTW + 1]
        take = cw > best_w
        state[:, S_BESTW:S_BESTW + 1] = jnp.where(take, cw, best_w)
        state[:, S_BESTID:S_BESTID + 1] = jnp.where(
            take & (cw > 0), cid, state[:, S_BESTID:S_BESTID + 1])

        chunk_end = jnp.min(jnp.where(contrib, test_T, BIG), axis=1,
                            keepdims=True)
        state[:, S_ENDT:S_ENDT + 1] = jnp.minimum(
            state[:, S_ENDT:S_ENDT + 1], chunk_end)

        # hit-Gaussian depth model (ref forward.cu:779-810)
        eligible = (~skip) & (alpha_raw >= params.opaque_threshold)
        efirst = eligible & (
            _cumsum_lanes(eligible.astype(jnp.float32)) < 1.5)
        chunk_has = jnp.max(eligible.astype(jnp.float32), axis=1,
                            keepdims=True)

        ndm = (f[10:11, :] * f[13:14, :] + f[11:12, :] * f[14:15, :]
               + f[12:13, :] * f[15:16, :])          # (1, K)
        ndr = f[13:14, :] * rx + f[14:15, :] * ry + f[15:16, :] * rz
        tt = ndm / (ndr + 1e-8)
        hz = tt * rz
        plane_ok = (
            jnp.abs(hz - f[12:13, :]) <= f[16:17, :] * params.depth_threshold
        ) & (jnp.abs(ndr) >= params.normal_threshold)
        depth_cand = jnp.where(plane_ok, hz, f[9:10, :])

        fsel = efirst.astype(jnp.float32)
        sel_depth = jnp.sum(fsel * depth_cand, axis=1, keepdims=True)
        sel_w = jnp.sum(fsel * alpha * T_prev, axis=1, keepdims=True)
        sel_id = jnp.sum(fsel * (f[17:18, :] + 1.0), axis=1,
                         keepdims=True) - 1.0

        hit_found = state[:, S_HIT:S_HIT + 1]
        new_hit = (hit_found < 0.5) & (chunk_has > 0.5)
        state[:, S_HIT:S_HIT + 1] = jnp.maximum(hit_found, chunk_has)
        state[:, S_HITID:S_HITID + 1] = jnp.where(
            new_hit, sel_id, state[:, S_HITID:S_HITID + 1])
        state[:, S_HITD:S_HITD + 1] = jnp.where(
            new_hit, sel_depth, state[:, S_HITD:S_HITD + 1])
        state[:, S_HITDW:S_HITDW + 1] = jnp.where(
            new_hit, sel_w, state[:, S_HITDW:S_HITDW + 1])

        state[:, S_LOGT:S_LOGT + 1] = logT + jnp.sum(log1m, axis=1,
                                                     keepdims=True)

    # keep output block current; the final grid step for this tile flushes it
    end_T = state[:, S_ENDT:S_ENDT + 1]
    color_ref[0, :, 0:1] = state[:, S_C0:S_C0 + 1] + end_T * bg[0]
    color_ref[0, :, 1:2] = state[:, S_C1:S_C1 + 1] + end_T * bg[1]
    color_ref[0, :, 2:3] = state[:, S_C2:S_C2 + 1] + end_T * bg[2]
    color_ref[0, :, 3:4] = jnp.zeros((n_px, 1), jnp.float32)
    aux_ref[0, :, 0:1] = state[:, S_HITID:S_HITID + 1]
    aux_ref[0, :, 1:2] = state[:, S_BESTID:S_BESTID + 1]
    aux_ref[0, :, 2:3] = jnp.maximum(state[:, S_BESTW:S_BESTW + 1], 0.0)
    aux_ref[0, :, 3:4] = state[:, S_HITDW:S_HITDW + 1]
    aux_ref[0, :, 4:5] = end_T
    aux_ref[0, :, 5:6] = state[:, S_WSUM:S_WSUM + 1]
    aux_ref[0, :, 6:7] = state[:, S_LOGT:S_LOGT + 1]
    aux_ref[0, :, 7:8] = state[:, S_HITD:S_HITD + 1]


# ---------------------------------------------------------------------------
# backward kernel (reverse chunk order per tile)
# ---------------------------------------------------------------------------

def _bwd_kernel(block_tile_ref, scal_ref, f_ref, dpix_ref, aux_ref, dent_ref,
                sstate, *, tw, tile_size, n_blocks, params: BlendParams, bg):
    i = pl.program_id(0)
    bidx = n_blocks - 1 - i          # walk blocks in reverse
    t = block_tile_ref[bidx]
    n_px = tile_size * tile_size
    is_first = jnp.logical_or(
        bidx == n_blocks - 1,
        block_tile_ref[jnp.minimum(bidx + 1, n_blocks - 1)] != t)
    active = t >= 0

    @pl.when(is_first & active)
    def _init():
        sstate[:, :] = jnp.zeros((n_px, 8), jnp.float32)

    @pl.when(active)
    def _process():
        px, py, rx, ry, rz = _tile_pixels(t, tw, tile_size, scal_ref)
        f = f_ref[:, :]
        d0 = dpix_ref[0, :, 0:1]
        d1 = dpix_ref[0, :, 1:2]
        d2 = dpix_ref[0, :, 2:3]
        logT_total = aux_ref[0, :, 6:7]
        end_T = aux_ref[0, :, 4:5]
        bgdot = d0 * bg[0] + d1 * bg[1] + d2 * bg[2]

        alpha, alpha_raw, skip, log1m, G, dx, dy = _alpha_terms(f, px, py)
        suffix_log = sstate[:, 0:1]
        suffix_after = suffix_log + _cumsum_rev_excl_lanes(log1m)
        log_test = logT_total - suffix_after
        test_T = jnp.exp(log_test)
        T_prev = jnp.exp(log_test - log1m)
        contrib = (~skip) & (test_T >= params.T_threshold)
        w = jnp.where(contrib, alpha * T_prev, 0.0)

        col_r, col_g, col_b = f[6:7, :], f[7:8, :], f[8:9, :]
        wc0 = w * col_r
        wc1 = w * col_g
        wc2 = w * col_b
        suf0 = sstate[:, 1:2] + _cumsum_rev_excl_lanes(wc0)
        suf1 = sstate[:, 2:3] + _cumsum_rev_excl_lanes(wc1)
        suf2 = sstate[:, 3:4] + _cumsum_rev_excl_lanes(wc2)

        inv1m = 1.0 / (1.0 - alpha)          # alpha <= 0.99
        dL_dalpha = (
            (col_r * T_prev - suf0 * inv1m) * d0
            + (col_g * T_prev - suf1 * inv1m) * d1
            + (col_b * T_prev - suf2 * inv1m) * d2
            - end_T * inv1m * bgdot
        )
        dL_dalpha = jnp.where(contrib, dL_dalpha, 0.0)

        dL_dG = f[5:6, :] * dL_dalpha
        ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
        gl = dL_dG * G
        dent_ref[0:1, :] = jnp.sum(gl * (-(ca * dx + cb * dy)), axis=0,
                                   keepdims=True)
        dent_ref[1:2, :] = jnp.sum(gl * (-(cc * dy + cb * dx)), axis=0,
                                   keepdims=True)
        dent_ref[2:3, :] = jnp.sum(gl * (-0.5 * dx * dx), axis=0,
                                   keepdims=True)
        dent_ref[3:4, :] = jnp.sum(gl * (-dx * dy), axis=0, keepdims=True)
        dent_ref[4:5, :] = jnp.sum(gl * (-0.5 * dy * dy), axis=0,
                                   keepdims=True)
        dent_ref[5:6, :] = jnp.sum(G * dL_dalpha, axis=0, keepdims=True)
        dent_ref[6:7, :] = jnp.sum(w * d0, axis=0, keepdims=True)
        dent_ref[7:8, :] = jnp.sum(w * d1, axis=0, keepdims=True)
        dent_ref[8:9, :] = jnp.sum(w * d2, axis=0, keepdims=True)

        sstate[:, 0:1] = suffix_log + jnp.sum(log1m, axis=1, keepdims=True)
        sstate[:, 1:2] = sstate[:, 1:2] + jnp.sum(wc0, axis=1, keepdims=True)
        sstate[:, 2:3] = sstate[:, 2:3] + jnp.sum(wc1, axis=1, keepdims=True)
        sstate[:, 3:4] = sstate[:, 3:4] + jnp.sum(wc2, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# host-side custom-VJP op
# ---------------------------------------------------------------------------

def _fwd_call(feats, block_tile, scal, num_tiles, tile_size, tw, params, bg):
    """Grid is 1-D over entry BLOCKS: every step does real work; per-block
    tile ownership arrives via the scalar-prefetched `block_tile` array
    (sentinel -1 for unused blocks). Empty tiles get their init values pasted
    by the caller afterwards."""
    n_px = tile_size * tile_size
    n_blocks = feats.shape[1] // CHUNK

    def out_index(b, bt, scal_):
        t = bt[b]
        return (jnp.where(t >= 0, t, num_tiles), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((NF, CHUNK), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_px, 4), out_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_px, NA), out_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((n_px, NS), jnp.float32)],
    )
    kernel = functools.partial(
        _fwd_kernel, tw=tw, tile_size=tile_size, params=params, bg=bg)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles + 1, n_px, 4), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, n_px, NA), jnp.float32),
            jax.ShapeDtypeStruct((1, feats.shape[1]), jnp.float32),
        ],
        interpret=_interpret(),
    )(block_tile, scal, feats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _blend_core(feats, block_tile, scal, num_tiles, tile_size, tw, params,
                bg):
    color, aux, nt = _fwd_call(feats, block_tile, scal, num_tiles, tile_size,
                               tw, params, bg)
    return color, aux, nt


def _blend_core_fwd(feats, block_tile, scal, num_tiles, tile_size, tw,
                    params, bg):
    color, aux, nt = _fwd_call(feats, block_tile, scal, num_tiles, tile_size,
                               tw, params, bg)
    return (color, aux, nt), (feats, block_tile, scal, aux)


def _blend_core_bwd(num_tiles, tile_size, tw, params, bg, res, cts):
    feats, block_tile, scal, aux = res
    dcolor, _daux, _dnt = cts
    n_px = tile_size * tile_size
    Lp = feats.shape[1]
    n_blocks = Lp // CHUNK

    def in_index(i, bt, scal_):
        return (0, n_blocks - 1 - i)

    def px_index(i, bt, scal_):
        t = bt[n_blocks - 1 - i]
        return (jnp.where(t >= 0, t, num_tiles), 0, 0)

    def dent_index(i, bt, scal_):
        return (0, n_blocks - 1 - i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((NF, CHUNK), in_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_px, 4), px_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_px, NA), px_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NG, CHUNK), dent_index, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((n_px, 8), jnp.float32)],
    )
    kernel = functools.partial(
        _bwd_kernel, tw=tw, tile_size=tile_size, n_blocks=n_blocks,
        params=params, bg=bg)
    dent = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NG, Lp), jnp.float32)],
        interpret=_interpret(),
    )(block_tile, scal, feats, dcolor, aux)[0]

    valid = feats[18:19, :] > 0.5
    dent = jnp.where(valid, dent, 0.0)
    dfeats = jnp.zeros_like(feats)
    dfeats = dfeats.at[0:NG, :].set(dent)   # rows align with feature rows 0:9
    d_bt = np.zeros(block_tile.shape, jdtypes.float0)
    return dfeats, d_bt, jnp.zeros_like(scal)


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


def pack_entries(pre, b, colors, opacities):
    """Feature-major (24, entry_cap) pack: every row is a dense gather from a
    stacked (17, P) array — no narrow-minor-dim intermediates."""
    g = b.point_list
    xyT = pre.xy.T
    coT = pre.conic.T
    clT = colors.T
    mcT = pre.mean_c.T
    ncT = pre.normal_c.T
    rows = [
        xyT[0], xyT[1], coT[0], coT[1], coT[2], opacities,
        clT[0], clT[1], clT[2], pre.depth,
        mcT[0], mcT[1], mcT[2], ncT[0], ncT[1], ncT[2], pre.scale_max,
    ]
    stacked = jnp.stack(rows, axis=0)                     # (17, P)
    feats17 = jnp.take(stacked, g, axis=1)                # (17, L)
    gid = g.astype(jnp.float32)[None, :]
    val = b.entry_valid.astype(jnp.float32)[None, :]
    pad = jnp.zeros((NF - 19, g.shape[0]), jnp.float32)
    return jnp.concatenate([feats17, gid, val, pad], axis=0)


def blend_tiles_pallas(pre, b, entry_valid, colors, opacities, num_tiles,
                       tile_size, width, height, K, params: BlendParams, bg,
                       max_chunks: int = 32):
    """Drop-in twin of `blend.blend_tiles_ref` backed by the Pallas kernels."""
    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size

    feats = pack_entries(pre, b, colors, opacities)
    block_tile = b.block_tile
    scal = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(jnp.float32)
    bg_static = tuple(float(x) for x in np.asarray(bg).tolist())
    color, aux, nt = _blend_core(
        feats, block_tile, scal, num_tiles, tile_size, TW, params, bg_static,
    )
    color = color[:num_tiles]
    aux = aux[:num_tiles]
    nt = jax.lax.stop_gradient(nt)

    # tiles with no entries never flush a block: paste their init values
    empty = (b.tile_offsets[1:] == b.tile_offsets[:-1])[:, None, None]
    bgv = jnp.asarray(bg_static + (0.0,), jnp.float32)
    color = jnp.where(empty, bgv[None, None, :], color)
    aux_init = jnp.asarray([-1.0, -1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
                           jnp.float32)
    aux = jnp.where(empty, aux_init[None, None, :], aux)

    def untile(x):
        x = x.reshape(TH, TW, tile_size, tile_size)
        x = jnp.moveaxis(x, 2, 1).reshape(TH * tile_size, TW * tile_size)
        return x[:height, :width]

    aux = jax.lax.stop_gradient(aux)
    render = jnp.stack([untile(color[:, :, c]) for c in range(3)], axis=-1)
    return {
        "render": render,
        "depth": untile(aux[:, :, 7]),
        "depth_index_map": jnp.round(untile(aux[:, :, 0])).astype(jnp.int32),
        "color_index_map": jnp.round(untile(aux[:, :, 1])).astype(jnp.int32),
        "color_hit_weight": untile(aux[:, :, 2]),
        "depth_hit_weight": untile(aux[:, :, 3]),
        "T_map": untile(aux[:, :, 4]),
        "weight_sum": untile(aux[:, :, 5]),
        "n_touched_entries": nt[0].astype(jnp.int32),
    }
