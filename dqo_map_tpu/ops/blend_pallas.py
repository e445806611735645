"""Pallas TPU kernel for the per-tile front-to-back blend (fwd + custom VJP).

TPU-native replacement for `renderCUDA_withMask` (forward.cu:638-866) and
`BACKWARD::renderCUDA_flat` (backward.cu:809-1065).

v3 design (hardware-profiled; v2 spent 53 ms/fwd at 240k entries):
- Entries live FEATURE-MAJOR as one dense (16, entry_cap) float32 array —
  entry-major (L, k) layouts with narrow minor dims explode 42-128x under
  XLA's (8,128) tiling and OOM at Replica scale.
- The binning lays tiles out CHUNK-aligned (`binning.bin_gaussians`), and the
  kernel grid is **1-D over entry blocks with a DYNAMIC size**: the traced
  `num_blocks` from the binning bounds the grid, so the static `entry_cap`
  worst-case tail costs nothing (v2 ran 4096 grid steps for ~1400 real
  blocks) and entry-count changes never recompile.
- In-kernel layout: pixels on SUBLANES (n_px, 1), entries on LANES (1, K).
- Transmittance is MULTIPLICATIVE, exactly like the CUDA loop: a
  Hillis-Steele lane-shift cumPRODUCT of (1-alpha). v2 worked in log space
  (log1p + 2 exp per element); v3's only transcendental is exp(power).
  Underflow is harmless: a test_T that flushes to 0 is below T_threshold.
- Hit/"best" selections use min-index tricks (iota + min) instead of
  cumsums.
- Backward walks chunks FORWARD (not reverse): the suffix color sums the
  CUDA back-walk accumulates are recovered as (total - running prefix), with
  the 3 color channels pre-contracted against the pixel cotangent
  (cd = sum_c d_c * color_c), so ONE cumsum replaces v2's four reverse
  cumsums and the transmittance recurrence is the same stable multiplicative
  prefix as the forward. No transcendentals beyond exp(power).

Feature rows (16 x entry_cap — 16 sublanes tile perfectly):
  0:2 xy | 2:5 conic | 5 opacity (0 when invalid; doubles as the validity
  lane) | 6:9 color | 9 depth (camera z — also the hit plane's mean_c z)
  | 10:13 normal_c | 13 scale_max | 14 gauss_id | 15 ndm (normal_c.mean_c).
Gradient rows mirror the feature rows 1:1 (NG == NF), so the VJP w.r.t. the
feats array IS the kernel output; `pack_entries`' autodiff then spreads it
back to per-gaussian arrays (including splitting d_ndm into mean_c/normal_c).

Gradients cover the color/alpha path AND the hit-depth path: the fwd emits
depth as color channel 3, and the bwd routes each pixel's depth cotangent to
its hit entry analytically (dL/dndm, dL/dnormal_c, dL/dsplat_z — ref
backward.cu:997-1065), treating the hit selection and plane/splat branch as
stop-gradient exactly as CUDA does. Like CUDA (backward.cu:948-996), the
0.99 alpha clamp is straight-through.
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

CHUNK = int(os.environ.get("DQO_CHUNK", 256))  # entries per block (= binning alignment)
NF = 16              # feature rows
NG = 16              # gradient rows (== NF: row-aligned with features)
NA = 8               # per-pixel aux channels
NC = 8               # differentiable channels: rgb, hit depth, hit normal_c, pad
BIG = 1e30


def _interpret() -> bool:
    if os.environ.get("DQO_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


CUMSUM_MXU = os.environ.get("DQO_CUMSUM_MXU", "1") == "1"


def _tri_ones(K):
    """(K, K) lower-triangular-inclusive ones: x @ T = inclusive cumsum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r <= c).astype(jnp.float32)


def _cumprod_lanes(x):
    """Inclusive cumprod along axis 1.

    MXU form (default): exp(cumsum(log x)) with the cumsum as ONE
    lower-triangular matmul — 2 transcendental passes + 1 MXU op instead of
    the Hillis-Steele doubling scan's log2(K) shifted concats+multiplies
    (14 VPU passes at K=128). Callers feed x = 1-alpha in [0.01, 1], so
    log is well-conditioned; exp/log round-trip error (~1e-6 relative) is
    far below the blend's tolerance (alpha cutoffs at 1/255).
    DQO_CUMSUM_MXU=0 restores the exact scan form."""
    if CUMSUM_MXU:
        return jnp.exp(_cumsum_lanes(jnp.log(x)))
    K = x.shape[1]
    s = 1
    while s < K:
        shifted = jnp.concatenate(
            [jnp.ones((x.shape[0], s), x.dtype), x[:, :-s]], axis=1
        )
        x = x * shifted
        s <<= 1
    return x


def _cumsum_lanes(x):
    """Inclusive cumsum along axis 1 (one MXU triangular matmul by
    default; see `_cumprod_lanes`)."""
    K = x.shape[1]
    if CUMSUM_MXU:
        return jax.lax.dot_general(
            x, _tri_ones(K), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    s = 1
    while s < K:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1
        )
        x = x + shifted
        s <<= 1
    return x


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


def _alpha_w(f, px, py, T_carry, T_threshold, chunk=CHUNK):
    """Shared fwd/bwd recurrence for one chunk.

    f: (NF, K) feature block; px/py: (n_px, 1); T_carry: (n_px, 1) prefix
    transmittance entering the chunk. Returns the per-(pixel, entry) terms
    the blend math needs. Invalid entries carry opacity 0 -> alpha 0.
    """
    dx = f[0:1, :] - px
    dy = f[1:2, :] - py
    ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha_raw = jnp.minimum(ALPHA_MAX, f[5:6, :] * G)
    skip = (power > 0.0) | (alpha_raw < ALPHA_MIN)
    alpha = jnp.where(skip, 0.0, alpha_raw)

    one_m = 1.0 - alpha                        # >= 0.01 (alpha <= 0.99)
    within = _cumprod_lanes(one_m)
    test_T = T_carry * within                  # T AFTER entry k
    T_prev = test_T / one_m
    contrib = (~skip) & (test_T >= T_threshold)
    w = jnp.where(contrib, alpha * T_prev, 0.0)
    T_next = T_carry * within[:, chunk - 1:chunk]
    return dict(dx=dx, dy=dy, G=G, alpha=alpha, alpha_raw=alpha_raw,
                skip=skip, one_m=one_m, test_T=test_T, T_prev=T_prev,
                contrib=contrib, w=w, T_next=T_next)


# state scratch columns (fwd)
(S_T, S_C0, S_C1, S_C2, S_WSUM, S_ENDT, S_BESTW, S_BESTID, S_HIT,
 S_HITID, S_HITD, S_HITDW, S_HITN0, S_HITN1, S_HITN2, S_CROSS) = range(16)
NS = 16
NB = 8               # per-pixel background-surface channels: S rgb, D, tau


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(block_tile_ref, scal_ref, f_ref, *rest, tw, tile_size,
                params: BlendParams, bg, with_bg=False, chunk=CHUNK):
    if with_bg:
        bgt_ref, color_ref, aux_ref, nt_ref, state = rest
    else:
        bgt_ref = None
        color_ref, aux_ref, nt_ref, state = rest
    bidx = pl.program_id(0)
    t = block_tile_ref[bidx]
    n_px = tile_size * tile_size
    is_first = jnp.logical_or(
        bidx == 0, block_tile_ref[jnp.maximum(bidx - 1, 0)] != t)
    is_last = jnp.logical_or(
        bidx + 1 >= pl.num_programs(0),
        block_tile_ref[jnp.minimum(bidx + 1, pl.num_programs(0) - 1)] != t)
    active = t >= 0
    nt_ref[0:1, :] = jnp.zeros((1, chunk), jnp.float32)

    @pl.when(is_first & active)
    def _init():
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_px, NS), 1)
        init = jnp.where((cols == S_ENDT) | (cols == S_T), 1.0, 0.0)
        init = jnp.where(
            (cols == S_BESTW) | (cols == S_BESTID) | (cols == S_HITID),
            -1.0, init)
        state[:, :] = init

    # early termination, block-granular (ref forward.cu:812-817: a pixel is
    # done only when T < threshold AND its hit Gaussian was found; a whole
    # chunk is skipped once every pixel of the tile is done)
    saturated = jnp.max(
        jnp.where(state[:, S_HIT:S_HIT + 1] > 0.5,
                  state[:, S_T:S_T + 1], 1.0)) < params.T_threshold

    @pl.when(active & ~saturated)
    def _process():
        px, py, rx, ry, rz = _tile_pixels(t, tw, tile_size, scal_ref)
        f = f_ref[:, :]
        T_carry = state[:, S_T:S_T + 1]
        a = _alpha_w(f, px, py, T_carry, params.T_threshold, chunk)
        w, test_T, contrib = a["w"], a["test_T"], a["contrib"]
        if with_bg:
            # one-surface background model: entries behind the surface are
            # attenuated by tau; the surface color S lands once, scaled by
            # the transmittance over the FRONT entries (see blend.py)
            bgD = bgt_ref[0, :, 3:4]
            tau = bgt_ref[0, :, 4:5]
            behind = (f[9:10, :] > bgD) & (f[5:6, :] != 0.0)
            # behind entries: attenuate by tau AND terminate at the TRUE
            # transmittance test_T*tau (global-render early-exit parity)
            w = jnp.where(behind & (test_T * tau < params.T_threshold),
                          0.0, w * jnp.where(behind, tau, 1.0))
            within_front = _cumprod_lanes(
                jnp.where(behind, 1.0, a["one_m"]))
            T_front = T_carry * within_front[:, chunk - 1:chunk]
            has_behind = jnp.max(behind.astype(jnp.float32), axis=1,
                                 keepdims=True)
            crossed0 = state[:, S_CROSS:S_CROSS + 1]
            new_cross = (crossed0 < 0.5) & (has_behind > 0.5)
            state[:, S_C0:S_C2 + 1] = state[:, S_C0:S_C2 + 1] + jnp.where(
                new_cross, bgt_ref[0, :, 0:3] * T_front, 0.0)
            state[:, S_CROSS:S_CROSS + 1] = jnp.maximum(crossed0, has_behind)

        # per-entry touched-pixel count (ref forward.cu n_touched++; used by
        # the reference's USE_PURNE pruning): contributing with test_T > 0.5.
        nt_ref[0:1, :] = jnp.sum(
            (contrib & (test_T > 0.5)).astype(jnp.float32), axis=0,
            keepdims=True)

        # ONE MXU dot for [color x3 | wsum]: rows 6:9 are colors; row 5
        # replaced by ones via arithmetic (opacity lane not reusable) — use
        # a 4-row matrix built from f rows without concat: dot w with colors
        # gives 3 cols; wsum rides as sum over lanes fused into the same dot
        # by appending the gid row scaled to 1? Cheapest correct form: 3-col
        # dot + separate reduce (reduce is 1 pass).
        Cd = jax.lax.dot_general(                   # (n, 3)
            w, f[6:9, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        wsum = jnp.sum(w, axis=1, keepdims=True)
        state[:, S_C0:S_C2 + 1] = state[:, S_C0:S_C2 + 1] + Cd
        state[:, S_WSUM:S_WSUM + 1] = state[:, S_WSUM:S_WSUM + 1] + wsum

        # first-max color contributor (strict >, earliest max wins)
        kidx = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        cw = jnp.max(w, axis=1, keepdims=True)
        ksel = jnp.min(jnp.where(w >= cw, kidx, chunk), axis=1, keepdims=True)
        onehot = (kidx == ksel).astype(jnp.float32)
        cid = jax.lax.dot_general(
            onehot, f[14:15, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        best_w = state[:, S_BESTW:S_BESTW + 1]
        take = cw > best_w
        state[:, S_BESTW:S_BESTW + 1] = jnp.where(take, cw, best_w)
        state[:, S_BESTID:S_BESTID + 1] = jnp.where(
            take & (cw > 0), cid, state[:, S_BESTID:S_BESTID + 1])

        chunk_end = jnp.min(jnp.where(contrib, test_T, BIG), axis=1,
                            keepdims=True)
        state[:, S_ENDT:S_ENDT + 1] = jnp.minimum(
            state[:, S_ENDT:S_ENDT + 1], chunk_end)

        state[:, S_T:S_T + 1] = a["T_next"]

        # hit-Gaussian depth model (ref forward.cu:779-810): first entry
        # with alpha_raw >= opaque_threshold, selected by min-index. Skipped
        # for whole blocks once every pixel has its hit (common from the
        # 2nd chunk of a tile on).
        hit_found = state[:, S_HIT:S_HIT + 1]

        @pl.when(jnp.min(hit_found) < 0.5)
        def _hits():
            eligible = (~a["skip"]) & (
                a["alpha_raw"] >= params.opaque_threshold)
            esel = jnp.min(jnp.where(eligible, kidx, chunk), axis=1,
                           keepdims=True)
            chunk_has = (esel < chunk).astype(jnp.float32)
            efirst = (kidx == esel) & eligible
            fsel = efirst.astype(jnp.float32)

            ndr = f[10:11, :] * rx + f[11:12, :] * ry + f[12:13, :] * rz
            tt = f[15:16, :] / (ndr + 1e-8)
            hz = tt * rz
            plane_ok = (
                jnp.abs(hz - f[9:10, :])
                <= f[13:14, :] * params.depth_threshold
            ) & (jnp.abs(ndr) >= params.normal_threshold)
            depth_cand = jnp.where(plane_ok, hz, f[9:10, :])

            # per-ENTRY rows ride ONE MXU dot: [id+1, n0, n1, n2]; the two
            # per-(pixel,entry) selections (depth_cand, alpha*T_prev) stay
            # as fused reduce passes.
            sel4 = jax.lax.dot_general(             # (n, 4)
                fsel, f[10:14, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            sel_id = jax.lax.dot_general(
                fsel, f[14:15, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            sel_depth = jnp.sum(fsel * depth_cand, axis=1, keepdims=True)
            sel_w = jnp.sum(fsel * a["alpha"] * a["T_prev"], axis=1,
                            keepdims=True)

            new_hit = (hit_found < 0.5) & (chunk_has > 0.5)
            state[:, S_HIT:S_HIT + 1] = jnp.maximum(hit_found, chunk_has)
            # slab update of [S_HITID, S_HITD, S_HITDW, S_HITN0..2] (cols
            # 9..14 are contiguous by construction)
            cand = jnp.concatenate(
                [sel_id, sel_depth, sel_w, sel4[:, 0:3]], axis=1)
            state[:, S_HITID:S_HITN2 + 1] = jnp.where(
                new_hit, cand, state[:, S_HITID:S_HITN2 + 1])

    # flush the output block only on the LAST grid step of its tile (the
    # blockspec re-DMAs the out block on every index change; writing it on
    # every step costs ~30 (n_px,1) column writes per block)
    @pl.when(is_last)
    def _flush():
        end_T = state[:, S_ENDT:S_ENDT + 1]
        # color channels 0:3 + differentiable hit depth (3) + hit normal
        # (4:7, routed to the hit entry in the bwd kernel) + pad
        out_c = state[:, S_C0:S_C2 + 1] + jnp.concatenate(
            [end_T * bg[0], end_T * bg[1], end_T * bg[2]], axis=1)
        if with_bg:
            # surface behind every entry of this tile: composite at the end
            out_c = out_c + jnp.where(
                state[:, S_CROSS:S_CROSS + 1] < 0.5,
                bgt_ref[0, :, 0:3] * state[:, S_T:S_T + 1], 0.0)
        color_ref[0, :, 0:3] = out_c
        color_ref[0, :, 3:4] = state[:, S_HITD:S_HITD + 1]
        color_ref[0, :, 4:7] = state[:, S_HITN0:S_HITN2 + 1]
        color_ref[0, :, 7:8] = jnp.zeros((n_px, 1), jnp.float32)
        aux_ref[0, :, 0:1] = state[:, S_HITID:S_HITID + 1]
        aux_ref[0, :, 1:2] = state[:, S_BESTID:S_BESTID + 1]
        aux_ref[0, :, 2:3] = jnp.maximum(state[:, S_BESTW:S_BESTW + 1], 0.0)
        aux_ref[0, :, 3:4] = state[:, S_HITDW:S_HITDW + 1]
        aux_ref[0, :, 4:5] = end_T
        aux_ref[0, :, 5:6] = state[:, S_WSUM:S_WSUM + 1]
        aux_ref[0, :, 6:7] = state[:, S_T:S_T + 1]
        aux_ref[0, :, 7:8] = state[:, S_HITD:S_HITD + 1]


# ---------------------------------------------------------------------------
# backward kernel (forward chunk order; suffix = total - prefix)
# ---------------------------------------------------------------------------

def _bwd_kernel(block_tile_ref, scal_ref, f_ref, *rest, tw, tile_size,
                params: BlendParams, bg, with_bg=False, chunk=CHUNK):
    if with_bg:
        bgt_ref, dpix_ref, color_ref, aux_ref, dent_ref, sstate = rest
    else:
        bgt_ref = None
        dpix_ref, color_ref, aux_ref, dent_ref, sstate = rest
    bidx = pl.program_id(0)
    t = block_tile_ref[bidx]
    n_px = tile_size * tile_size
    is_first = jnp.logical_or(
        bidx == 0, block_tile_ref[jnp.maximum(bidx - 1, 0)] != t)
    active = t >= 0
    dent_ref[:, :] = jnp.zeros((NG, chunk), jnp.float32)

    @pl.when(is_first & active)
    def _init():
        # col0 = T prefix, col1 = dot-prefix carry, col2 = crossed flag
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_px, 8), 1)
        sstate[:, :] = jnp.where(cols == 0, 1.0, 0.0)

    saturated = jnp.max(sstate[:, 0:1]) < params.T_threshold

    # hit-depth gradient (ref backward.cu:997-1065): each pixel's depth
    # cotangent routes to its HIT entry only. Checked for every active chunk
    # (the hit entry can sit past the alpha-saturation point — CUDA keeps
    # scanning until the hit is found) but the math only runs when some
    # pixel's hit id actually lands in this chunk. plane branch:
    # hz = ndm/(ndr+eps)*rz -> d_ndm (row 15; pack autodiff spreads it over
    # mean_c & normal_c) and d_normal_c via ndr (rows 10:13); splat branch:
    # depth = f9 -> row 9. Branch choice and hit selection are
    # stop-gradient, exactly like CUDA.
    @pl.when(active)
    def _depth_grads():
        f = f_ref[:, :]
        hid = aux_ref[0, :, 0:1]
        hit_mask = (f[14:15, :] == hid) & (hid >= 0)

        @pl.when(jnp.any(hit_mask))
        def _route():
            px, py, rx, ry, rz = _tile_pixels(t, tw, tile_size, scal_ref)
            d3 = dpix_ref[0, :, 3:4]
            ndr = f[10:11, :] * rx + f[11:12, :] * ry + f[12:13, :] * rz
            inv_ndr = 1.0 / (ndr + 1e-8)
            hz = f[15:16, :] * inv_ndr * rz
            plane_ok = (
                jnp.abs(hz - f[9:10, :])
                <= f[13:14, :] * params.depth_threshold
            ) & (jnp.abs(ndr) >= params.normal_threshold)
            dd = jnp.where(hit_mask, d3, 0.0)
            dd_plane = jnp.where(plane_ok, dd, 0.0)
            dd_splat = dd - dd_plane
            d_ndr = dd_plane * (-f[15:16, :] * inv_ndr * inv_ndr) * rz
            # hit-normal channels (4:7): cotangents route straight to the
            # hit entry's normal_c rows, additively with the d_ndr terms
            dn0 = jnp.where(hit_mask, dpix_ref[0, :, 4:5], 0.0)
            dn1 = jnp.where(hit_mask, dpix_ref[0, :, 5:6], 0.0)
            dn2 = jnp.where(hit_mask, dpix_ref[0, :, 6:7], 0.0)
            dent_ref[9:10, :] = jnp.sum(dd_splat, axis=0, keepdims=True)
            dent_ref[10:11, :] = jnp.sum(d_ndr * rx + dn0, axis=0,
                                         keepdims=True)
            dent_ref[11:12, :] = jnp.sum(d_ndr * ry + dn1, axis=0,
                                         keepdims=True)
            dent_ref[12:13, :] = jnp.sum(d_ndr * rz + dn2, axis=0,
                                         keepdims=True)
            dent_ref[15:16, :] = jnp.sum(dd_plane * inv_ndr * rz, axis=0,
                                         keepdims=True)

    @pl.when(active & ~saturated)
    def _process():
        px, py, rx, ry, rz = _tile_pixels(t, tw, tile_size, scal_ref)
        f = f_ref[:, :]
        d0 = dpix_ref[0, :, 0:1]
        d1 = dpix_ref[0, :, 1:2]
        d2 = dpix_ref[0, :, 2:3]
        end_T = aux_ref[0, :, 4:5]
        bgdot = d0 * bg[0] + d1 * bg[1] + d2 * bg[2]
        # total accumulated splat color (strip the bg term the fwd added)
        dot_total = (
            (color_ref[0, :, 0:1] - end_T * bg[0]) * d0
            + (color_ref[0, :, 1:2] - end_T * bg[1]) * d1
            + (color_ref[0, :, 2:3] - end_T * bg[2]) * d2
        )

        T_carry = sstate[:, 0:1]
        a = _alpha_w(f, px, py, T_carry, params.T_threshold, chunk)
        w, T_prev, contrib = a["w"], a["T_prev"], a["contrib"]

        # cd = sum_c dpix_c * color_c per (pixel, entry)
        cd = f[6:7, :] * d0 + f[7:8, :] * d1 + f[8:9, :] * d2
        if with_bg:
            # one-surface background (see fwd): per-entry tau factor for
            # behind entries; the surface's own dot term enters the running
            # prefix at the crossing so front/behind suffixes split exactly
            bgD = bgt_ref[0, :, 3:4]
            tau = bgt_ref[0, :, 4:5]
            behind = (f[9:10, :] > bgD) & (f[5:6, :] != 0.0)
            cut = behind & (a["test_T"] * tau < params.T_threshold)
            tfac = jnp.where(cut, 0.0, jnp.where(behind, tau, 1.0))
            w = w * tfac
            within_front = _cumprod_lanes(
                jnp.where(behind, 1.0, a["one_m"]))
            T_front = T_carry * within_front[:, chunk - 1:chunk]
            sdot = (bgt_ref[0, :, 0:1] * d0 + bgt_ref[0, :, 1:2] * d1
                    + bgt_ref[0, :, 2:3] * d2) * T_front
            has_behind = jnp.max(behind.astype(jnp.float32), axis=1,
                                 keepdims=True)
            crossed0 = sstate[:, 2:3]
            new_cross = ((crossed0 < 0.5) & (has_behind > 0.5)).astype(
                jnp.float32)
            surf_add = jnp.where(behind, new_cross * sdot, 0.0)
        else:
            tfac = 1.0
            new_cross = None
            surf_add = 0.0
        wcd = w * cd
        prefix_incl = sstate[:, 1:2] + _cumsum_lanes(wcd) + surf_add
        suffix_dot = dot_total - prefix_incl       # sum_{j>k} w_j (c_j . d)

        inv1m = 1.0 / a["one_m"]
        dL_dalpha = (
            cd * T_prev * tfac - suffix_dot * inv1m - end_T * inv1m * bgdot
        )
        dL_dalpha = jnp.where(contrib, dL_dalpha, 0.0)

        dL_dG = f[5:6, :] * dL_dalpha
        ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
        gl = dL_dG * a["G"]
        dx, dy = a["dx"], a["dy"]
        dent_ref[0:1, :] = jnp.sum(gl * (-(ca * dx + cb * dy)), axis=0,
                                   keepdims=True)
        dent_ref[1:2, :] = jnp.sum(gl * (-(cc * dy + cb * dx)), axis=0,
                                   keepdims=True)
        dent_ref[2:3, :] = jnp.sum(gl * (-0.5 * dx * dx), axis=0,
                                   keepdims=True)
        dent_ref[3:4, :] = jnp.sum(gl * (-dx * dy), axis=0, keepdims=True)
        dent_ref[4:5, :] = jnp.sum(gl * (-0.5 * dy * dy), axis=0,
                                   keepdims=True)
        dent_ref[5:6, :] = jnp.sum(a["G"] * dL_dalpha, axis=0, keepdims=True)
        dent_ref[6:7, :] = jnp.sum(w * d0, axis=0, keepdims=True)
        dent_ref[7:8, :] = jnp.sum(w * d1, axis=0, keepdims=True)
        dent_ref[8:9, :] = jnp.sum(w * d2, axis=0, keepdims=True)

        sstate[:, 0:1] = a["T_next"]
        if with_bg:
            # carry: cumulative dot prefix incl. the surface term exactly
            # once after the crossing; crossed flag persists
            sstate[:, 1:2] = (sstate[:, 1:2]
                              + _cumsum_lanes(wcd)[:, chunk - 1:chunk]
                              + new_cross * sdot)
            sstate[:, 2:3] = jnp.maximum(sstate[:, 2:3], has_behind)
        else:
            sstate[:, 1:2] = prefix_incl[:, chunk - 1:chunk]


# ---------------------------------------------------------------------------
# host-side custom-VJP op
# ---------------------------------------------------------------------------

def _grid_arg(nb, n_blocks_static):
    """Dynamic grid on hardware; interpret mode needs a concrete size."""
    if _interpret():
        return n_blocks_static
    return jnp.maximum(nb, 1)


def _fwd_call(feats, block_tile, nb, scal, bgt, num_tiles, tile_size, tw,
              params, bg, with_bg, chunk):
    """Grid is 1-D over the `nb` USED entry blocks (traced — the static
    entry_cap tail is never visited); per-block tile ownership arrives via
    the scalar-prefetched `block_tile` array (sentinel -1 for unused blocks,
    only reachable in interpret mode's static grid). Empty tiles get their
    init values pasted by the caller afterwards."""
    n_px = tile_size * tile_size
    n_blocks = feats.shape[1] // chunk

    def out_index(b, bt, scal_):
        t = bt[b]
        return (jnp.where(t >= 0, t, num_tiles), 0, 0)

    in_specs = [
        pl.BlockSpec((NF, chunk), lambda b, *_: (0, b),
                     memory_space=pltpu.VMEM),
    ]
    operands = [feats]
    if with_bg:
        in_specs.append(pl.BlockSpec((1, n_px, NB), out_index,
                                     memory_space=pltpu.VMEM))
        operands.append(bgt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_arg(nb, n_blocks),),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, n_px, NC), out_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_px, NA), out_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((n_px, NS), jnp.float32)],
    )
    kernel = functools.partial(
        _fwd_kernel, tw=tw, tile_size=tile_size, params=params, bg=bg,
        with_bg=with_bg, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles + 1, n_px, NC), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, n_px, NA), jnp.float32),
            jax.ShapeDtypeStruct((1, feats.shape[1]), jnp.float32),
        ],
        interpret=_interpret(),
    )(block_tile, scal, *operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _blend_core(feats, block_tile, nb, scal, bgt, num_tiles, tile_size, tw,
                params, bg, with_bg, chunk=CHUNK):
    color, aux, nt = _fwd_call(feats, block_tile, nb, scal, bgt, num_tiles,
                               tile_size, tw, params, bg, with_bg, chunk)
    return color, aux, nt


def _blend_core_fwd(feats, block_tile, nb, scal, bgt, num_tiles, tile_size,
                    tw, params, bg, with_bg, chunk=CHUNK):
    color, aux, nt = _fwd_call(feats, block_tile, nb, scal, bgt, num_tiles,
                               tile_size, tw, params, bg, with_bg, chunk)
    return (color, aux, nt), (feats, block_tile, nb, scal, bgt, color, aux)


def _blend_core_bwd(num_tiles, tile_size, tw, params, bg, with_bg, chunk,
                    res, cts):
    feats, block_tile, nb, scal, bgt, color, aux = res
    dcolor, _daux, _dnt = cts
    n_px = tile_size * tile_size
    Lp = feats.shape[1]
    n_blocks = Lp // chunk

    def px_index(b, bt, scal_):
        t = bt[b]
        return (jnp.where(t >= 0, t, num_tiles), 0, 0)

    in_specs = [
        pl.BlockSpec((NF, chunk), lambda b, *_: (0, b),
                     memory_space=pltpu.VMEM),
    ]
    operands = [feats]
    if with_bg:
        in_specs.append(pl.BlockSpec((1, n_px, NB), px_index,
                                     memory_space=pltpu.VMEM))
        operands.append(bgt)
    in_specs += [
        pl.BlockSpec((1, n_px, NC), px_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_px, NC), px_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_px, NA), px_index, memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_arg(nb, n_blocks),),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((NG, chunk), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((n_px, 8), jnp.float32)],
    )
    kernel = functools.partial(
        _bwd_kernel, tw=tw, tile_size=tile_size, params=params, bg=bg,
        with_bg=with_bg, chunk=chunk)
    dent = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NG, Lp), jnp.float32)],
        interpret=_interpret(),
    )(block_tile, scal, *operands, dcolor, color, aux)[0]

    valid = feats[5:6, :] != 0.0            # opacity lane doubles as valid
    dfeats = jnp.where(valid, dent, 0.0)    # rows align with feature rows
    d_bt = np.zeros(block_tile.shape, jdtypes.float0)
    d_nb = np.zeros((), jdtypes.float0)
    return dfeats, d_bt, d_nb, jnp.zeros_like(scal), jnp.zeros_like(bgt)


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


def pack_entries(pre, b, colors, opacities):
    """Feature-major (16, entry_cap) pack: every row is a dense gather from a
    stacked (14, P) array — no narrow-minor-dim intermediates. Invalid
    entries get opacity 0, which doubles as the validity lane. The hit-plane
    model needs only mean_c's z (== depth) and ndm = normal_c . mean_c, so
    mean_c x/y are never shipped."""
    g = b.point_list
    P = pre.xy.shape[0]
    xyT = pre.xy.T
    coT = pre.conic.T
    clT = colors.T
    mcT = pre.mean_c.T
    ncT = pre.normal_c.T
    ndm = (mcT[0] * ncT[0] + mcT[1] * ncT[1] + mcT[2] * ncT[2])
    # the gid row rides the SAME gather as an arange table (gathered
    # arange(P)[g] == g), so the pack is exactly ONE 16-row take with no
    # post-concat — the r05 HLO audit showed the old 15-row take + concat
    # materializing several (16, L) pad/add/copy trios per iteration
    rows = [
        xyT[0], xyT[1], coT[0], coT[1], coT[2], opacities,
        clT[0], clT[1], clT[2], pre.depth,
        ncT[0], ncT[1], ncT[2], pre.scale_max,
        jnp.arange(P, dtype=jnp.float32), ndm,
    ]
    stacked = jnp.stack(rows, axis=0)                     # (16, P)
    feats = jnp.take(stacked, g, axis=1)                  # (16, L)
    # invalid entries: opacity lane -> 0 (doubles as the validity lane);
    # ONE fused select over the row via a row+validity mask product
    rowsel = (jnp.arange(NF) == 5).astype(jnp.float32)[:, None]
    val = b.entry_valid.astype(jnp.float32)[None, :]
    return feats * (1.0 - rowsel * (1.0 - val))


def tile_map(x, tile_size: int, width: int, height: int):
    """(H,W[,C]) -> (num_tiles, n_px[,C]) in the kernels' tile-row order
    (zero-padded edge tiles). The inverse of the untile in
    `blend_tiles_pallas`; used to move GT maps into tile space ONCE per
    optimize scan so the per-iteration loss runs layout-free."""
    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    C = x.shape[-1]
    pad_h = TH * tile_size - height
    pad_w = TW * tile_size - width
    x = jnp.pad(x, ((0, pad_h), (0, pad_w), (0, 0)))
    x = x.reshape(TH, tile_size, TW, tile_size, C)
    x = jnp.moveaxis(x, 2, 1).reshape(TH * TW, tile_size * tile_size, C)
    return x[..., 0] if squeeze else x


def untile_map(x, tile_size: int, width: int, height: int):
    """(num_tiles, n_px[,C]) -> (H,W[,C]): inverse of `tile_map`."""
    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    C = x.shape[-1]
    x = x.reshape(TH, TW, tile_size, tile_size, C)
    x = jnp.moveaxis(x, 2, 1).reshape(TH * tile_size, TW * tile_size, C)
    x = x[:height, :width]
    return x[..., 0] if squeeze else x


def pack_bg_tiled(S, D, tau):
    """Assemble the kernel's (num_tiles+1, n_px, NB) background operand from
    ALREADY-TILED maps (S (T,n_px,3), D (T,n_px), tau (T,n_px)) — the
    optimize scans render the stable background with `tiled=True` and pack
    it once per scan, skipping `tile_px_maps`' image->tile transposes."""
    T, n_px = D.shape
    cat = jnp.concatenate(
        [S, D[..., None], tau[..., None],
         jnp.zeros((T, n_px, NB - 5), S.dtype)], axis=-1)
    return jnp.concatenate([cat, jnp.zeros((1, n_px, NB), S.dtype)], axis=0)


def tile_px_maps(maps: list, tile_size: int, width: int, height: int,
                 num_tiles: int):
    """Stack (H,W[,C]) maps into the kernels' (num_tiles+1, n_px, NB) layout
    (channel-padded to NB; +1 sentinel tile for inactive blocks)."""
    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size
    cat = jnp.concatenate(
        [m[..., None] if m.ndim == 2 else m for m in maps], axis=-1)
    C = cat.shape[-1]
    pad_h = TH * tile_size - height
    pad_w = TW * tile_size - width
    cat = jnp.pad(cat, ((0, pad_h), (0, pad_w), (0, NB - C)))
    cat = cat.reshape(TH, tile_size, TW, tile_size, NB)
    cat = jnp.moveaxis(cat, 2, 1).reshape(num_tiles,
                                          tile_size * tile_size, NB)
    return jnp.concatenate(
        [cat, jnp.zeros((1, tile_size * tile_size, NB), cat.dtype)], axis=0)


def blend_tiles_pallas(pre, b, entry_valid, colors, opacities, num_tiles,
                       tile_size, width, height, K, params: BlendParams, bg,
                       max_chunks: int = 32, bg_tiled=None,
                       tiled: bool = False, chunk: int = CHUNK):
    """Drop-in twin of `blend.blend_tiles_ref` backed by the Pallas kernels.

    `bg_tiled` ((num_tiles+1, n_px, NB), from `tile_px_maps([S, D, tau])`)
    enables the one-surface background composite (see blend.py).

    `tiled=True` returns every map in the kernel's NATIVE (num_tiles, n_px
    [, C]) layout instead of (H, W[, C]). The untile is ~12 per-channel 2-D
    transposes whose VJPs retile the cotangents — ~19 ms/iter of pure
    layout churn inside the optimize scans (r05 profile); tile-space
    consumers (the scan losses) skip all of it and feed cotangents to the
    custom VJP in the layout it already wants."""
    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size

    feats = pack_entries(pre, b, colors, opacities)
    block_tile = b.block_tile
    scal = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(jnp.float32)
    bg_static = tuple(float(x) for x in np.asarray(bg).tolist())
    with_bg = bg_tiled is not None
    bgt = (jax.lax.stop_gradient(bg_tiled) if with_bg
           else jnp.zeros((1, 1, NB), jnp.float32))
    color, aux, nt = _blend_core(
        feats, block_tile, b.num_blocks, scal, bgt, num_tiles, tile_size, TW,
        params, bg_static, with_bg, chunk,
    )
    color = color[:num_tiles]
    aux = aux[:num_tiles]
    nt = jax.lax.stop_gradient(nt)

    # tiles with no entries never flush a block: paste their init values
    empty = (b.tile_offsets[1:] == b.tile_offsets[:-1])[:, None, None]
    bgv = jnp.asarray(bg_static + (0.0,) * (NC - 3), jnp.float32)
    color = jnp.where(empty, bgv[None, None, :], color)
    if with_bg:
        # empty tiles show the bare background surface (T == 1)
        color = color.at[:, :, 0:3].set(jnp.where(
            empty, bgt[:num_tiles, :, 0:3], color[:, :, 0:3]))
    aux_init = jnp.asarray([-1.0, -1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0],
                           jnp.float32)
    aux = jnp.where(empty, aux_init[None, None, :], aux)
    aux = jax.lax.stop_gradient(aux)

    if tiled:
        untile = lambda x: x                           # noqa: E731
        pick = lambda x, c: x[:, :, c]                 # noqa: E731
        stack3 = lambda xs: jnp.stack(xs, axis=-1)     # noqa: E731
        render = color[:, :, 0:3]
    else:
        def untile(x):
            x = x.reshape(TH, TW, tile_size, tile_size)
            x = jnp.moveaxis(x, 2, 1).reshape(TH * tile_size, TW * tile_size)
            return x[:height, :width]

        pick = lambda x, c: untile(x[:, :, c])         # noqa: E731
        stack3 = lambda xs: jnp.stack(xs, axis=-1)     # noqa: E731
        render = stack3([untile(color[:, :, c]) for c in range(3)])
    return {
        "render": render,
        "depth": pick(color, 3),
        "normal_c": (color[:, :, 4:7] if tiled else
                     stack3([untile(color[:, :, 4 + c]) for c in range(3)])),
        "depth_index_map": jnp.round(pick(aux, 0)).astype(jnp.int32),
        "color_index_map": jnp.round(pick(aux, 1)).astype(jnp.int32),
        "color_hit_weight": pick(aux, 2),
        "depth_hit_weight": pick(aux, 3),
        "T_map": pick(aux, 4),
        "weight_sum": pick(aux, 5),
        "T_final": pick(aux, 6),
        "n_touched_entries": nt[0].astype(jnp.int32),
    }
