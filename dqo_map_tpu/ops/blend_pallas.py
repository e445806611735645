"""Pallas TPU kernel for the per-tile front-to-back blend (fwd + custom VJP).

TPU-native replacement for `renderCUDA_withMask` (forward.cu:638-866) and
`BACKWARD::renderCUDA_flat` (backward.cu:809-1065):

- grid = one program per pixel tile; per-tile entry ranges arrive via scalar
  prefetch (the CUDA flat-dispatch `tile_indices` compaction is unnecessary:
  empty tiles fall through a zero-trip loop);
- depth-sorted entries are packed as (L, 16) float32 in HBM and DMA'd
  chunk-by-chunk into VMEM;
- the sequential alpha-compositing recurrence runs as chunked cumulative
  sums of log(1-alpha) via a Hillis-Steele doubling scan (full-f32 VPU adds;
  a triangular-matmul variant costs MXU mantissa in the transmittance
  chain) — see `blend.py` for the math derivation and the pure-JAX twin;
- backward walks chunks in REVERSE carrying per-pixel suffix color sums and
  reconstructs T_prev from the forward's total log transmittance (the same
  trick as CUDA's `T = T / (1 - alpha)` back-walk), streaming per-entry
  gradients to HBM with async copies. Writes are race-free because the TPU
  grid is sequential and each entry belongs to exactly one tile.

Mosaic layout discipline: every vector stays 2-D — per-pixel rows are
(1, n_px), per-entry columns are (K, 1); 1-D vectors hit unsupported shape
casts in infer-vector-layout.

Entry feature packing (float32 x 16):
  0:2 xy | 2:5 conic | 5 opacity | 6:9 color | 9 depth | 10:13 mean_c
  | 13:16 normal_c ; aux array (L, 8): 0 scale_max | 1 gauss_id | 2 valid.

Gradients cover the color/alpha path (xy, conic, opacity, color); depth and
normal gradients are recovered outside the kernel from the integer hit-index
maps (see `rasterize._recompute_depth`), exactly as the CUDA backward treats
the hit Gaussian as a fixed selection. Like the CUDA kernel
(backward.cu:948-996), the 0.99 alpha clamp is straight-through in backward.
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

CHUNK = 256          # entries per DMA/compute chunk
NF = 16              # feature columns (xy conic opacity color depth mean_c normal_c)
NA = 8               # aux columns (scale_max, gauss_id, valid) at offset NF
NE = 128             # entry row width: Mosaic DMA slices need 128-lane rows
NG = 16              # per-entry gradient lanes (9 used: dxy dconic dop dcol)
NGE = 128            # gradient row width (same 128-lane constraint)
BIG = 1e30


def _interpret() -> bool:
    if os.environ.get("DQO_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def _cumsum_incl(x):
    """Inclusive cumsum along axis 0 via a Hillis-Steele doubling scan."""
    K = x.shape[0]
    s = 1
    while s < K:
        shifted = jnp.concatenate(
            [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s, :]], axis=0
        )
        x = x + shifted
        s <<= 1
    return x


def _cumsum_excl_rev(x):
    """out[k] = sum_{j>k} x[j]."""
    total = jnp.sum(x, axis=0, keepdims=True)
    return total - _cumsum_incl(x)


def _alpha_terms(ef, ea, pix_x, pix_y, in_range):
    """pix_x/pix_y: (1,n). Returns (K,n) blending terms."""
    dx = ef[:, 0:1] - pix_x
    dy = ef[:, 1:2] - pix_y
    ca, cb, cc = ef[:, 2:3], ef[:, 3:4], ef[:, 4:5]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha_raw = jnp.minimum(ALPHA_MAX, ef[:, 5:6] * G)
    valid = (ea[:, 2:3] > 0.5) & in_range
    skip = (power > 0.0) | (alpha_raw < ALPHA_MIN) | (~valid)
    alpha = jnp.where(skip, 0.0, alpha_raw)
    return alpha, alpha_raw, skip, jnp.log1p(-alpha), G, dx, dy


def _tile_pixels(t, tw, tile_size, scal):
    """Pixel coords + unit rays for tile t, all (1, n)."""
    n = tile_size * tile_size
    ty = t // tw
    tx = t % tw
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    px = (tx * tile_size + j % tile_size).astype(jnp.float32)
    py = (ty * tile_size + j // tile_size).astype(jnp.float32)
    fx, fy, cx, cy = scal[0], scal[1], scal[2], scal[3]
    rx = (px - cx) / fx
    ry = (py - cy) / fy
    inv = jax.lax.rsqrt(rx * rx + ry * ry + 1.0)
    return px, py, rx * inv, ry * inv, inv


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(offsets_ref, scal_ref, ent_hbm, color_ref, aux_ref,
                ent_vmem, sem, *, tw, tile_size,
                params: BlendParams, bg):
    t = pl.program_id(0)
    n_px = tile_size * tile_size
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    num_chunks = (end - start + CHUNK - 1) // CHUNK

    px, py, rx, ry, rz = _tile_pixels(t, tw, tile_size, scal_ref)

    def body(c, carry):
        (logT, C0, C1, C2, wsum, end_T, best_w, best_id, hit_found, hit_id,
         hit_depth, hit_dw) = carry
        base = start + c * CHUNK
        cp = pltpu.make_async_copy(
            ent_hbm.at[pl.ds(base, CHUNK), :], ent_vmem, sem.at[0])
        cp.start()
        cp.wait()
        ef = ent_vmem[:, 0:NF]
        ea = ent_vmem[:, NF:NF + NA]
        lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        in_range = (base + lane) < end

        alpha, alpha_raw, skip, log1m, G, dx, dy = _alpha_terms(
            ef, ea, px, py, in_range)
        cum = logT + _cumsum_incl(log1m)                # (K,n)
        test_T = jnp.exp(cum)
        T_prev = jnp.exp(cum - log1m)
        contrib = (~skip) & (test_T >= params.T_threshold)
        w = jnp.where(contrib, alpha * T_prev, 0.0)

        col = ef[:, 6:9]
        Cd = jax.lax.dot_general(          # (3, n)
            col, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        C0n = C0 + Cd[0:1]
        C1n = C1 + Cd[1:2]
        C2n = C2 + Cd[2:3]
        wsum_n = wsum + jnp.sum(w, axis=0, keepdims=True)

        # first-max color contributor (strict >, earliest max wins)
        kidx = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        cw = jnp.max(w, axis=0, keepdims=True)
        ksel = jnp.min(jnp.where(w >= cw, kidx, CHUNK), axis=0, keepdims=True)
        onehot = (kidx == ksel).astype(jnp.float32)
        cid = jnp.sum(onehot * ea[:, 1:2], axis=0, keepdims=True)
        take = cw > best_w
        best_w_n = jnp.where(take, cw, best_w)
        best_id_n = jnp.where(take & (cw > 0), cid, best_id)

        chunk_end = jnp.min(jnp.where(contrib, test_T, BIG), axis=0,
                            keepdims=True)
        end_T_n = jnp.minimum(end_T, chunk_end)

        # hit-Gaussian depth model (ref forward.cu:779-810)
        eligible = (~skip) & (alpha_raw >= params.opaque_threshold)
        efirst = eligible & (_cumsum_incl(eligible.astype(jnp.float32)) < 1.5)
        chunk_has = jnp.max(eligible.astype(jnp.float32), axis=0,
                            keepdims=True)  # f32 0/1: bool loop carries fail
                                            # to legalize in Mosaic

        ndm = (ef[:, 10:11] * ef[:, 13:14] + ef[:, 11:12] * ef[:, 14:15]
               + ef[:, 12:13] * ef[:, 15:16])            # (K,1)
        ndr = (ef[:, 13:14] * rx + ef[:, 14:15] * ry + ef[:, 15:16] * rz)
        tt = ndm / (ndr + 1e-8)
        hz = tt * rz
        plane_ok = (
            jnp.abs(hz - ef[:, 12:13]) <= ea[:, 0:1] * params.depth_threshold
        ) & (jnp.abs(ndr) >= params.normal_threshold)
        depth_cand = jnp.where(plane_ok, hz, ef[:, 9:10])

        fsel = efirst.astype(jnp.float32)
        sel_depth = jnp.sum(fsel * depth_cand, axis=0, keepdims=True)
        sel_w = jnp.sum(fsel * alpha * T_prev, axis=0, keepdims=True)
        sel_id = jnp.sum(fsel * (ea[:, 1:2] + 1.0), axis=0, keepdims=True) - 1.0

        new_hit = (hit_found < 0.5) & (chunk_has > 0.5)
        return (
            logT + jnp.sum(log1m, axis=0, keepdims=True),
            C0n, C1n, C2n, wsum_n, end_T_n, best_w_n, best_id_n,
            jnp.maximum(hit_found, chunk_has),
            jnp.where(new_hit, sel_id, hit_id),
            jnp.where(new_hit, sel_depth, hit_depth),
            jnp.where(new_hit, sel_w, hit_dw),
        )

    z = jnp.zeros((1, n_px), jnp.float32)
    init = (z, z, z, z, z, jnp.ones((1, n_px), jnp.float32),
            jnp.full((1, n_px), -1.0, jnp.float32),
            jnp.full((1, n_px), -1.0, jnp.float32),
            z,
            jnp.full((1, n_px), -1.0, jnp.float32), z, z)
    (logT, C0, C1, C2, wsum, end_T, best_w, best_id, _hit, hit_id,
     hit_depth, hit_dw) = jax.lax.fori_loop(0, num_chunks, body, init)

    color_ref[0, 0:1, :] = C0 + end_T * bg[0]
    color_ref[0, 1:2, :] = C1 + end_T * bg[1]
    color_ref[0, 2:3, :] = C2 + end_T * bg[2]
    aux_ref[0, 0:1, :] = hit_id
    aux_ref[0, 1:2, :] = best_id
    aux_ref[0, 2:3, :] = jnp.maximum(best_w, 0.0)
    aux_ref[0, 3:4, :] = hit_dw
    aux_ref[0, 4:5, :] = end_T
    aux_ref[0, 5:6, :] = wsum
    aux_ref[0, 6:7, :] = logT
    aux_ref[0, 7:8, :] = hit_depth


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(offsets_ref, scal_ref, ent_hbm, dpix_ref, aux_ref,
                dent_hbm, ent_vmem, dent_vmem, sem, wsem,
                *, tw, tile_size, params: BlendParams, bg):
    t = pl.program_id(0)
    n_px = tile_size * tile_size
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    num_chunks = (end - start + CHUNK - 1) // CHUNK

    px, py, rx, ry, rz = _tile_pixels(t, tw, tile_size, scal_ref)

    d0 = dpix_ref[0, 0:1, :]                # (1, n)
    d1 = dpix_ref[0, 1:2, :]
    d2 = dpix_ref[0, 2:3, :]
    logT_total = aux_ref[0, 6:7, :]
    end_T = aux_ref[0, 4:5, :]
    bgdot = d0 * bg[0] + d1 * bg[1] + d2 * bg[2]

    def body(i, carry):
        suffix_log, s0, s1, s2 = carry
        c = num_chunks - 1 - i
        base = start + c * CHUNK
        cp = pltpu.make_async_copy(
            ent_hbm.at[pl.ds(base, CHUNK), :], ent_vmem, sem.at[0])
        cp.start()
        cp.wait()
        ef = ent_vmem[:, 0:NF]
        ea = ent_vmem[:, NF:NF + NA]
        lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        in_range = (base + lane) < end

        alpha, alpha_raw, skip, log1m, G, dx, dy = _alpha_terms(
            ef, ea, px, py, in_range)
        suffix_after = suffix_log + _cumsum_excl_rev(log1m)
        log_test = logT_total - suffix_after
        test_T = jnp.exp(log_test)
        T_prev = jnp.exp(log_test - log1m)
        contrib = (~skip) & (test_T >= params.T_threshold)
        w = jnp.where(contrib, alpha * T_prev, 0.0)

        col = ef[:, 6:9]
        wc0 = w * col[:, 0:1]
        wc1 = w * col[:, 1:2]
        wc2 = w * col[:, 2:3]
        suf0 = s0 + _cumsum_excl_rev(wc0)
        suf1 = s1 + _cumsum_excl_rev(wc1)
        suf2 = s2 + _cumsum_excl_rev(wc2)

        inv1m = 1.0 / (1.0 - alpha)          # alpha <= 0.99
        dL_dalpha = (
            (col[:, 0:1] * T_prev - suf0 * inv1m) * d0
            + (col[:, 1:2] * T_prev - suf1 * inv1m) * d1
            + (col[:, 2:3] * T_prev - suf2 * inv1m) * d2
            - end_T * inv1m * bgdot
        )
        dL_dalpha = jnp.where(contrib, dL_dalpha, 0.0)

        dL_dG = ef[:, 5:6] * dL_dalpha
        ca, cb, cc = ef[:, 2:3], ef[:, 3:4], ef[:, 4:5]
        gl = dL_dG * G
        dent_vmem[:, 0:1] = jnp.sum(gl * (-(ca * dx + cb * dy)), axis=1,
                                    keepdims=True)
        dent_vmem[:, 1:2] = jnp.sum(gl * (-(cc * dy + cb * dx)), axis=1,
                                    keepdims=True)
        dent_vmem[:, 2:3] = jnp.sum(gl * (-0.5 * dx * dx), axis=1,
                                    keepdims=True)
        dent_vmem[:, 3:4] = jnp.sum(gl * (-dx * dy), axis=1, keepdims=True)
        dent_vmem[:, 4:5] = jnp.sum(gl * (-0.5 * dy * dy), axis=1,
                                    keepdims=True)
        dent_vmem[:, 5:6] = jnp.sum(G * dL_dalpha, axis=1, keepdims=True)
        dent_vmem[:, 6:7] = jnp.sum(w * d0, axis=1, keepdims=True)
        dent_vmem[:, 7:8] = jnp.sum(w * d1, axis=1, keepdims=True)
        dent_vmem[:, 8:9] = jnp.sum(w * d2, axis=1, keepdims=True)
        dent_vmem[:, 9:] = jnp.zeros((CHUNK, NGE - 9), jnp.float32)
        wr = pltpu.make_async_copy(
            dent_vmem, dent_hbm.at[pl.ds(base, CHUNK), :], wsem)
        wr.start()
        wr.wait()

        return (
            suffix_log + jnp.sum(log1m, axis=0, keepdims=True),
            s0 + jnp.sum(wc0, axis=0, keepdims=True),
            s1 + jnp.sum(wc1, axis=0, keepdims=True),
            s2 + jnp.sum(wc2, axis=0, keepdims=True),
        )

    z = jnp.zeros((1, n_px), jnp.float32)
    jax.lax.fori_loop(0, num_chunks, body, (z, z, z, z))


# ---------------------------------------------------------------------------
# host-side custom-VJP op
# ---------------------------------------------------------------------------

def _fwd_call(ent, offsets, scal, num_tiles, tile_size, tw, params, bg):
    n_px = tile_size * tile_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, n_px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NA, n_px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, NE), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tw=tw, tile_size=tile_size, params=params, bg=bg)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, n_px), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NA, n_px), jnp.float32),
        ],
        interpret=_interpret(),
    )(offsets, scal, ent)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _blend_core(ent, offsets, scal, num_tiles, tile_size, tw, params, bg):
    color, aux = _fwd_call(ent, offsets, scal, num_tiles, tile_size, tw,
                           params, bg)
    return color, aux


def _blend_core_fwd(ent, offsets, scal, num_tiles, tile_size, tw, params,
                    bg):
    color, aux = _fwd_call(ent, offsets, scal, num_tiles, tile_size, tw,
                           params, bg)
    return (color, aux), (ent, offsets, scal, aux)


def _blend_core_bwd(num_tiles, tile_size, tw, params, bg, res, cts):
    ent, offsets, scal, aux = res
    dcolor, _daux = cts
    n_px = tile_size * tile_size
    Lp = ent.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 3, n_px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NA, n_px), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, NE), jnp.float32),
            pltpu.VMEM((CHUNK, NGE), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tw=tw, tile_size=tile_size, params=params, bg=bg)
    dent = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Lp, NGE), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, scal, ent, dcolor, aux)[0]

    valid = ent[:, NF + 2:NF + 3] > 0.5
    dent = jnp.where(valid, dent, 0.0)
    dent_full = jnp.zeros_like(ent)
    dent_full = dent_full.at[:, 0:9].set(dent[:, 0:9])  # xy conic op color
    d_off = np.zeros(offsets.shape, jdtypes.float0)
    return dent_full, d_off, jnp.zeros_like(scal)


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


def _pack_entries(pre, b, entry_valid, colors, opacities):
    """One (L, 128) row per entry; cols 0:16 features, 16:19 aux, rest pad.

    128-lane rows are a Mosaic DMA requirement (narrower dynamic row slices
    fail to legalize); the padding costs HBM bandwidth and is the first
    target for a packed-layout optimization.
    """
    g = b.point_list
    ent = jnp.concatenate(
        [
            pre.xy[g], pre.conic[g], opacities[g][:, None], colors[g],
            pre.depth[g][:, None], pre.mean_c[g], pre.normal_c[g],
            pre.scale_max[g][:, None],
            g.astype(jnp.float32)[:, None],
            entry_valid.astype(jnp.float32)[:, None],
            jnp.zeros((g.shape[0], NE - NF - 3), jnp.float32),
        ],
        axis=1,
    )
    return ent


def blend_tiles_pallas(pre, b, entry_valid, colors, opacities, num_tiles,
                       tile_size, width, height, K, params: BlendParams, bg):
    """Drop-in twin of `blend.blend_tiles_ref` backed by the Pallas kernels."""
    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size

    ent = _pack_entries(pre, b, entry_valid, colors, opacities)
    # pad so chunk DMAs past the tail stay in bounds
    ent = jnp.concatenate([ent, jnp.zeros((CHUNK, NE), jnp.float32)], axis=0)

    scal = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(jnp.float32)
    bg_static = tuple(float(x) for x in np.asarray(bg).tolist())
    color, aux = _blend_core(
        ent, b.tile_offsets, scal, num_tiles, tile_size, TW, params,
        bg_static,
    )

    def untile(x):
        # x: (T, n_px) -> (H, W)
        x = x.reshape(TH, TW, tile_size, tile_size)
        x = jnp.moveaxis(x, 2, 1).reshape(TH * tile_size, TW * tile_size)
        return x[:height, :width]

    aux = jax.lax.stop_gradient(aux)
    render = jnp.stack([untile(color[:, c, :]) for c in range(3)], axis=-1)
    return {
        "render": render,
        "depth": untile(aux[:, 7, :]),
        "depth_index_map": jnp.round(untile(aux[:, 0, :])).astype(jnp.int32),
        "color_index_map": jnp.round(untile(aux[:, 1, :])).astype(jnp.int32),
        "color_hit_weight": untile(aux[:, 2, :]),
        "depth_hit_weight": untile(aux[:, 3, :]),
        "T_map": untile(aux[:, 4, :]),
        "weight_sum": untile(aux[:, 5, :]),
        # n_touched from the Pallas path is deferred; consumers that need it
        # (to_purne) render with the ref path
        "n_touched_entries": jnp.zeros((b.point_list.shape[0],), jnp.int32),
    }
