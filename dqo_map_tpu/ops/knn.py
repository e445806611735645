"""K-nearest-neighbor search as chunked MXU distance matmuls.

Replaces `simple-knn` (Morton-sorted box-pruned CUDA 3-NN,
submodules/simple-knn/simple_knn.cu) and the pytorch3d `knn_points` calls
(`mapper.py:1366-1377,1471-1480`). On TPU the brute-force formulation wins:
|x-y|^2 = |x|^2 + |y|^2 - 2 x.y puts the whole search on the MXU, and a
running top-k merge over candidate chunks keeps memory bounded. A 40k x 300k
3-NN is ~70 GFLOP — well under a millisecond of MXU time, with none of the
tree-build latency the CUDA version pays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e12


@partial(jax.jit, static_argnames=("k", "row_chunk", "col_chunk", "exact"))
def knn(queries: jnp.ndarray, candidates: jnp.ndarray,
        cand_valid: jnp.ndarray, k: int = 3, row_chunk: int = 1024,
        col_chunk: int = 65536, exact: bool = False):
    """k nearest candidates for each query point.

    queries (M,3); candidates (N,3); cand_valid (N,) bool — invalid
    candidates are pushed to +inf. Returns (dists (M,k) sq-distances,
    indices (M,k) into candidates).

    exact=False uses the TPU-native `approx_min_k` (PartialReduce) per
    column chunk — ~2.5x faster at SLAM map widths, recall ~0.95+. The
    reference's simple-knn is itself approximate (Morton-box pruned,
    simple_knn.cu:45-117). exact=True keeps full `top_k` for oracle tests.
    """
    M = queries.shape[0]
    N = candidates.shape[0]
    row_chunk = min(row_chunk, M)
    col_chunk = min(col_chunk, N)
    n_row = -(-M // row_chunk)
    n_col = -(-N // col_chunk)
    Mp = n_row * row_chunk
    Np = n_col * col_chunk

    q = jnp.pad(queries, ((0, Mp - M), (0, 0)))
    c = jnp.pad(candidates, ((0, Np - N), (0, 0)))
    cv = jnp.pad(cand_valid, (0, Np - N))
    q2 = jnp.sum(q * q, axis=1)
    c2 = jnp.where(cv, jnp.sum(c * c, axis=1), BIG)

    def row_block(r):
        qr = jax.lax.dynamic_slice(q, (r * row_chunk, 0), (row_chunk, 3))
        q2r = jax.lax.dynamic_slice(q2, (r * row_chunk,), (row_chunk,))

        def col_step(carry, j):
            best_d, best_i = carry
            cc = jax.lax.dynamic_slice(c, (j * col_chunk, 0), (col_chunk, 3))
            c2c = jax.lax.dynamic_slice(c2, (j * col_chunk,), (col_chunk,))
            d = (
                q2r[:, None] + c2c[None, :]
                - 2.0 * jnp.dot(qr, cc.T, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            )
            if exact:
                nd_neg, ni = jax.lax.top_k(-d, k)
                nd = -nd_neg
            elif jax.default_backend() == "tpu":
                nd, ni = jax.lax.approx_min_k(d, k)
            else:
                # CPU: sort-based top-k is minutes at these widths; linear
                # min+mask extraction instead (see knn2.sel)
                nds, nis = [], []
                dd = d
                for _ in range(k):
                    i_min = jnp.argmin(dd, axis=1)
                    nds.append(jnp.take_along_axis(dd, i_min[:, None],
                                                   axis=1))
                    nis.append(i_min[:, None].astype(jnp.int32))
                    dd = dd.at[jnp.arange(dd.shape[0]), i_min].set(BIG)
                nd = jnp.concatenate(nds, axis=1)
                ni = jnp.concatenate(nis, axis=1)
            ni = ni + j * col_chunk
            cat_d = jnp.concatenate([best_d, nd], axis=1)
            cat_i = jnp.concatenate([best_i, ni], axis=1)
            md, mi = jax.lax.top_k(-cat_d, k)
            take = jnp.take_along_axis(cat_i, mi, axis=1)
            return (-md, take), None

        init = (jnp.full((row_chunk, k), BIG), jnp.zeros((row_chunk, k), jnp.int32))
        (bd, bi), _ = jax.lax.scan(col_step, init, jnp.arange(n_col))
        return bd, bi

    dists, idxs = jax.lax.map(row_block, jnp.arange(n_row))
    dists = dists.reshape(Mp, k)[:M]
    idxs = idxs.reshape(Mp, k)[:M]
    return jnp.maximum(dists, 0.0), idxs


@partial(jax.jit, static_argnames=("k", "row_chunk", "col_chunk", "exact"))
def knn2(queries: jnp.ndarray, candidates: jnp.ndarray,
         mask_a: jnp.ndarray, mask_b: jnp.ndarray, k: int = 4,
         row_chunk: int = 4096, col_chunk: int = 65536, exact: bool = False):
    """Two class-restricted k-NN searches sharing ONE distance-matrix pass.

    The densify pipeline needs (a) nearest UNSTABLE neighbors (coverage
    filter, ref mapper.py:1351-1380) and (b) nearest among new+alive (scale
    init, ref gaussian_pointcloud.py:519-570) for the same queries — running
    `knn` twice streams the (M, N) distance matrix through HBM twice
    (hardware-profiled: 47 ms per 16k x 262k search, bandwidth-bound on the
    materialized matrix). This fuses them: d is computed ONCE per chunk in
    bf16 (ranking-safe: NN gaps are far above bf16's ~0.4% relative error;
    the returned d2 is recomputed in f32 for the winners), masked two ways,
    reduced twice.
    Returns ((d_a, i_a), (d_b, i_b)), each (M, k); d in f32.
    """
    M = queries.shape[0]
    N = candidates.shape[0]
    row_chunk = min(row_chunk, M)
    col_chunk = min(col_chunk, N)
    n_row = -(-M // row_chunk)
    n_col = -(-N // col_chunk)
    Mp = n_row * row_chunk
    Np = n_col * col_chunk

    q = jnp.pad(queries, ((0, Mp - M), (0, 0)))
    c = jnp.pad(candidates, ((0, Np - N), (0, 0)))
    ma = jnp.pad(mask_a, (0, Np - N))
    mb = jnp.pad(mask_b, (0, Np - N))
    q2 = jnp.sum(q * q, axis=1)
    c2 = jnp.sum(c * c, axis=1)
    # bf16 distance matrix on TPU halves the HBM traffic that bounds this
    # op (measured 15 ms vs ~45 at bench scale; A/B bench runs showed the
    # ~0.8% ranking error is quality-neutral — exact d2 is recomputed in
    # f32 for the winners below). CPU keeps f32 (bf16 is emulated there).
    cdt = (jnp.bfloat16 if (not exact and jax.default_backend() == "tpu")
           else jnp.float32)
    BIGC = jnp.asarray(BIG, cdt)

    on_tpu = jax.default_backend() == "tpu"

    def sel(d, best_d, best_i, j):
        if exact:
            nd_neg, ni = jax.lax.top_k(-d, k)
            nd = -nd_neg
        elif on_tpu:
            nd, ni = jax.lax.approx_min_k(d, k)
        else:
            # CPU: approx_min_k/top_k lower to a FULL SORT per row (minutes
            # at these widths); k passes of min+mask are linear instead
            nds, nis = [], []
            dd = d
            for _ in range(k):
                i_min = jnp.argmin(dd, axis=1)
                nds.append(jnp.take_along_axis(dd, i_min[:, None], axis=1))
                nis.append(i_min[:, None].astype(jnp.int32))
                dd = dd.at[jnp.arange(dd.shape[0]), i_min].set(BIGC)
            nd = jnp.concatenate(nds, axis=1)
            ni = jnp.concatenate(nis, axis=1)
        ni = ni + j * col_chunk
        cat_d = jnp.concatenate([best_d, nd.astype(jnp.float32)], axis=1)
        cat_i = jnp.concatenate([best_i, ni], axis=1)
        md, mi = jax.lax.top_k(-cat_d, k)
        return -md, jnp.take_along_axis(cat_i, mi, axis=1)

    def row_block(r):
        qr = jax.lax.dynamic_slice(q, (r * row_chunk, 0), (row_chunk, 3))
        q2r = jax.lax.dynamic_slice(q2, (r * row_chunk,), (row_chunk,))

        def col_step(carry, j):
            (da, ia), (db, ib) = carry
            cc = jax.lax.dynamic_slice(c, (j * col_chunk, 0), (col_chunk, 3))
            c2c = jax.lax.dynamic_slice(c2, (j * col_chunk,), (col_chunk,))
            mac = jax.lax.dynamic_slice(ma, (j * col_chunk,), (col_chunk,))
            mbc = jax.lax.dynamic_slice(mb, (j * col_chunk,), (col_chunk,))
            d = (
                q2r[:, None] + c2c[None, :]
                - 2.0 * jnp.dot(qr, cc.T, preferred_element_type=jnp.float32)
            ).astype(cdt)
            da, ia = sel(jnp.where(mac[None, :], d, BIGC), da, ia, j)
            db, ib = sel(jnp.where(mbc[None, :], d, BIGC), db, ib, j)
            return ((da, ia), (db, ib)), None

        init1 = (jnp.full((row_chunk, k), BIG),
                 jnp.zeros((row_chunk, k), jnp.int32))
        init2 = (jnp.full((row_chunk, k), BIG),
                 jnp.zeros((row_chunk, k), jnp.int32))
        (ra, rb), _ = jax.lax.scan(col_step, (init1, init2),
                                   jnp.arange(n_col))
        return ra, rb

    (da, ia), (db, ib) = jax.lax.map(row_block, jnp.arange(n_row))
    out = []
    for d_, i_ in ((da, ia), (db, ib)):
        d_ = d_.reshape(Mp, k)[:M]
        i_ = i_.reshape(Mp, k)[:M]
        # exact f32 distances for the winners (the bf16 pass only ranked)
        sel_c = jnp.take(c, i_.reshape(-1), axis=0).reshape(M, k, 3)
        d2 = jnp.sum((queries[:, None, :] - sel_c) ** 2, axis=-1)
        d2 = jnp.where(d_ >= BIG * 0.5, BIG, d2)   # masked-out stay invalid
        out.append((jnp.maximum(d2, 0.0), i_))
    return out[0], out[1]


def update_geometry_scales(new_xyz: jnp.ndarray, new_valid: jnp.ndarray,
                           cand_xyz: jnp.ndarray, cand_radius: jnp.ndarray,
                           cand_valid: jnp.ndarray, scale_factor: float,
                           xyz_factor: tuple, min_radius: float,
                           max_radius: float):
    """Scale init for freshly added gaussians
    (ref `update_geometry`, gaussian_pointcloud.py:519-570).

    Candidates must include the new points themselves FIRST (slot m = query
    m) plus the existing map (bbox-filtered on the host side); the self-match
    is excluded BY INDEX (robust to the approximate top-k ordering), keeping
    the 3 nearest of the remaining candidates.
    Returns (log_scales (M,3), keep_mask (M,)).
    """
    M_q = new_xyz.shape[0]
    d2, idx = knn(new_xyz, cand_xyz, cand_valid, k=4)
    return scales_from_knn(d2, idx, new_valid, cand_radius, None,
                           scale_factor, xyz_factor, min_radius, max_radius)


def scales_from_knn(d2: jnp.ndarray, idx: jnp.ndarray,
                    new_valid: jnp.ndarray, cand_radius: jnp.ndarray,
                    cand_excluded, scale_factor: float, xyz_factor: tuple,
                    min_radius: float, max_radius: float):
    """`update_geometry_scales` tail on PRECOMPUTED (d2, idx) — lets the
    densify pipeline share one fused `knn2` pass between the coverage filter
    and the scale init. `cand_excluded` (N,) optionally drops candidates
    decided invalid after the search (e.g. coverage-filtered new points)."""
    M_q = d2.shape[0]
    self_m = idx == jnp.arange(M_q)[:, None]
    if cand_excluded is not None:
        self_m = self_m | cand_excluded[idx]
    d2 = jnp.where(self_m, BIG, d2)
    order = jnp.argsort(d2, axis=1)[:, :3]
    d2 = jnp.take_along_axis(d2, order, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    # post-search exclusions can leave fewer than 3 usable neighbors; the
    # BIG sentinel must NOT enter the mean — it used to clamp the scale to
    # max_radius, silently seeding giant gaussians wherever a point's
    # nearest neighbors were all coverage-dropped (r04 bench receipts:
    # clipped_cells 53k -> 1M until this fix)
    missing = d2 >= BIG * 0.5
    dist = jnp.sqrt(jnp.where(missing, 0.0, d2)) - 3.0 * cand_radius[idx]
    invalid = jnp.any((dist < 0) & (~missing), axis=1)
    cnt = jnp.sum(~missing, axis=1)
    dist2 = (jnp.sum(jnp.where(missing, 0.0, dist * dist), axis=1)
             / jnp.maximum(cnt, 1))
    scales = jnp.clip(jnp.sqrt(dist2), min_radius, max_radius)
    factor = jnp.asarray(xyz_factor, jnp.float32)
    log_scales = jnp.log(scale_factor * scales[:, None] * factor[None, :])
    keep = new_valid & (~invalid) & (cnt > 0)
    return log_scales, keep
