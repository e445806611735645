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
            else:
                nd, ni = jax.lax.approx_min_k(d, k)
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
    self_m = idx == jnp.arange(M_q)[:, None]
    d2 = jnp.where(self_m, BIG, d2)
    order = jnp.argsort(d2, axis=1)[:, :3]
    d2 = jnp.take_along_axis(d2, order, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    dist = jnp.sqrt(d2) - 3.0 * cand_radius[idx]
    invalid = jnp.any(dist < 0, axis=1)
    dist2 = jnp.mean(dist * dist, axis=1)
    scales = jnp.clip(jnp.sqrt(dist2), min_radius, max_radius)
    factor = jnp.asarray(xyz_factor, jnp.float32)
    log_scales = jnp.log(scale_factor * scales[:, None] * factor[None, :])
    keep = new_valid & (~invalid)
    return log_scales, keep
