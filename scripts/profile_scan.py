"""True per-iteration cost of the REAL compact local scan (tile-space path).

Times `compact_optimize_scan` itself at two static iteration counts and
differences — includes everything the bench's local scan pays per iter
(render fwd+bwd, loss, adam, confidence), amortizing per-scan setup
(binning, bg renders, GT tiling) out.

Usage: python scripts/profile_scan.py [n_unstable] [n_stable]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dqo_map_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from dqo_map_tpu.config import default_config  # noqa: E402
from dqo_map_tpu.models import gaussian_map as gm  # noqa: E402
from dqo_map_tpu.ops.rasterize import RenderSettings  # noqa: E402
from dqo_map_tpu.slam.mapper import compact_optimize_scan  # noqa: E402

N_U = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000
N_S = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
W, H = 1200, 680
CAPACITY = 1 << 19
BUCKET = 1 << 18
UBUCKET = 1 << 17
UENTRY = int(os.environ.get("PROF_UENTRY", 1 << 19))
UCHUNK = int(os.environ.get("PROF_UCHUNK", 128))


def main():
    print(f"devices: {jax.devices()} n_u={N_U} n_s={N_S}")
    rng = np.random.default_rng(0)
    fx = fy = 600.0
    K = jnp.asarray([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    P_mat = np.zeros((4, 4), np.float32)
    P_mat[0, 0] = 2 * fx / W
    P_mat[1, 1] = 2 * fy / H
    P_mat[2, 2] = 100.0 / 99.99
    P_mat[2, 3] = -1.0 / 99.99
    P_mat[3, 2] = 1.0

    N = N_U + N_S
    z = rng.uniform(0.8, 6.0, N).astype(np.float32)
    u = rng.uniform(40, W - 40, N).astype(np.float32)
    v = rng.uniform(40, H - 40, N).astype(np.float32)
    xyz = np.stack([(u - W / 2) / fx * z, (v - H / 2) / fy * z, z], -1)
    r_px = np.concatenate([rng.uniform(6.0, 16.0, N_U),
                           rng.uniform(3.0, 7.0, N_S)]).astype(np.float32)
    s = (r_px * z / fx / 3.0)
    scales = np.log(np.stack([s, s, s * 0.1], -1))
    q = rng.normal(size=(N, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    status = np.concatenate([np.full(N_U, 1), np.full(N_S, 2)]).astype(
        np.int32)

    state = gm.empty_map(CAPACITY)
    idx = jnp.arange(N)
    state = state._replace(
        xyz=state.xyz.at[idx].set(jnp.asarray(xyz)),
        scaling=state.scaling.at[idx].set(jnp.asarray(scales)),
        rotation=state.rotation.at[idx].set(jnp.asarray(q)),
        opacity=state.opacity.at[idx].set(2.0),
        sh=state.sh.at[idx, 0].set(jnp.asarray(
            rng.uniform(0, 1, (N, 3)).astype(np.float32))),
        status=state.status.at[idx].set(jnp.asarray(status)),
        count=jnp.int32(N),
    )

    cfg = default_config(capacity=CAPACITY, initial_bucket=BUCKET)
    settings = RenderSettings.from_args(W, H, cfg.map)
    usettings = settings._replace(entry_cap=UENTRY, chunk=UCHUNK)
    from dqo_map_tpu.ops import binning as bm
    TH, TW = bm.tile_grid_size(W, H, settings.tile_size)

    F = 5
    frames = {
        "color": jnp.asarray(rng.uniform(0, 1, (F, H, W, 3)).astype(
            np.float32)),
        "depth": jnp.full((F, H, W), 2.5, jnp.float32),
        "normal": jnp.zeros((F, H, W, 3), jnp.float32).at[..., 2].set(-1.0),
        "render_mask": jnp.ones((F, H, W), bool),
        "tile_mask": jnp.ones((F, TH, TW), jnp.int32),
        "w2c": jnp.stack([jnp.eye(4)] * F),
        "full_proj": jnp.stack([jnp.asarray(P_mat)] * F),
        "cam_pos": jnp.zeros((F, 3)),
        "K": K, "tan_fovx": jnp.float32(W / (2 * fx)),
        "tan_fovy": jnp.float32(H / (2 * fy)),
    }
    lrs = {"xyz": 1e-4, "sh": 2.5e-3, "opacity": 0.05, "scaling": 5e-3,
           "rotation": 1e-3, "sem_rgb": 0.0}
    weights = {"depth": 1.0, "normal": 0.0, "color": 1.0, "ssim": 0.0}
    row_mask = state.status == 1

    def run(iters, salt):
        rand_idx = jnp.asarray(
            rng.integers(0, F, size=iters).astype(np.int32))
        st = state._replace(opacity=state.opacity + salt * 1e-24)
        t0 = time.perf_counter()
        new_state, reports = compact_optimize_scan(
            st, row_mask, frames, rand_idx, lrs, weights,
            settings, usettings, iters, 0.1, bucket=BUCKET,
            ubucket=UBUCKET, with_semantics=False, use_bg=True)
        np.asarray(new_state.xyz.ravel()[:1])
        dt = (time.perf_counter() - t0) * 1000
        return dt, reports

    n1, n2 = 4, 16
    _, rep = run(n1, 0)     # compile n1
    print(f"entries={int(rep['num_entries'][-1])} "
          f"demand={int(rep['entry_demand'][-1])} "
          f"dropped={int(rep['dropped_entries'][-1])}", flush=True)
    run(n2, 0)              # compile n2
    best = float("inf")
    for r in range(3):
        t1, _ = run(n1, r + 1)
        t2, _ = run(n2, 100 + r)
        best = min(best, (t2 - t1) / (n2 - n1))
        print(f"  rep{r}: iters{n1}={t1:.0f}ms iters{n2}={t2:.0f}ms "
              f"-> {(t2 - t1) / (n2 - n1):.2f} ms/iter", flush=True)
    print(f"compact local scan (tile-space): {best:.2f} ms/iter")


if __name__ == "__main__":
    main()
