"""Tracker-stage decomposition: H2D upload, preprocess_frame, transforms.

Locates the BENCH_r04 `tracker` stage cost (265-280 ms device-true) beyond
the ~32 ms icp_pyramid (scripts/profile_icp.py).
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

from tchain import chain_time  # noqa: E402

from dqo_map_tpu.slam.tracker import preprocess_frame  # noqa: E402
from dqo_map_tpu.utils import image as im  # noqa: E402

W, H = 1200, 680


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    depth_np = (2.0 + rng.random((H, W), np.float32)).astype(np.float32)
    color_np = rng.random((H, W, 3), np.float32).astype(np.float32)
    K = jnp.asarray(np.array([[600.0, 0, W / 2], [0, 600.0, H / 2],
                              [0, 0, 1]], np.float32))

    # --- H2D upload cost (fresh arrays each call so nothing is cached) ---
    for name, arr in (("depth 3.3MB", depth_np), ("color 9.8MB", color_np)):
        ts = []
        for i in range(6):
            a = arr + np.float32(i)          # defeat donation/caching
            t0 = time.perf_counter()
            d = jax.device_put(a)
            d.block_until_ready()
            ts.append((time.perf_counter() - t0) * 1000)
        print(f"H2D {name:12s} {min(ts[1:]):9.2f} ms (min of 5 warm)")

    depth = jnp.asarray(depth_np)
    color = jnp.asarray(color_np)

    def pp_step(c, i):
        fm = preprocess_frame(depth + c[0] * 1e-24, color, K, levels=3,
                              min_depth=0.1, max_depth=8.0)
        return (c[0] + fm["depth_map"][0, 0] * 1e-24,)

    chain_time("preprocess_frame (maps+pyramids)", pp_step,
               (jnp.zeros((1,), jnp.float32),), n1=2, n2=8)

    vm = jnp.stack([depth, depth, depth], -1)
    c2w = jnp.eye(4, dtype=jnp.float32)

    def tr_step(c, i):
        a = im.transform_map(vm + c[0] * 1e-24, c2w)
        b = im.rotate_map(vm, c2w)
        return (c[0] + a[0, 0, 0] * 1e-24 + b[0, 0, 0] * 1e-24,)

    chain_time("transform+rotate world maps", tr_step,
               (jnp.zeros((1,), jnp.float32),), n1=4, n2=16)

    # pieces of preprocess
    def vtx_step(c, i):
        v = im.compute_vertex_map(depth + c[0] * 1e-24, K)
        n = im.compute_normal_map(v)
        cf = im.compute_confidence_map(n, K)
        return (c[0] + v[0, 0, 0] * 1e-24 + cf[0, 0, 0] * 1e-24
                + n[0, 0, 0] * 1e-24,)

    chain_time("vertex+normal+confidence maps", vtx_step,
               (jnp.zeros((1,), jnp.float32),), n1=4, n2=16)

    def pyr_step(c, i):
        vp = im.build_vertex_pyramid(depth + c[0] * 1e-24, K, 3)
        npr = im.build_normal_pyramid(tuple(vp))
        return (c[0] + vp[0][0, 0, 0] * 1e-24 + npr[0][0, 0, 0] * 1e-24,)

    chain_time("vertex+normal pyramids", pyr_step,
               (jnp.zeros((1,), jnp.float32),), n1=4, n2=16)


if __name__ == "__main__":
    main()
