"""Decompose bin_gaussians cost on TPU (marginal-in-scan method).

Times each phase of the binning at bench scale: rects, two-phase slot
emission (scatter+cumsum expansion), the big sort, range searchsorted, and
the aligned gather layout. Run: python scripts/profile_binning.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def marginal(make_scan, n_hi=8, reps=3):
    f1 = make_scan(1)
    fn = make_scan(n_hi)
    _ = float(f1())
    _ = float(fn())

    def run(f):
        best = 1e18
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f())
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(fn) - run(f1)) / (n_hi - 1) * 1000.0


def scan_op(op, seed_arrs):
    """op(c) -> scalar-ish; chained by adding c into the op's input."""
    def mk(n):
        @jax.jit
        def f():
            def body(c, _):
                return c + 1e-12 * op(c), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return f
    return mk


def main():
    P = int(os.environ.get("PROF_P", 262144))
    slot_cap = 2 * (1 << 20)
    entry_cap = 1 << 20
    num_tiles = 3264  # 1200x680 / 16

    rng = np.random.default_rng(0)
    # plausible per-gaussian tile counts
    area = np.minimum(rng.poisson(6, P), 16).astype(np.int32)
    area_j = jnp.asarray(area)
    keys = jnp.asarray(rng.integers(0, 1 << 31, size=slot_cap,
                                    dtype=np.int64).astype(np.uint32))
    vals = jnp.arange(slot_cap, dtype=jnp.int32)
    f32big = jnp.asarray(rng.random(slot_cap, dtype=np.float32))

    def t(name, op, n_hi=8):
        print(f"{name:34s} {marginal(scan_op(op, None), n_hi=n_hi):8.2f} ms")

    # 1. cumsum over P
    t("cumsum P", lambda c: jnp.cumsum(area_j + c.astype(jnp.int32))[-1]
      .astype(jnp.float32))
    # 2. scatter P boundaries into slot_cap
    cum = jnp.cumsum(area_j)
    def scat(c):
        tgt = jnp.zeros(slot_cap + 1, jnp.int32).at[
            cum + c.astype(jnp.int32)].add(1, mode="drop")
        return tgt[123].astype(jnp.float32)
    t("scatter P->slot_cap", scat)
    # 3. cumsum over slot_cap
    t("cumsum slot_cap (2M)", lambda c: jnp.cumsum(
        keys.astype(jnp.int32) + c.astype(jnp.int32))[-1].astype(jnp.float32))
    # 4. gather P-array at slot_cap indices
    g_of_s = jnp.asarray(rng.integers(0, P, slot_cap, dtype=np.int64)
                         .astype(np.int32))
    src = jnp.asarray(rng.random(P, dtype=np.float32))
    t("gather P->2M (random)", lambda c: (src + c)[g_of_s][77])
    g_mono = jnp.sort(g_of_s)
    t("gather P->2M (monotonic)", lambda c: (src + c)[g_mono][77])
    # 5. the sort: single u32 key + i32 payload at slot_cap
    def srt(c):
        k = keys + c.astype(jnp.uint32)
        sk, sv = jax.lax.sort((k, vals), num_keys=1)
        return sk[5].astype(jnp.float32)
    t("sort 2M (u32,i32)", srt, n_hi=4)
    def srt1m(c):
        k = keys[:entry_cap] + c.astype(jnp.uint32)
        sk, sv = jax.lax.sort((k, vals[:entry_cap]), num_keys=1)
        return sk[5].astype(jnp.float32)
    t("sort 1M (u32,i32)", srt1m, n_hi=4)
    # 6. searchsorted tiles into sorted 2M
    sorted_tile = jnp.sort(jnp.asarray(
        rng.integers(0, num_tiles + 1, slot_cap, dtype=np.int64)
        .astype(np.int32)))
    qs = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    t("searchsorted 3k q into 2M", lambda c: jnp.searchsorted(
        sorted_tile, qs + c.astype(jnp.int32), side="left")[5]
        .astype(jnp.float32))
    # 7. layout: scatter 3k + cumsum 1M + 3 gathers 1M
    poffs = jnp.sort(jnp.asarray(
        rng.integers(0, entry_cap, num_tiles + 1, dtype=np.int64)
        .astype(np.int32)))
    def layout(c):
        o = jnp.arange(entry_cap, dtype=jnp.int32)
        boundary = jnp.zeros(entry_cap + 1, jnp.int32).at[
            poffs[1:] + c.astype(jnp.int32)].add(1, mode="drop")
        t_of_o = jnp.cumsum(boundary[:entry_cap])
        t_safe = jnp.clip(t_of_o, 0, num_tiles - 1)
        rank = o - poffs[t_safe]
        src_i = jnp.clip(poffs[t_safe] + rank, 0, slot_cap - 1)
        return f32big[src_i][9]
    t("aligned layout (1M)", layout)

    # full real binning for reference
    from dqo_map_tpu.models.cameras import Camera
    from dqo_map_tpu.ops import binning as binning_mod
    from dqo_map_tpu.ops.projection import preprocess
    from dqo_map_tpu.ops.rasterize import RenderSettings
    W, H = 1200, 680
    cam = Camera(uid=0, c2w=np.eye(4), fx=0.9 * W, fy=0.9 * W, cx=W / 2,
                 cy=H / 2, width=W, height=H)
    settings = RenderSettings(width=W, height=H)
    means = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.4, 1.4, P),
                      rng.uniform(0.8, 6.0, P)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.04), (P, 3))).astype(np.float32)
    q = rng.normal(size=(P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pre = jax.jit(lambda m, s, r: preprocess(
        m, s, r, cam.render_inputs(), settings.color_sigma, W, H, 1.0))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q))
    from dqo_map_tpu.ops.blend_pallas import CHUNK
    def full(c):
        p = pre._replace(xy=pre.xy + c)
        b = binning_mod.bin_gaussians(
            p, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
            None, align=CHUNK, entry_cap=entry_cap,
            max_chunks=settings.max_chunks_per_tile)
        return b.num_entries.astype(jnp.float32)
    t("FULL bin_gaussians", full, n_hi=4)


if __name__ == "__main__":
    main()
